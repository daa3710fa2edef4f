"""Sample-grid visualization (reference ``utils/plotting.py``).

Provides the surface the reference driver uses — ``img_tile`` grid assembly
with border/aspect control (``utils/plotting.py:29-74``) and
``save_tile_img`` writing [-1,1] floats as a PNG (``:9-13``) — implemented
as a single vectorized reshape/pad instead of the reference's Python
double loop. PIL-only (matplotlib not required for the training path).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np


def img_stretch(img: np.ndarray) -> np.ndarray:
    """Min-max stretch to [0, 1] (``utils/plotting.py:23-27``)."""
    img = np.asarray(img, np.float64)
    img = img - img.min()
    return img / (img.max() + 1e-12)


def img_tile(
    imgs: np.ndarray,
    aspect_ratio: float = 1.0,
    tile_shape: Optional[Tuple[int, int]] = None,
    border: int = 1,
    border_color: float = 0.0,
    stretch: bool = False,
) -> np.ndarray:
    """Tile ``(N, H, W[, C])`` images into one grid image.

    Behavior mirrors ``utils/plotting.py:29-74``: auto near-square grid from
    ``aspect_ratio``, ``border`` pixels of ``border_color`` between cells,
    trailing cells left as border color.
    """
    if stretch:
        imgs = img_stretch(imgs)
    imgs = np.asarray(imgs)
    if imgs.ndim not in (3, 4):
        raise ValueError("imgs must be (N,H,W) or (N,H,W,C)")
    n, h, w = imgs.shape[:3]

    if tile_shape is None:
        img_aspect = w / float(h)
        ar = aspect_ratio * img_aspect
        th = int(math.ceil(math.sqrt(n * ar)))
        tw = int(math.ceil(math.sqrt(n / ar)))
    else:
        th, tw = tile_shape

    cells = th * tw
    chan = imgs.shape[3:]  # () or (C,)
    padded = np.full((cells, h + border, w + border) + chan, border_color, imgs.dtype)
    take = min(n, cells)
    padded[:take, :h, :w] = imgs[:take]
    grid = (
        padded.reshape((th, tw, h + border, w + border) + chan)
        .swapaxes(1, 2)
        .reshape((th * (h + border), tw * (w + border)) + chan)
    )
    # drop the trailing border row/col (reference grid is (H+b)*th - b)
    return grid[: th * (h + border) - border, : tw * (w + border) - border]


def save_tile_img(imgs: np.ndarray, path: str) -> None:
    """[-1, 1] float grid -> uint8 PNG (``utils/plotting.py:9-13``)."""
    from PIL import Image

    arr = ((np.asarray(imgs) + 1.0) * 127.5).astype(np.uint8)
    Image.fromarray(arr).save(path)


def plot_img(img: np.ndarray, title: Optional[str] = None):
    """Single-image matplotlib display (``utils/plotting.py:15-21``);
    imported lazily so the training path never needs matplotlib."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    plt.figure()
    plt.imshow(img, interpolation="nearest")
    if title is not None:
        plt.title(title)
    plt.axis("off")
    plt.tight_layout()
    return plt.gcf()


def conv_filter_tile(filters: np.ndarray) -> np.ndarray:
    """Tile conv filters (N, C, H, W): RGB filters as color tiles, otherwise
    one row per filter / one column per channel (``utils/plotting.py:76-89``)."""
    n_filters, n_channels, height, width = filters.shape
    tile_shape = None
    if n_channels == 3:
        filters = np.transpose(filters, (0, 2, 3, 1))
    else:
        tile_shape = (n_channels, n_filters)
        filters = np.transpose(filters, (1, 0, 2, 3)).reshape(
            n_filters * n_channels, height, width
        )
    return img_tile(img_stretch(filters), tile_shape=tile_shape)


def scale_to_unit_interval(ndar: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    """Min-max scale to [0, 1] (``utils/plotting.py:91-96``)."""
    ndar = np.asarray(ndar, np.float64).copy()
    ndar -= ndar.min()
    return ndar / (ndar.max() + eps)


def tile_raster_images(
    X: np.ndarray,
    img_shape: Tuple[int, int],
    tile_shape: Tuple[int, int],
    tile_spacing: Tuple[int, int] = (0, 0),
    scale_rows_to_unit_interval: bool = True,
    output_pixel_vals: bool = True,
) -> np.ndarray:
    """Tile flattened rows as a raster grid (legacy helper, reference
    ``utils/plotting.py:99-201``; single-channel arrays and 4-tuples of
    channels, rows optionally min-max scaled)."""
    if isinstance(X, tuple):
        assert len(X) == 4
        h = (img_shape[0] + tile_spacing[0]) * tile_shape[0] - tile_spacing[0]
        w = (img_shape[1] + tile_spacing[1]) * tile_shape[1] - tile_spacing[1]
        dt = "uint8" if output_pixel_vals else np.float64
        out = np.zeros((h, w, 4), dtype=dt)
        defaults = [0, 0, 0, 255] if output_pixel_vals else [0.0, 0.0, 0.0, 1.0]
        for i in range(4):
            if X[i] is None:
                out[:, :, i] = defaults[i]
            else:
                out[:, :, i] = tile_raster_images(
                    X[i], img_shape, tile_shape, tile_spacing,
                    scale_rows_to_unit_interval, output_pixel_vals,
                )
        return out

    H, W = img_shape
    Hs, Ws = tile_spacing
    h = (H + Hs) * tile_shape[0] - Hs
    w = (W + Ws) * tile_shape[1] - Ws
    out = np.zeros((h, w), dtype="uint8" if output_pixel_vals else X.dtype)
    for r in range(tile_shape[0]):
        for c in range(tile_shape[1]):
            k = r * tile_shape[1] + c
            if k >= X.shape[0]:
                continue
            img = X[k].reshape(img_shape)
            if scale_rows_to_unit_interval:
                img = scale_to_unit_interval(img)
            out[r * (H + Hs) : r * (H + Hs) + H, c * (W + Ws) : c * (W + Ws) + W] = (
                img * (255 if output_pixel_vals else 1)
            )
    return out


def kde_evolution_plot(
    snapshots, path: str, xmax: float = 4.0, levels: int = 20
) -> None:
    """KDE evolution grid for 2-D toy samples — the reference notebooks'
    final artifact (``toy_example/med_gan_toy_example2.ipynb`` cell 2:
    seaborn ``kdeplot`` per snapshot, 'Oranges' colormap, 20 levels,
    clipped to [-xmax, xmax]^2, one column per snapshot with the step in
    the title).

    ``snapshots``: sequence of ``(step, samples)`` pairs with samples
    ``(N, 2)``. Written with matplotlib + a Gaussian KDE (scipy), no
    seaborn dependency.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from scipy.stats import gaussian_kde

    snapshots = list(snapshots)
    cols = max(len(snapshots), 1)
    fig, axes = plt.subplots(1, cols, figsize=(2 * cols, 2), squeeze=False)
    grid = np.linspace(-xmax, xmax, 120)
    gx, gy = np.meshgrid(grid, grid)
    pts = np.stack([gx.ravel(), gy.ravel()])
    for ax, (step, samples) in zip(axes[0], snapshots):
        samples = np.asarray(samples, np.float64)
        try:
            density = gaussian_kde(samples.T)(pts).reshape(gx.shape)
        except np.linalg.LinAlgError:  # fully collapsed samples
            density = np.zeros_like(gx)
        ax.contourf(gx, gy, density, levels=levels, cmap="Oranges")
        ax.set_xticks([])
        ax.set_yticks([])
        ax.set_title(f"step {step}", fontsize=8)
    fig.tight_layout()
    fig.savefig(path, bbox_inches="tight", dpi=120)
    plt.close(fig)
