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
