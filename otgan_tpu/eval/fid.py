"""Frechet Inception Distance on TPU (companion metric to the Inception
score; SURVEY.md section 7 step 9 lists it as the optional extra eval).

FID = ||mu1 - mu2||^2 + tr(S1 + S2 - 2 sqrt(S1 S2)) over the 2048-d
InceptionV3 pool features of real vs generated images. The matrix square
root uses the symmetric-PSD factorization tr(sqrt(S1 S2)) =
tr(sqrt(S1^1/2 S2 S1^1/2)) via eigendecompositions (no scipy dependency).
Feature extraction runs as the same jitted TPU forward as the Inception
score (``inception_net.apply`` stopped at the pool layer).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from otgan_tpu.eval import inception as _inception
from otgan_tpu.eval import inception_net
from otgan_tpu.eval.inception import (
    _finalize_split_scores,
    _serialize_on_cpu,
    _split_update,
    _stream_chunks,
    preprocess,
)

# classifier batch override. None (default) inherits inception._BATCH
# DYNAMICALLY — a by-value import froze it, so --inception_batch and
# OTGAN_INCEPTION_BATCH changed the score path but not the FID path.
_BATCH = None


def _batch() -> int:
    return _BATCH if _BATCH else _inception._BATCH


def load_params(path=None):
    """Late-bound: tests and the trainer monkeypatch
    ``inception.load_params`` / ``_params_cache``; a by-name import here
    would freeze the original and miss the patch."""
    return _inception.load_params(path)


def get_variant():
    return _inception.get_variant()


@functools.partial(jax.jit, static_argnames=("variant",))
def _pool_features(params, x_uint8_range, variant: str = "torchvision"):
    x = preprocess(x_uint8_range, variant)
    return inception_net.pool_features(params, x, variant=variant)


def pool_features(images: np.ndarray, params=None, variant=None) -> np.ndarray:
    """Batched 2048-d pool features for uint8-range RGB images."""
    params = params if params is not None else load_params()
    variant = variant if variant is not None else get_variant()
    n = images.shape[0]
    batch = _batch()
    out = []
    for i in range(0, n, batch):
        chunk = np.asarray(images[i : i + batch], np.float32)
        pad = 0
        if chunk.shape[0] < batch:
            pad = batch - chunk.shape[0]
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], np.float32)]
            )
        f = np.asarray(_pool_features(params, jnp.asarray(chunk), variant))
        out.append(f[: batch - pad])
    return np.concatenate(out)


def _sqrtm_psd_trace_product(s1: np.ndarray, s2: np.ndarray) -> float:
    """tr(sqrt(S1 S2)) for symmetric PSD S1, S2 without scipy."""
    w1, v1 = np.linalg.eigh(s1)
    w1 = np.clip(w1, 0.0, None)
    s1h = (v1 * np.sqrt(w1)) @ v1.T  # S1^(1/2)
    m = s1h @ s2 @ s1h  # symmetric PSD, similar to S1 S2
    wm = np.clip(np.linalg.eigvalsh(m), 0.0, None)
    return float(np.sum(np.sqrt(wm)))


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray
) -> float:
    diff = mu1 - mu2
    tr_cov = _sqrtm_psd_trace_product(sigma1, sigma2)
    return float(
        diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2.0 * tr_cov
    )


def feature_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    features = np.asarray(features, np.float64)
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def get_fid(
    images_a: np.ndarray, images_b: np.ndarray, params=None
) -> float:
    """FID between two stacks of uint8-range RGB images."""
    fa = pool_features(images_a, params=params)
    fb = pool_features(images_b, params=params)
    return frechet_distance(*feature_statistics(fa), *feature_statistics(fb))


@functools.partial(jax.jit, static_argnames=("variant",))
def _pool_accum(params, x_pm1, real_len, s1, s2, n, variant: str):
    """Accumulate one generated batch into feature sufficient statistics
    (sum f, sum f^T f, count) on device. Padded rows of a ragged chunk are
    masked by ``real_len`` so they contribute nothing."""
    x255 = 127.5 * (x_pm1.astype(jnp.float32) + 1.0)
    f = inception_net.pool_features(
        params, preprocess(x255, variant), variant=variant
    )
    w = (jnp.arange(f.shape[0]) < real_len).astype(jnp.float32)
    fw = f * w[:, None]
    return s1 + fw.sum(axis=0), s2 + fw.T @ fw, n + w.sum()


def feature_statistics_from_sampler(
    sample_fn, num_samples: int, params=None, variant=None
) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of pool features over generated samples WITHOUT staging
    features host-side: like ``inception.inception_score_from_sampler``'s
    device reduction, the sufficient statistics (sum f, sum f^T f) are
    accumulated on device, so a 50 000-sample pass reads back one
    2048 x 2048 matrix (~16 MB) instead of ~400 MB of per-sample features.
    f32 accumulation; agrees with the host-f64 ``feature_statistics`` path
    to ~1e-4 relative (tested). ``sample_fn(seed) -> (B, H, W, 3)`` device
    array in [-1, 1] (e.g. ``engine.sample``)."""
    params = params if params is not None else load_params()
    variant = variant if variant is not None else get_variant()
    d = 2048
    s1 = jnp.zeros((d,), jnp.float32)
    s2 = jnp.zeros((d, d), jnp.float32)
    n = jnp.float32(0.0)
    for chunk, start, real_len in _stream_chunks(
        sample_fn, num_samples, _batch()
    ):
        # the tail past num_samples is excluded like the score path
        real_len = min(real_len, max(num_samples - start, 0))
        s1, s2, n = _pool_accum(
            params, chunk, jnp.int32(real_len), s1, s2, n, variant
        )
        _serialize_on_cpu(n)
    s1 = np.asarray(s1, np.float64)
    s2 = np.asarray(s2, np.float64)
    cnt = float(n)
    mu = s1 / cnt
    # np.cov's unbiased (N-1) normalization, from the raw second moment
    sigma = (s2 - cnt * np.outer(mu, mu)) / (cnt - 1.0)
    return mu, sigma


@functools.partial(jax.jit, static_argnames=("variant",))
def _combined_accum(
    params, x_pm1, start, real_len, num_samples, upper, s1, s2, f1, f2, fn,
    variant: str,
):
    """One forward pass, both metrics: the 2048-d pool features feed the
    FID sufficient statistics directly AND (through the fc head) the
    split-KL statistics of the Inception score — evaluating IS+FID costs
    the same trunk compute as IS alone (the fc matmul is 2048 x classes,
    noise next to the InceptionV3 trunk)."""
    x255 = 127.5 * (x_pm1.astype(jnp.float32) + 1.0)
    f = inception_net.pool_features(
        params, preprocess(x255, variant), variant=variant
    )
    logits = f @ params["fc"]["w"] + params["fc"]["b"]
    p = jax.nn.softmax(logits, axis=-1)
    s1, s2, valid = _split_update(
        p, start, real_len, num_samples, upper, s1, s2
    )
    w = valid.astype(jnp.float32)
    fw = f * w[:, None]
    return s1, s2, f1 + fw.sum(axis=0), f2 + fw.T @ fw, fn + w.sum()


def combined_eval_from_sampler(
    sample_fn,
    num_samples: int,
    splits: int = 10,
    params=None,
    variant=None,
) -> Tuple[Tuple[float, float], Tuple[np.ndarray, np.ndarray]]:
    """Device-streaming Inception score AND FID feature statistics from
    ONE pass over the generated samples: returns
    ``((is_mean, is_std), (mu, sigma))``. Protocol and masking semantics
    identical to ``inception.inception_score_from_sampler`` (device_reduce
    path) and ``feature_statistics_from_sampler`` run separately — but the
    InceptionV3 trunk runs once instead of twice."""
    params = params if params is not None else load_params()
    variant = variant if variant is not None else get_variant()
    n_classes = int(params["fc"]["b"].shape[0])
    s1 = jnp.zeros((splits, n_classes), jnp.float32)
    s2 = jnp.zeros((splits,), jnp.float32)
    d = int(params["fc"]["w"].shape[0])
    f1 = jnp.zeros((d,), jnp.float32)
    f2 = jnp.zeros((d, d), jnp.float32)
    fn = jnp.float32(0.0)
    upper = jnp.asarray(
        [num_samples * (i + 1) // splits for i in range(splits)], jnp.int32
    )
    n_traced = jnp.int32(num_samples)
    for chunk, start, real_len in _stream_chunks(
        sample_fn, num_samples, _batch()
    ):
        s1, s2, f1, f2, fn = _combined_accum(
            params,
            chunk,
            jnp.int32(start),
            jnp.int32(real_len),
            n_traced,
            upper,
            s1,
            s2,
            f1,
            f2,
            fn,
            variant,
        )
        _serialize_on_cpu(fn)
    is_mean, is_std = _finalize_split_scores(s1, s2, num_samples, splits)
    f1 = np.asarray(f1, np.float64)
    f2 = np.asarray(f2, np.float64)
    cnt = float(fn)
    mu = f1 / cnt
    sigma = (f2 - cnt * np.outer(mu, mu)) / (cnt - 1.0)
    return (is_mean, is_std), (mu, sigma)


def reference_statistics(
    images_255: np.ndarray, params=None, variant=None
) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of a stack of REAL images in uint8 range — the fixed
    side of the FID comparison, computed once per dataset.
    ``pool_features`` casts per chunk; casting the whole stack here would
    materialize a ~600 MB transient for the 50k uint8 CIFAR train set."""
    feats = pool_features(images_255, params=params, variant=variant)
    return feature_statistics(feats)


def save_reference_statistics(
    path: str, mu: np.ndarray, sigma: np.ndarray, variant: str, count: int
) -> None:
    """Persist dataset FID statistics (with the weight variant they were
    computed under — mixing variants silently breaks the comparison).
    Atomic (tmp + rename): in a pod, non-chief processes may read the
    path at a later eval and must never observe a half-written archive."""
    tmp = f"{path}.tmp.{os.getpid()}"
    np.savez_compressed(
        tmp, mu=mu, sigma=sigma,
        variant=np.frombuffer(variant.encode("utf-8"), np.uint8),
        count=np.int64(count),
    )
    # savez appends .npz when missing; the pid suffix has no extension
    os.replace(tmp if os.path.exists(tmp) else f"{tmp}.npz", path)


def load_reference_statistics(
    path: str, expect_variant: Optional[str] = None
) -> Tuple[np.ndarray, np.ndarray]:
    with np.load(path) as data:
        variant = bytes(data["variant"]).decode("utf-8")
        if expect_variant is not None and variant != expect_variant:
            raise ValueError(
                f"FID reference statistics at {path} were computed with "
                f"variant '{variant}' but the loaded weights are "
                f"'{expect_variant}' — recompute them (delete the file)"
            )
        return data["mu"], data["sigma"]


def main(argv=None) -> None:
    """Precompute dataset FID reference statistics offline:

        python -m otgan_tpu.eval.fid --data_dir /data --out fid_stats.npz

    The emitted .npz feeds ``--fid_stats_path`` — the right workflow for
    pods, where per-process in-run computation would otherwise see only
    its own data shard (train.py:_fid_reference_stats). Accepts the CIFAR
    pickle layout (``--data_dir``, reference data/cifar10_data.py:29-53)
    or any image stack (``--images`` .npy/.npz, NHWC or NCHW, uint8 or
    [0,255] float)."""
    import argparse

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--data_dir", default="", help="CIFAR-10 directory")
    ap.add_argument("--subset", default="train", choices=("train", "test"))
    ap.add_argument(
        "--images", default="",
        help=".npy/.npz image stack instead of --data_dir",
    )
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--limit", type=int, default=0, help="use only the first N images"
    )
    args = ap.parse_args(argv)
    if bool(args.data_dir) == bool(args.images):
        ap.error("pass exactly one of --data_dir / --images")
    if args.images:
        arr = np.load(args.images)
        if hasattr(arr, "files"):  # npz: take the first array
            arr = arr[arr.files[0]]
        imgs = np.asarray(arr, np.float32)
    else:
        from otgan_tpu.data.cifar10 import load

        # same directory convention as the trainer's DataLoader
        # (cifar10.py): <data_dir>/cifar-10-python/cifar-10-batches-py
        x, _ = load(
            os.path.join(args.data_dir, "cifar-10-python"),
            subset=args.subset,
        )
        imgs = np.transpose(x, (0, 2, 3, 1))
    if imgs.ndim != 4:
        raise ValueError(f"expected NHWC/NCHW images, got shape {imgs.shape}")
    if imgs.shape[1] == 3 and imgs.shape[-1] != 3:  # NCHW -> NHWC
        imgs = np.transpose(imgs, (0, 2, 3, 1))
    if float(imgs.max()) <= 2.0:
        # a [0,1]- or [-1,1]-normalized stack would silently produce
        # garbage statistics (preprocess treats values as [0,255]); every
        # later --fid_stats_path run would then report finite but
        # meaningless FIDs with no error anywhere
        raise ValueError(
            f"--images values span [{imgs.min():.3f}, {imgs.max():.3f}] — "
            "expected uint8-range [0, 255]; rescale normalized stacks "
            "(e.g. x*255 or (x+1)*127.5) before computing statistics"
        )
    if args.limit:
        imgs = imgs[: args.limit]
    variant = get_variant()
    print(f"computing FID statistics over {imgs.shape[0]} images ({variant})")
    mu, sigma = reference_statistics(imgs)
    save_reference_statistics(args.out, mu, sigma, variant, imgs.shape[0])
    print(f"wrote {args.out} (mu {mu.shape}, sigma {sigma.shape})")


def fid_from_sampler(
    sample_fn,
    num_samples: int,
    mu_ref: np.ndarray,
    sigma_ref: np.ndarray,
    params=None,
    variant=None,
) -> float:
    """FID of generated samples against precomputed reference statistics
    (e.g. ``feature_statistics(pool_features(real_images))``, computed once
    per dataset), with the generated side fully device-streamed."""
    mu, sigma = feature_statistics_from_sampler(
        sample_fn, num_samples, params=params, variant=variant
    )
    return frechet_distance(mu, sigma, mu_ref, sigma_ref)


if __name__ == "__main__":
    main()
