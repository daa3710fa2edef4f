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
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from otgan_tpu.eval import inception_net
from otgan_tpu.eval.inception import get_variant, load_params, preprocess, _BATCH


@functools.partial(jax.jit, static_argnames=("variant",))
def _pool_features(params, x_uint8_range, variant: str = "torchvision"):
    x = preprocess(x_uint8_range, variant)
    return inception_net.pool_features(params, x, variant=variant)


def pool_features(images: np.ndarray, params=None, variant=None) -> np.ndarray:
    """Batched 2048-d pool features for uint8-range RGB images."""
    params = params if params is not None else load_params()
    variant = variant if variant is not None else get_variant()
    n = images.shape[0]
    out = []
    for i in range(0, n, _BATCH):
        chunk = np.asarray(images[i : i + _BATCH], np.float32)
        pad = 0
        if chunk.shape[0] < _BATCH:
            pad = _BATCH - chunk.shape[0]
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], np.float32)]
            )
        f = np.asarray(_pool_features(params, jnp.asarray(chunk), variant))
        out.append(f[: _BATCH - pad])
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
