"""Inception score on TPU (reference ``utils/inception.py``).

API parity: ``get_inception_score(images, splits=10) -> (mean, std)`` with
images as uint8-range RGB arrays (the reference asserts 0..255 range and
feeds batches of 100 through the frozen graph, ``utils/inception.py:24-52``).

Differences, all deliberate:
* the classifier is a jitted JAX InceptionV3 running on TPU
  (``inception_net.py``) instead of a TF session over a downloaded frozen
  GraphDef — no import-time network fetch (``:95-96``);
* weights come from a local ``.npz`` (env ``OTGAN_INCEPTION_WEIGHTS`` or
  ``/tmp/imagenet/inception_v3_jax.npz``), produced by
  ``convert_torch_inception.py``. Absent weights raise ``FileNotFoundError``
  with instructions (zero-egress safe), and the training driver degrades
  gracefully;
* images are bilinearly resized to 299 and normalized to [-1, 1] on device
  (the frozen graph resized internally).

The split-KL score math is the reference's exactly
(``utils/inception.py:46-52``): over ``splits`` chunks,
``exp(mean_i KL(p(y|x_i) || mean_j p(y|x_j)))``; returns (mean, std).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from otgan_tpu.eval import inception_net

DEFAULT_WEIGHTS = "/tmp/imagenet/inception_v3_jax.npz"
_BATCH = 100  # reference batch size (utils/inception.py:34)

_params_cache = None


def load_params(path: Optional[str] = None):
    """Load the converted classifier weights (cached)."""
    global _params_cache
    if _params_cache is not None:
        return _params_cache
    path = path or os.environ.get("OTGAN_INCEPTION_WEIGHTS", DEFAULT_WEIGHTS)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"Inception weights not found at {path}. Convert a torchvision "
            "checkpoint with otgan_tpu/eval/convert_torch_inception.py or "
            "set OTGAN_INCEPTION_WEIGHTS."
        )
    with np.load(path) as data:
        spec = inception_net.param_spec(
            num_classes=int(data["fc/b"].shape[0])
        )

        def build(spec, prefix=""):
            out = {}
            for k, v in spec.items():
                key = f"{prefix}{k}"
                if isinstance(v, tuple):
                    arr = data[key]
                    if tuple(arr.shape) != v:
                        raise ValueError(
                            f"weight {key}: expected {v}, got {arr.shape}"
                        )
                    out[k] = jnp.asarray(arr, jnp.float32)
                else:
                    out[k] = build(v, prefix=f"{key}/")
            return out

        _params_cache = build(spec)
    return _params_cache


@functools.partial(jax.jit, static_argnames=())
def _preds(params, x_uint8_range):
    """(B, H, W, 3) in [0, 255] -> class probabilities (B, classes)."""
    x = x_uint8_range.astype(jnp.float32) / 127.5 - 1.0
    x = jax.image.resize(
        x, (x.shape[0], 299, 299, 3), method="bilinear"
    )
    logits = inception_net.apply(params, x)
    return jax.nn.softmax(logits, axis=-1)


def predict_probs(images: np.ndarray, params=None) -> np.ndarray:
    """Batched classifier probabilities for a stack of images."""
    params = params if params is not None else load_params()
    n = images.shape[0]
    out = []
    for i in range(0, n, _BATCH):
        chunk = np.asarray(images[i : i + _BATCH], np.float32)
        pad = 0
        if chunk.shape[0] < _BATCH:
            pad = _BATCH - chunk.shape[0]
            chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:], np.float32)])
        p = np.asarray(_preds(params, jnp.asarray(chunk)))
        out.append(p[: _BATCH - pad])
    return np.concatenate(out)


def inception_score_from_preds(
    preds: np.ndarray, splits: int = 10
) -> Tuple[float, float]:
    """Reference split-KL math (``utils/inception.py:46-52``)."""
    preds = np.asarray(preds, np.float64)
    n = preds.shape[0]
    scores = []
    for i in range(splits):
        part = preds[i * n // splits : (i + 1) * n // splits]
        kl = part * (np.log(part) - np.log(np.mean(part, axis=0, keepdims=True)))
        scores.append(np.exp(np.mean(np.sum(kl, axis=1))))
    return float(np.mean(scores)), float(np.std(scores))


def get_inception_score(
    images, splits: int = 10, params=None
) -> Tuple[float, float]:
    """Drop-in for the reference API: list/array of uint8-range RGB images
    -> (score mean, score std)."""
    images = np.asarray(images, np.float32)
    if images.ndim == 3:
        images = images[None]
    assert images.ndim == 4 and images.shape[-1] == 3, "need (N, H, W, 3)"
    assert images.max() > 10.0 and images.min() >= 0.0, (
        "images must be in [0, 255] range (reference utils/inception.py:28-29)"
    )
    preds = predict_probs(images, params=params)
    return inception_score_from_preds(preds, splits=splits)
