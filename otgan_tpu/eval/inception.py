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
# classifier batch. Default 100 = the reference protocol
# (utils/inception.py:34). Per-image probabilities are batch-invariant, so
# OTGAN_INCEPTION_BATCH can raise this to amortize per-batch dispatch +
# host->device transfer over the 50 000x2 samples of a full eval
# without changing the score. Measured on one v5e chip (streaming
# sampler path, DCGAN generator): 50 000 samples in 42 s at 100 and
# 32 s at 500 (1572 img/s) — one full raw+EMA eval event is ~2 x 32 s.
# bf16 classifier compute was MEASURED A NON-WIN (r03: 279 ms/batch-500
# vs 268 f32 — the tf2015 forward is not MXU-bound at this batch), so
# scoring stays f32, which the 8.47-parity comparison wants anyway.
_BATCH = int(os.environ.get("OTGAN_INCEPTION_BATCH", "100"))

_params_cache = None
_variant_cache = "torchvision"


def load_params(path: Optional[str] = None):
    """Load the converted classifier weights (cached). The npz's
    ``__variant__`` marker (written by ``convert_tf2015_inception.py``)
    selects the network/preprocessing variant used by scoring."""
    global _params_cache, _variant_cache
    if _params_cache is not None:
        return _params_cache
    path = path or os.environ.get("OTGAN_INCEPTION_WEIGHTS", DEFAULT_WEIGHTS)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"Inception weights not found at {path}. Convert the reference's "
            "frozen TF-2015 graph with otgan_tpu/eval/"
            "convert_tf2015_inception.py (exact IS parity) or a torchvision "
            "checkpoint with convert_torch_inception.py, or set "
            "OTGAN_INCEPTION_WEIGHTS."
        )
    with np.load(path) as data:
        if "__variant__" in data:
            _variant_cache = bytes(data["__variant__"]).decode("utf-8")
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


def get_variant() -> str:
    """Network/preprocessing variant of the loaded weights."""
    return _variant_cache


def _resize_bilinear_tf1(x, out_h: int, out_w: int):
    """TF1 ``ResizeBilinear`` (align_corners=False, legacy non-half-pixel
    sampling: src = out_idx * in/out) — the resize the frozen 2015 graph
    applies to its input (``utils/inception.py:79-90`` feeds 'ExpandDims:0'
    upstream of the graph's internal ResizeBilinear)."""
    _, h, w, _ = x.shape

    def grid(in_s, out_s):
        src = jnp.arange(out_s, dtype=jnp.float32) * (in_s / out_s)
        i0 = jnp.floor(src).astype(jnp.int32)
        frac = src - i0.astype(jnp.float32)
        i1 = jnp.minimum(i0 + 1, in_s - 1)
        return i0, i1, frac

    y0, y1, fy = grid(h, out_h)
    x0, x1, fx = grid(w, out_w)
    top, bot = x[:, y0], x[:, y1]
    rows = top + (bot - top) * fy[None, :, None, None]
    left, right = rows[:, :, x0], rows[:, :, x1]
    return left + (right - left) * fx[None, None, :, None]


def preprocess(x_uint8_range, variant: str = "torchvision"):
    """(B, H, W, 3) in [0, 255] -> (B, 299, 299, 3) network inputs.

    tf2015: legacy bilinear resize then (x - 128) / 128, exactly what the
    frozen ``classify_image`` graph does between 'ExpandDims:0' and the
    first conv. torchvision: half-pixel bilinear + x/127.5 - 1.
    """
    x = x_uint8_range.astype(jnp.float32)
    if variant == "tf2015":
        x = _resize_bilinear_tf1(x, 299, 299)
        return (x - 128.0) / 128.0
    x = x / 127.5 - 1.0
    return jax.image.resize(x, (x.shape[0], 299, 299, 3), method="bilinear")


@functools.partial(jax.jit, static_argnames=("variant",))
def _preds(params, x_uint8_range, variant: str = "torchvision"):
    """(B, H, W, 3) in [0, 255] -> class probabilities (B, classes)."""
    x = preprocess(x_uint8_range, variant)
    logits = inception_net.apply(params, x, variant=variant)
    return jax.nn.softmax(logits, axis=-1)


def _check_batch(batch: int) -> None:
    """A non-positive classifier batch makes every chunk loop empty: the
    scorers would finalize from all-zero statistics (IS exactly 1.0 over
    zero samples, NaN FID) with no error anywhere. Fail loudly instead."""
    if batch < 1:
        raise ValueError(
            f"inception classifier batch must be >= 1, got {batch} "
            "(--inception_batch / OTGAN_INCEPTION_BATCH / bench knob)"
        )


def predict_probs(images: np.ndarray, params=None, variant=None) -> np.ndarray:
    """Batched classifier probabilities for a stack of images."""
    _check_batch(_BATCH)
    params = params if params is not None else load_params()
    variant = variant if variant is not None else _variant_cache
    n = images.shape[0]
    out = []
    for i in range(0, n, _BATCH):
        chunk = np.asarray(images[i : i + _BATCH], np.float32)
        pad = 0
        if chunk.shape[0] < _BATCH:
            pad = _BATCH - chunk.shape[0]
            chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:], np.float32)])
        p = np.asarray(_preds(params, jnp.asarray(chunk), variant))
        out.append(p[: _BATCH - pad])
    return np.concatenate(out)


def _serialize_on_cpu(x):
    """On CPU meshes, wait for each eval dispatch before issuing the next:
    XLA:CPU's in-process collectives deadlock when two executables'
    per-device invocations interleave (the train loop applies the same
    guard, train.py). On TPU this is a no-op so generation and
    classification keep overlapping."""
    if jax.default_backend() == "cpu":
        jax.block_until_ready(x)
    return x


def _stream_chunks(sample_fn, num_samples: int, batch: int):
    """Yield ``(chunk, start, real_len)`` over generated batches: chunks of
    exactly ``batch`` rows (ragged tails zero-padded), ``start`` the global
    index of the chunk's first row, ``real_len`` its unpadded row count.
    The single definition of the device-streaming eval loop — shared by the
    probability, split-KL, FID-feature, and combined scorers (they apply
    their own masking from ``start``/``real_len``)."""
    _check_batch(batch)
    got, seed = 0, 0
    while got < num_samples:
        x = _serialize_on_cpu(sample_fn(seed))
        seed += 1
        b = int(x.shape[0])
        for i in range(0, b, batch):
            chunk = x[i : i + batch]
            real_len = int(chunk.shape[0])
            if real_len < batch:
                chunk = jnp.concatenate(
                    [
                        chunk,
                        jnp.zeros(
                            (batch - real_len,) + tuple(chunk.shape[1:]),
                            chunk.dtype,
                        ),
                    ]
                )
            yield chunk, got + i, real_len
        got += b


@functools.partial(jax.jit, static_argnames=("variant",))
def _preds_pm1(params, x_pm1, variant: str = "torchvision"):
    """Like ``_preds`` but for generator output in [-1, 1] (one fused
    program: rescale + preprocess + classify, no host round trip)."""
    x255 = 127.5 * (x_pm1.astype(jnp.float32) + 1.0)  # train.py:260-261
    x = preprocess(x255, variant)
    logits = inception_net.apply(params, x, variant=variant)
    return jax.nn.softmax(logits, axis=-1)


def predict_probs_from_sampler(
    sample_fn, num_samples: int, params=None, variant=None
) -> np.ndarray:
    """Classify generated samples WITHOUT staging them on the host.

    The reference (and ``predict_probs``) pulls all eval samples to host
    and feeds them back batch-by-batch (``train.py:250-262``) — 2 x 614 MB
    of transfers per 50 000-sample eval. Here ``sample_fn(seed) ->
    (B, H, W, 3)`` device array in [-1, 1] (e.g. ``engine.sample``); each
    batch is sliced and classified ON DEVICE and only the (B, classes)
    probabilities come back.
    """
    params = params if params is not None else load_params()
    variant = variant if variant is not None else _variant_cache
    probs = []
    for chunk, _start, real_len in _stream_chunks(
        sample_fn, num_samples, _BATCH
    ):
        p = np.asarray(_preds_pm1(params, chunk, variant))
        probs.append(p[:real_len])
    return np.concatenate(probs)[:num_samples]


def _split_update(p, start, real_len, num_samples, upper, s1, s2):
    """Traceable core of the device split-KL reduction: fold one chunk of
    probabilities into the per-split sufficient statistics. Shared by the
    IS-only accumulator below and the combined IS+FID accumulator
    (``fid._combined_accum``). Also returns the chunk's validity mask so
    callers can weight companion statistics identically."""
    rows = jnp.arange(p.shape[0])
    gidx = start + rows
    # mask BOTH the zero-padding of a ragged chunk (rows >= real_len get
    # global indices that belong to the NEXT batch's real samples — without
    # this they double-count) and any overrun past num_samples
    valid = (rows < real_len) & (gidx < num_samples)
    # the reference's split i covers [i*n//splits, (i+1)*n//splits)
    # (utils/inception.py:48) — assign by those exact edges
    sid = jnp.clip(
        jnp.searchsorted(upper, gidx, side="right"), 0, s1.shape[0] - 1
    )
    pw = jnp.where(valid[:, None], p, 0.0)
    # x*log(x) with the x->0 limit (0): softmax entries underflow to exact
    # zero f32 for extreme logits (e.g. random-weight rehearsal classifiers,
    # early non-EMA generators); the naive product is 0*(-inf)=nan there.
    # Identical to the reference's kl (utils/inception.py:49) wherever the
    # reference is finite.
    xlogx = jnp.where(p > 0.0, p * jnp.log(jnp.where(p > 0.0, p, 1.0)), 0.0)
    plogp = jnp.where(valid, jnp.sum(xlogx, axis=-1), 0.0)
    return s1.at[sid].add(pw), s2.at[sid].add(plogp), valid


@functools.partial(jax.jit, static_argnames=("variant",))
def _split_accum(
    params,
    x_pm1,
    start,
    real_len,
    num_samples,
    upper,
    s1,
    s2,
    variant: str,
):
    """Accumulate one generated batch into per-split sufficient statistics.

    The reference's split-KL (``utils/inception.py:46-52``) decomposes per
    split as ``mean KL = (S2 - sum_j S1_j * log(S1_j / n)) / n`` with
    ``S1 = sum_samples p`` (the split marginal, unnormalized) and
    ``S2 = sum_samples sum_j p_j log p_j`` — both accumulable on device, so
    a full 50 000-sample eval moves ~(splits x classes) floats host-side
    instead of 200 MB of per-sample probabilities (which dominates eval
    wall time on transfer-limited links). ``num_samples`` and the split
    upper edges are traced (not static) so one compiled program serves
    every eval size with the same splits count and chunk shape — the
    bench's small warmup then pre-compiles the real 50k run."""
    p = _preds_pm1(params, x_pm1, variant)
    s1, s2, _ = _split_update(p, start, real_len, num_samples, upper, s1, s2)
    return s1, s2


def inception_score_from_sampler(
    sample_fn,
    num_samples: int,
    splits: int = 10,
    params=None,
    variant=None,
    device_reduce: Optional[bool] = None,
):
    """Device-streaming Inception score: reference protocol + split-KL
    math, with generation and classification fused on-device.

    ``device_reduce=True`` (default, env ``OTGAN_EVAL_DEVICE_REDUCE=0``
    opts out) additionally reduces the split statistics on device — the
    same split-KL formula via per-split sufficient statistics (f32
    accumulation over ~n/splits samples; agrees with the host-f64 path to
    ~1e-5, tested), cutting host transfer from O(num_samples x classes)
    to O(splits x classes). ``False`` stages all per-sample probabilities
    host-side and reduces in float64 (bit-matching
    ``inception_score_from_preds``)."""
    if device_reduce is None:
        device_reduce = os.environ.get("OTGAN_EVAL_DEVICE_REDUCE", "1") == "1"
    if not device_reduce:
        preds = predict_probs_from_sampler(
            sample_fn, num_samples, params=params, variant=variant
        )
        return inception_score_from_preds(preds, splits=splits)

    params = params if params is not None else load_params()
    variant = variant if variant is not None else _variant_cache
    n_classes = int(params["fc"]["b"].shape[0])
    s1 = jnp.zeros((splits, n_classes), jnp.float32)
    s2 = jnp.zeros((splits,), jnp.float32)
    upper = jnp.asarray(
        [num_samples * (i + 1) // splits for i in range(splits)], jnp.int32
    )
    n_traced = jnp.int32(num_samples)
    for chunk, start, real_len in _stream_chunks(
        sample_fn, num_samples, _BATCH
    ):
        s1, s2 = _split_accum(
            params,
            chunk,
            jnp.int32(start),
            jnp.int32(real_len),
            n_traced,
            upper,
            s1,
            s2,
            variant,
        )
        _serialize_on_cpu(s2)
    return _finalize_split_scores(s1, s2, num_samples, splits)


def _finalize_split_scores(
    s1, s2, num_samples: int, splits: int
) -> Tuple[float, float]:
    """(mean, std) of the split scores from the device-accumulated
    sufficient statistics — the reference's exact per-split mean KL as
    ``(S2 - sum_j S1_j log(S1_j / n)) / n`` (``utils/inception.py:46-52``),
    finalized host-side in float64."""
    s1 = np.asarray(s1, np.float64)
    s2 = np.asarray(s2, np.float64)
    # per-split sample counts from the reference's exact i*n//splits edges
    edges = [num_samples * i // splits for i in range(splits + 1)]
    counts = np.diff(edges).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        term = np.where(s1 > 0.0, s1 * np.log(s1 / counts[:, None]), 0.0)
    mean_kl = (s2 - term.sum(axis=1)) / counts
    scores = np.exp(mean_kl)
    return float(np.mean(scores)), float(np.std(scores))


def inception_score_from_preds(
    preds: np.ndarray, splits: int = 10
) -> Tuple[float, float]:
    """Reference split-KL math (``utils/inception.py:46-52``), with the
    ``x*log(x) -> 0`` limit at exact-zero probabilities (f32 softmax
    underflow for extreme logits); identical output wherever the reference
    is finite."""
    preds = np.asarray(preds, np.float64)
    n = preds.shape[0]
    scores = []
    for i in range(splits):
        part = preds[i * n // splits : (i + 1) * n // splits]
        marginal = np.mean(part, axis=0, keepdims=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            kl = np.where(
                part > 0.0,
                part * (np.log(part) - np.log(marginal)),
                0.0,
            )
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
