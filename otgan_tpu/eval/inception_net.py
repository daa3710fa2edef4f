"""InceptionV3 classifier in pure JAX (inference mode) for the Inception
score (reference ``utils/inception.py``).

The reference downloads the frozen TF-2015 ``classify_image`` GraphDef at
import time and executes it through a TF session (``utils/inception.py:
55-96``). That is replaced by a jitted JAX forward of the same network
family (Szegedy et al. 2015 InceptionV3): conv stem, Inception A/B/C/D/E
blocks, global average pool, linear classifier — with BatchNorm folded in
inference form. Weights load from a local ``.npz`` produced by
``otgan_tpu/eval/convert_torch_inception.py`` (torchvision checkpoint) or
any converter matching the parameter tree below; shapes are validated by
``init_params`` which builds a random tree of identical structure.

Layout: NHWC, HWIO kernels; all compute f32 on the MXU.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

NUM_CLASSES = 1000
BN_EPS = 1e-3


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _conv_bn(p, x, stride=(1, 1), padding="SAME"):
    """conv (no bias) + inference BatchNorm + relu (BasicConv2d)."""
    dn = jax.lax.conv_dimension_numbers(
        x.shape, p["w"].shape, ("NHWC", "HWIO", "NHWC")
    )
    x = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=stride, padding=padding,
        dimension_numbers=dn,
    )
    inv = p["scale"] / jnp.sqrt(p["var"] + BN_EPS)
    x = x * inv + (p["bias"] - p["mean"] * inv)
    return jax.nn.relu(x)


def _maxpool(x, size=3, stride=2, padding="VALID"):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, size, size, 1), (1, stride, stride, 1), padding,
    )


def _avgpool3(x, exclude_pad: bool = False):
    # torchvision avg_pool2d(3, stride=1, padding=1) defaults to
    # count_include_pad=True: divisor is ALWAYS 9, including borders —
    # converted torchvision weights require matching this. The TF-2015
    # frozen graph's avg_pool EXCLUDES padding from the divisor
    # (exclude_pad=True), selected by variant="tf2015".
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
    )
    if not exclude_pad:
        return s / 9.0
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    count = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
    )
    return s / count


# ---------------------------------------------------------------------------
# blocks (torchvision InceptionV3 topology)
# ---------------------------------------------------------------------------


def _inception_a(p, x, exclude_pad=False):
    b1 = _conv_bn(p["b1x1"], x)
    b5 = _conv_bn(p["b5x5_2"], _conv_bn(p["b5x5_1"], x))
    b3 = _conv_bn(
        p["b3x3dbl_3"], _conv_bn(p["b3x3dbl_2"], _conv_bn(p["b3x3dbl_1"], x))
    )
    bp = _conv_bn(p["bpool"], _avgpool3(x, exclude_pad))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, x):
    b3 = _conv_bn(p["b3x3"], x, stride=(2, 2), padding="VALID")
    bd = _conv_bn(
        p["b3x3dbl_3"],
        _conv_bn(p["b3x3dbl_2"], _conv_bn(p["b3x3dbl_1"], x)),
        stride=(2, 2),
        padding="VALID",
    )
    bp = _maxpool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(p, x, exclude_pad=False):
    b1 = _conv_bn(p["b1x1"], x)
    b7 = _conv_bn(
        p["b7x7_3"], _conv_bn(p["b7x7_2"], _conv_bn(p["b7x7_1"], x))
    )
    bd = x
    for k in ("b7x7dbl_1", "b7x7dbl_2", "b7x7dbl_3", "b7x7dbl_4", "b7x7dbl_5"):
        bd = _conv_bn(p[k], bd)
    bp = _conv_bn(p["bpool"], _avgpool3(x, exclude_pad))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, x):
    b3 = _conv_bn(
        p["b3x3_2"], _conv_bn(p["b3x3_1"], x), stride=(2, 2), padding="VALID"
    )
    b7 = _conv_bn(p["b7x7x3_1"], x)
    b7 = _conv_bn(p["b7x7x3_2"], b7)
    b7 = _conv_bn(p["b7x7x3_3"], b7)
    b7 = _conv_bn(p["b7x7x3_4"], b7, stride=(2, 2), padding="VALID")
    bp = _maxpool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(p, x, exclude_pad=False, pool_max=False):
    b1 = _conv_bn(p["b1x1"], x)
    b3 = _conv_bn(p["b3x3_1"], x)
    b3 = jnp.concatenate(
        [_conv_bn(p["b3x3_2a"], b3), _conv_bn(p["b3x3_2b"], b3)], axis=-1
    )
    bd = _conv_bn(p["b3x3dbl_2"], _conv_bn(p["b3x3dbl_1"], x))
    bd = jnp.concatenate(
        [_conv_bn(p["b3x3dbl_3a"], bd), _conv_bn(p["b3x3dbl_3b"], bd)], axis=-1
    )
    if pool_max:
        # TF-2015 quirk: mixed_10's pool branch is a MAX pool (the only
        # E-block topology difference vs torchvision)
        bp = _conv_bn(p["bpool"], _maxpool(x, size=3, stride=1, padding="SAME"))
    else:
        bp = _conv_bn(p["bpool"], _avgpool3(x, exclude_pad))
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


# ---------------------------------------------------------------------------
# full network
# ---------------------------------------------------------------------------


def pool_features(
    params: Dict, x: jax.Array, variant: str = "torchvision"
) -> jax.Array:
    """Images (N, 299, 299, 3) in [-1, 1] -> 2048-d pool features (the
    trunk shared by the classifier head and FID).

    ``variant="tf2015"`` reproduces the frozen 2015 ``classify_image``
    graph's pooling semantics (avg-pools exclude padding; ``Mixed_7c``'s
    pool branch is a max pool) for weights converted by
    ``convert_tf2015_inception.py``; the reference executes that graph at
    ``utils/inception.py:71-93``."""
    ep = variant == "tf2015"
    p = params
    x = _conv_bn(p["Conv2d_1a_3x3"], x, stride=(2, 2), padding="VALID")
    x = _conv_bn(p["Conv2d_2a_3x3"], x, padding="VALID")
    x = _conv_bn(p["Conv2d_2b_3x3"], x)
    x = _maxpool(x)
    x = _conv_bn(p["Conv2d_3b_1x1"], x, padding="VALID")
    x = _conv_bn(p["Conv2d_4a_3x3"], x, padding="VALID")
    x = _maxpool(x)
    x = _inception_a(p["Mixed_5b"], x, ep)
    x = _inception_a(p["Mixed_5c"], x, ep)
    x = _inception_a(p["Mixed_5d"], x, ep)
    x = _inception_b(p["Mixed_6a"], x)
    x = _inception_c(p["Mixed_6b"], x, ep)
    x = _inception_c(p["Mixed_6c"], x, ep)
    x = _inception_c(p["Mixed_6d"], x, ep)
    x = _inception_c(p["Mixed_6e"], x, ep)
    x = _inception_d(p["Mixed_7a"], x)
    x = _inception_e(p["Mixed_7b"], x, ep)
    x = _inception_e(p["Mixed_7c"], x, ep, pool_max=ep)
    return jnp.mean(x, axis=(1, 2))  # global average pool -> (N, 2048)


def apply(
    params: Dict, x: jax.Array, variant: str = "torchvision"
) -> jax.Array:
    """Images (N, 299, 299, 3) normalized to [-1, 1] -> logits (N, classes)."""
    f = pool_features(params, x, variant=variant)
    return f @ params["fc"]["w"] + params["fc"]["b"]


# ---------------------------------------------------------------------------
# parameter-tree spec (shapes) + random init for tests / converter checks
# ---------------------------------------------------------------------------


def _cb(cin, cout, kh, kw):
    return {"w": (kh, kw, cin, cout), "scale": (cout,), "bias": (cout,),
            "mean": (cout,), "var": (cout,)}


def _spec_a(cin, pool):
    return {
        "b1x1": _cb(cin, 64, 1, 1),
        "b5x5_1": _cb(cin, 48, 1, 1), "b5x5_2": _cb(48, 64, 5, 5),
        "b3x3dbl_1": _cb(cin, 64, 1, 1), "b3x3dbl_2": _cb(64, 96, 3, 3),
        "b3x3dbl_3": _cb(96, 96, 3, 3),
        "bpool": _cb(cin, pool, 1, 1),
    }


def _spec_b(cin):
    return {
        "b3x3": _cb(cin, 384, 3, 3),
        "b3x3dbl_1": _cb(cin, 64, 1, 1), "b3x3dbl_2": _cb(64, 96, 3, 3),
        "b3x3dbl_3": _cb(96, 96, 3, 3),
    }


def _spec_c(cin, c7):
    return {
        "b1x1": _cb(cin, 192, 1, 1),
        "b7x7_1": _cb(cin, c7, 1, 1), "b7x7_2": _cb(c7, c7, 1, 7),
        "b7x7_3": _cb(c7, 192, 7, 1),
        "b7x7dbl_1": _cb(cin, c7, 1, 1), "b7x7dbl_2": _cb(c7, c7, 7, 1),
        "b7x7dbl_3": _cb(c7, c7, 1, 7), "b7x7dbl_4": _cb(c7, c7, 7, 1),
        "b7x7dbl_5": _cb(c7, 192, 1, 7),
        "bpool": _cb(cin, 192, 1, 1),
    }


def _spec_d(cin):
    return {
        "b3x3_1": _cb(cin, 192, 1, 1), "b3x3_2": _cb(192, 320, 3, 3),
        "b7x7x3_1": _cb(cin, 192, 1, 1), "b7x7x3_2": _cb(192, 192, 1, 7),
        "b7x7x3_3": _cb(192, 192, 7, 1), "b7x7x3_4": _cb(192, 192, 3, 3),
    }


def _spec_e(cin):
    return {
        "b1x1": _cb(cin, 320, 1, 1),
        "b3x3_1": _cb(cin, 384, 1, 1), "b3x3_2a": _cb(384, 384, 1, 3),
        "b3x3_2b": _cb(384, 384, 3, 1),
        "b3x3dbl_1": _cb(cin, 448, 1, 1), "b3x3dbl_2": _cb(448, 384, 3, 3),
        "b3x3dbl_3a": _cb(384, 384, 1, 3), "b3x3dbl_3b": _cb(384, 384, 3, 1),
        "bpool": _cb(cin, 192, 1, 1),
    }


def param_spec(num_classes: int = NUM_CLASSES) -> Dict:
    return {
        "Conv2d_1a_3x3": _cb(3, 32, 3, 3),
        "Conv2d_2a_3x3": _cb(32, 32, 3, 3),
        "Conv2d_2b_3x3": _cb(32, 64, 3, 3),
        "Conv2d_3b_1x1": _cb(64, 80, 1, 1),
        "Conv2d_4a_3x3": _cb(80, 192, 3, 3),
        "Mixed_5b": _spec_a(192, 32),
        "Mixed_5c": _spec_a(256, 64),
        "Mixed_5d": _spec_a(288, 64),
        "Mixed_6a": _spec_b(288),
        "Mixed_6b": _spec_c(768, 128),
        "Mixed_6c": _spec_c(768, 160),
        "Mixed_6d": _spec_c(768, 160),
        "Mixed_6e": _spec_c(768, 192),
        "Mixed_7a": _spec_d(768),
        "Mixed_7b": _spec_e(1280),
        "Mixed_7c": _spec_e(2048),
        "fc": {"w": (2048, num_classes), "b": (num_classes,)},
    }


def init_params(rng: np.random.Generator, num_classes: int = NUM_CLASSES):
    """Random parameter tree with correct shapes (tests / converter checks).
    BN statistics initialized to identity (mean 0, var 1)."""
    def build(spec):
        if isinstance(spec, dict) and all(
            isinstance(v, tuple) for v in spec.values()
        ):
            out = {}
            for k, shape in spec.items():
                if k in ("mean", "bias", "b"):
                    out[k] = jnp.zeros(shape, jnp.float32)
                elif k in ("var", "scale"):
                    out[k] = jnp.ones(shape, jnp.float32)
                else:
                    fan_in = int(np.prod(shape[:-1]))
                    out[k] = jnp.asarray(
                        rng.standard_normal(shape) / np.sqrt(fan_in),
                        jnp.float32,
                    )
            return out
        return {k: build(v) for k, v in spec.items()}

    return build(param_spec(num_classes))
