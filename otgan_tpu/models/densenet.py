"""DenseNet-style generator and critic (reference ``models/densenet.py``).

Critic (``disc_spec``, ``models/densenet.py:7-45``): 3 dense blocks
(``layers_per_block`` convs of ``filters_per_layer`` channels, each taking
the *list* of all previous outputs as input) separated by stride-2
"downsample" convs that halve total channels; final CReLU + flatten + row
L2-normalize.

Generator (``gen_spec``, ``models/densenet.py:51-88``): multi-resolution
noise injection — U(-1,1) noise at 100-d and at 8x8 / 16x16 / 32x32 spatial
resolutions joins the feature list at each scale — dense blocks +
NN-upsample convs, tanh output (init_scale 0.1).

The list-of-tensors dense connectivity uses the layer library's list-input
convs (pre-activate each element, concat channels, one conv) — XLA fuses the
concat into the conv input, so no O(L^2) copies materialize.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from otgan_tpu.nn.layers import (
    Module,
    Scope,
    conv2d,
    dense,
    l2_normalize_rows,
    nn_upsample,
    save_point,
)

LATENT_DIM = 100


def _block(scope, x, layers_per_block, filters_per_layer, nonlinearity):
    if not isinstance(x, list):
        x = [x]
    for _ in range(layers_per_block):
        x = x + [
            conv2d(
                scope, x, filters_per_layer, pre_activation=nonlinearity
            )
        ]
    return x


def _downsample(scope, x, nonlinearity):
    if not isinstance(x, list):
        x = [x]
    total = sum(int(xi.shape[-1]) for xi in x)
    return conv2d(
        scope, x, total // 2, pre_activation=nonlinearity, stride=(2, 2)
    )


def disc_spec(
    scope: Scope,
    x: jax.Array,
    layers_per_block: int = 16,
    filters_per_layer: int = 16,
    nonlinearity: str = "crelu",
):
    x = conv2d(scope, x, 2 * filters_per_layer, pre_activation=None)
    x = _block(scope, x, layers_per_block, filters_per_layer, nonlinearity)
    # selective-remat boundaries at the downsamples: saving one halves the
    # activations that the backward pass must rebuild for the preceding
    # dense block's list connectivity (inert without a remat_policy)
    x = save_point(_downsample(scope, x, nonlinearity), "disc_d1")
    x = _block(scope, x, layers_per_block, filters_per_layer, nonlinearity)
    x = save_point(_downsample(scope, x, nonlinearity), "disc_d2")
    x = _block(scope, x, layers_per_block, filters_per_layer, nonlinearity)
    x = save_point(_downsample(scope, x, nonlinearity), "disc_d3")

    x = jnp.concatenate([jax.nn.relu(x), jax.nn.relu(-x)], axis=-1)
    x = x.reshape(x.shape[0], -1)
    return l2_normalize_rows(x)


def _gen_upsample(scope, x, nonlinearity):
    # models/densenet.py:67-73: concat -> NN resize 2x -> conv(ch//2)
    if isinstance(x, list):
        x = jnp.concatenate(x, axis=-1)
    ch = x.shape[-1]
    return conv2d(
        scope, x, ch // 2, pre_activation=nonlinearity, upsample=True
    )


def gen_spec(
    scope: Scope,
    rng: jax.Array,
    batch_size: int,
    layers_per_block: int = 16,
    filters_per_layer: int = 16,
    nonlinearity: str = "crelu",
):
    k0, k1, k2, k3 = jax.random.split(rng, 4)
    uni = lambda k, shape: jax.random.uniform(k, shape, minval=-1.0, maxval=1.0)
    u0 = uni(k0, (batch_size, LATENT_DIM))
    u1 = uni(k1, (batch_size, 8, 8, filters_per_layer))
    u2 = uni(k2, (batch_size, 16, 16, filters_per_layer))
    u3 = uni(k3, (batch_size, 32, 32, filters_per_layer))

    x = dense(scope, u0, 8 * 8 * filters_per_layer, pre_activation=None)
    x: List[jax.Array] = [
        x.reshape(batch_size, 8, 8, filters_per_layer), u1
    ]
    x = _block(scope, x, layers_per_block, filters_per_layer, nonlinearity)
    x = save_point(_gen_upsample(scope, x, nonlinearity), "gen_u1")
    x = [x, u2]
    x = _block(scope, x, layers_per_block, filters_per_layer, nonlinearity)
    x = save_point(_gen_upsample(scope, x, nonlinearity), "gen_u2")
    x = [x, u3]
    x = _block(scope, x, layers_per_block, filters_per_layer, nonlinearity)

    x = conv2d(
        scope, x, 3, pre_activation=nonlinearity, init_scale=0.1
    )
    return jnp.tanh(x)


def make_discriminator(
    layers_per_block: int = 16,
    filters_per_layer: int = 16,
    nonlinearity: str = "crelu",
    remat: bool = False,
    compute_dtype="float32",
    remat_policy: str = "",
):
    return Module(
        lambda scope, x: disc_spec(
            scope, x, layers_per_block, filters_per_layer, nonlinearity
        ),
        remat=remat,
        compute_dtype=compute_dtype,
        remat_policy=remat_policy,
    )


def make_generator(
    layers_per_block: int = 16,
    filters_per_layer: int = 16,
    nonlinearity: str = "crelu",
    remat: bool = False,
    compute_dtype="float32",
    remat_policy: str = "",
):
    return Module(
        lambda scope, rng, batch_size: gen_spec(
            scope, rng, batch_size, layers_per_block, filters_per_layer,
            nonlinearity,
        ),
        remat=remat,
        compute_dtype=compute_dtype,
        remat_policy=remat_policy,
    )
