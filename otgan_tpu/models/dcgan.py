"""DCGAN-style generator and critic (reference ``models/dcgan.py``).

Critic (``disc_spec``, ``models/dcgan.py:7-22``): four 5x5 weight-norm convs
(128 -> 256 -> 512 -> 1024 channels, stride-2 downsampling, crelu
pre-activations), then a CReLU concat, flatten, and row L2-normalization —
the output is a 4*4*2048 = 32768-dim unit feature vector, not a logit.

Generator (``gen_spec``, ``models/dcgan.py:28-52``): latent u ~ U(-1,1)^100
sampled inside the module (the reference samples in-graph,
``models/dcgan.py:30``; here the caller threads an explicit PRNG key),
dense -> 4x4x1024 with a GLU gate, three (nearest-neighbor upsample -> 5x5
conv -> GLU) stages to 32x32, and a tanh output conv with init_scale 0.1.

TPU notes: NHWC convs compile to MXU convolutions; the NN-upsample is a
reshape/broadcast XLA fuses into the following conv's input; channel counts
(128..1024, and 2x for GLU/crelu) are multiples of 128 = lane width.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from otgan_tpu.nn.layers import (
    Module,
    Scope,
    conv2d,
    dense,
    glu,
    l2_normalize_rows,
    save_point,
    save_point_half,
)

LATENT_DIM = 100


def disc_spec(
    scope: Scope,
    x: jax.Array,
    nonlinearity: str = "crelu",
    half_c2: bool = False,
):
    # save_point tags: selective-remat boundaries (inert without a
    # remat_policy). Per-byte recompute value rises with depth: conv4's
    # 4x4x1024 output costs ~0.84 GFLOP/img to rebuild per 168 MB saved
    # at batch 5120 (docs/DESIGN.md section 7).
    x = conv2d(scope, x, 128, filter_size=(5, 5), pre_activation=None)
    # disc_c2 is the one save measured OOM at paper scale (1.34 GB on top
    # of the 5-save set); disc_c2_half is the half-granularity experiment,
    # MEASURED WORSE (the backward concat rebuild adds ~1.5 GB transient —
    # docs/DESIGN.md section 7, phase-3 table). The slice+concat wrapper is
    # only emitted when the policy names it: even policy-inert, its ops
    # shift XLA's scheduling enough to push the 5-save program 79 MB over
    # HBM (measured this round).
    x = save_point(
        conv2d(
            scope, x, 256, filter_size=(5, 5),
            pre_activation=nonlinearity, stride=(2, 2),
        ),
        "disc_c2",
    )
    if half_c2:
        x = save_point_half(x, "disc_c2_half")
    x = save_point(
        conv2d(
            scope, x, 512, filter_size=(5, 5), pre_activation=nonlinearity,
            stride=(2, 2),
        ),
        "disc_c3",
    )
    x = save_point(
        conv2d(
            scope, x, 1024, filter_size=(5, 5), pre_activation=nonlinearity,
            stride=(2, 2),
        ),
        "disc_c4",
    )
    # final CReLU concat + flatten + L2 normalize (models/dcgan.py:16-19)
    x = jnp.concatenate([jax.nn.relu(x), jax.nn.relu(-x)], axis=-1)
    x = x.reshape(x.shape[0], -1)
    return l2_normalize_rows(x)


def gen_spec(
    scope: Scope,
    rng: jax.Array,
    batch_size: int,
    nonlinearity: str = "crelu",  # unused by dcgan gen; kept for uniform API
):
    u = jax.random.uniform(
        rng, (batch_size, LATENT_DIM), minval=-1.0, maxval=1.0
    )
    x = dense(scope, u, 2 * 4 * 4 * 1024, pre_activation=None)
    x = glu(x, axis=1)
    x = x.reshape(batch_size, 4, 4, 1024)
    x = conv2d(
        scope, x, 2 * 512, filter_size=(5, 5), pre_activation=None,
        upsample=True,
    )
    # post-GLU save points: half the bytes of the conv output, and the GLU
    # itself is fused/free to recompute. gen_g1 is the best save in the
    # whole model: ~3.4 GFLOP/img of conv recompute per 336 MB (bf16,
    # batch 5120) — see docs/DESIGN.md section 7.
    x = save_point(glu(x, axis=-1), "gen_g1")
    x = conv2d(
        scope, x, 2 * 256, filter_size=(5, 5), pre_activation=None,
        upsample=True,
    )
    x = save_point(glu(x, axis=-1), "gen_g2")
    x = conv2d(
        scope, x, 2 * 128, filter_size=(5, 5), pre_activation=None,
        upsample=True,
    )
    x = save_point(glu(x, axis=-1), "gen_g3")
    x = conv2d(
        scope, x, 3, filter_size=(5, 5), pre_activation=None, init_scale=0.1
    )
    return jnp.tanh(x)


def make_discriminator(
    nonlinearity: str = "crelu",
    remat: bool = False,
    compute_dtype="float32",
    remat_policy: str = "",
):
    half_c2 = "disc_c2_half" in remat_policy
    return Module(
        lambda scope, x: disc_spec(scope, x, nonlinearity, half_c2=half_c2),
        remat=remat,
        compute_dtype=compute_dtype,
        remat_policy=remat_policy,
    )


def make_generator(
    nonlinearity: str = "crelu",
    remat: bool = False,
    compute_dtype="float32",
    remat_policy: str = "",
):
    return Module(
        lambda scope, rng, batch_size: gen_spec(
            scope, rng, batch_size, nonlinearity
        ),
        remat=remat,
        compute_dtype=compute_dtype,
        remat_policy=remat_policy,
    )
