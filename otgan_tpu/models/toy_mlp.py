"""Toy MLP generator/critic for the 8-Gaussians 2D MED-GAN.

Mirrors the de-facto integration test of the reference
(``toy_example/med_gan_toy_example2.ipynb``, cells 0-1): relu MLPs — G:
z in R^256 -> 128x3 -> 2 (no output nonlinearity); critic: x/4 -> 32x3 -> 16-d
features (no normalization) — with the scaled squared-Euclidean transport
cost (``toy_example/matching_cpu.py:17-45``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from otgan_tpu.nn.layers import Module, Scope, dense

LATENT_DIM = 256
FEATURE_DIM = 16


def disc_spec(scope: Scope, x: jax.Array, nonlinearity: str = "relu"):
    h = x / 4.0  # input scaling from the notebook critic
    h = dense(scope, h, 32, pre_activation=None, weight_norm=False, use_g=False)
    h = dense(scope, h, 32, pre_activation=nonlinearity, weight_norm=False, use_g=False)
    h = dense(scope, h, 32, pre_activation=nonlinearity, weight_norm=False, use_g=False)
    h = dense(scope, h, FEATURE_DIM, pre_activation=nonlinearity, weight_norm=False, use_g=False)
    return h


def gen_spec(
    scope: Scope, rng: jax.Array, batch_size: int, nonlinearity: str = "relu"
):
    z = jax.random.normal(rng, (batch_size, LATENT_DIM))
    h = dense(scope, z, 128, pre_activation=None, weight_norm=False, use_g=False)
    h = dense(scope, h, 128, pre_activation=nonlinearity, weight_norm=False, use_g=False)
    h = dense(scope, h, 128, pre_activation=nonlinearity, weight_norm=False, use_g=False)
    h = dense(scope, h, 2, pre_activation=nonlinearity, weight_norm=False, use_g=False)
    return h


def make_discriminator(
    nonlinearity: str = "relu",
    remat: bool = False,
    compute_dtype="float32",
    remat_policy: str = "",  # accepted for API uniformity; no tagged points
):
    return Module(
        lambda scope, x: disc_spec(scope, x, nonlinearity),
        remat=remat,
        compute_dtype=compute_dtype,
        remat_policy=remat_policy,
    )


def make_generator(
    nonlinearity: str = "relu",
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
