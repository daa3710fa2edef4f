"""MED losses with the reference's exact gradient semantics.

The reference never takes the gradient of a scalar loss. It hand-injects
cotangents into ``tf.gradients``:

* generator (``train.py:108-113``):
  ``tf.gradients(ys=f_gen, xs=gen_params, grad_ys=f_aa - f_ab)`` summed over
  GPUs;
* discriminator (``train.py:115-130``): cotangent ``f_bb - f_ba`` on the data
  features plus ``f_aa - f_ab`` on the fake features, then *ascent* via a
  negative learning rate (``train.py:143``).

Because backprop is seeded at the feature tensors, the Sinkhorn assignment is
implicitly detached. We therefore write surrogate scalars

    L = sum(features * stop_gradient(matched_delta))

whose ``jax.grad`` is exactly the injected cotangent — including the quirk
noted in SURVEY.md section 7 that the cross term enters with weight 1 (not the
analytic Sinkhorn-detached gradient of ``calc_distance``, whose cross term
would be doubled). The *reported* distance stays ``matching.calc_distance``.

Gradients are SUMS over the global batch (the reference sums per-GPU grads at
``train.py:134-139``; nothing divides by batch size).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from otgan_tpu.ops.matching import MatchedFeatures

sg = jax.lax.stop_gradient


def med_generator_loss(
    features_gen: jax.Array, matched: MatchedFeatures
) -> jax.Array:
    """Scalar whose grad wrt the generator equals the reference's injected
    generator cotangent ``f_aa - f_ab`` (``train.py:111-112``)."""
    return jnp.sum(features_gen * sg(matched.a_a - matched.a_b))


def med_discriminator_loss(
    features_fake: jax.Array,
    features_data: jax.Array,
    matched: MatchedFeatures,
) -> jax.Array:
    """Scalar whose grad wrt the critic equals the reference's injected
    discriminator cotangents (``train.py:119-128``). ``features_fake`` is the
    raw-generator or EMA-generator features depending on
    ``--train_disc_against_ema``. The caller performs *ascent* by running the
    optimizer with a negative learning rate, exactly as ``train.py:143``.
    """
    return jnp.sum(features_data * sg(matched.b_b - matched.b_a)) + jnp.sum(
        features_fake * sg(matched.a_a - matched.a_b)
    )
