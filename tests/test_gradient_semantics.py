"""The rebuild's losses must reproduce the reference's hand-injected
``grad_ys`` gradients exactly (SURVEY.md section 4 item (c), section 7).

Reference semantics (train.py:108-130):
  d L_gen / d gen_params  = VJP of f_gen with cotangent (f_aa - f_ab), summed
  d L_disc / d disc_params = VJP of f_dat with cotangent (f_bb - f_ba)
                           + VJP of f_fake with cotangent (f_aa - f_ab)
with the Sinkhorn matching detached, and gradients SUMMED over the batch.
"""

import numpy as np
import jax
import jax.numpy as jnp

from otgan_tpu.ops import (
    match_two_batch,
    med_generator_loss,
    med_discriminator_loss,
)


def _l2norm_rows(x):
    return x / jnp.sqrt(jnp.sum(jnp.square(x), axis=1, keepdims=True))


def _critic(params, x):
    """Tiny stand-in critic: linear + row L2-normalize (the reference critic's
    essential output structure, models/dcgan.py:16-19)."""
    return _l2norm_rows(jnp.tanh(x @ params["w"] + params["b"]))


def _gen(params, z):
    return jnp.tanh(z @ params["w"])


def _setup(seed=0, B=32, dz=8, dx=12, df=16):
    rng = np.random.default_rng(seed)
    gen_params = {"w": jnp.asarray(rng.standard_normal((dz, dx)), jnp.float32)}
    disc_params = {
        "w": jnp.asarray(rng.standard_normal((dx, df)) * 0.3, jnp.float32),
        "b": jnp.asarray(rng.standard_normal((df,)) * 0.1, jnp.float32),
    }
    z = jnp.asarray(rng.standard_normal((B, dz)), jnp.float32)
    x_dat = jnp.asarray(rng.standard_normal((B, dx)), jnp.float32)
    return gen_params, disc_params, z, x_dat


LAM, ITERS = 30.0, 40


def test_generator_grad_equals_injected_cotangent():
    gen_params, disc_params, z, x_dat = _setup()

    # forward once to get the (detached) matched cotangent
    f_gen = _critic(disc_params, _gen(gen_params, z))
    f_dat = _critic(disc_params, x_dat)
    matched = match_two_batch(f_gen, f_dat, LAM, ITERS)
    cotangent = np.asarray(matched.a_a - matched.a_b)

    # our loss formulation
    def loss_fn(gp):
        fg = _critic(disc_params, _gen(gp, z))
        m = match_two_batch(fg, f_dat, LAM, ITERS)
        return med_generator_loss(fg, m)

    grads = jax.grad(loss_fn)(gen_params)

    # the reference's computation: VJP of f_gen at fixed cotangent
    _, vjp = jax.vjp(lambda gp: _critic(disc_params, _gen(gp, z)), gen_params)
    want = vjp(jnp.asarray(cotangent))[0]

    np.testing.assert_allclose(
        np.asarray(grads["w"]), np.asarray(want["w"]), rtol=1e-4, atol=1e-6
    )


def test_discriminator_grad_equals_injected_cotangents():
    gen_params, disc_params, z, x_dat = _setup(seed=1)
    x_gen = _gen(gen_params, z)

    f_gen = _critic(disc_params, x_gen)
    f_dat = _critic(disc_params, x_dat)
    matched = match_two_batch(f_gen, f_dat, LAM, ITERS)
    cot_gen = jnp.asarray(np.asarray(matched.a_a - matched.a_b))
    cot_dat = jnp.asarray(np.asarray(matched.b_b - matched.b_a))

    def loss_fn(dp):
        fg = _critic(dp, x_gen)
        fd = _critic(dp, x_dat)
        m = match_two_batch(fg, fd, LAM, ITERS)
        return med_discriminator_loss(fg, fd, m)

    grads = jax.grad(loss_fn)(disc_params)

    # reference: two VJPs with fixed cotangents, summed
    _, vjp_g = jax.vjp(lambda dp: _critic(dp, x_gen), disc_params)
    _, vjp_d = jax.vjp(lambda dp: _critic(dp, x_dat), disc_params)
    want = jax.tree.map(
        lambda a, b: a + b, vjp_g(cot_gen)[0], vjp_d(cot_dat)[0]
    )

    for k in ("w", "b"):
        np.testing.assert_allclose(
            np.asarray(grads[k]), np.asarray(want[k]), rtol=1e-4, atol=1e-6
        )


def test_gen_grad_differs_from_naive_calc_distance_grad():
    """Guard the SURVEY.md section 7 quirk: the injected gradient is NOT the
    gradient of calc_distance with Sinkhorn detached (cross-term weight 1 vs
    2). If someone 'simplifies' the loss to grad-of-distance, this fails."""
    from otgan_tpu.ops import calc_distance

    gen_params, disc_params, z, x_dat = _setup(seed=2)
    f_dat = _critic(disc_params, x_dat)

    def loss_ours(gp):
        fg = _critic(disc_params, _gen(gp, z))
        m = match_two_batch(fg, f_dat, LAM, ITERS)
        return med_generator_loss(fg, m)

    def loss_naive(gp):
        fg = _critic(disc_params, _gen(gp, z))
        m = match_two_batch(fg, f_dat, LAM, ITERS)
        sg = jax.lax.stop_gradient
        m = type(m)(sg(m.a_a), sg(m.b_b), sg(m.a_b), sg(m.b_a), m.entropy)
        B = fg.shape[0]
        return calc_distance(fg, f_dat, m) * (2.0 * B)  # unnormalized

    g_ours = jax.grad(loss_ours)(gen_params)["w"]
    g_naive = jax.grad(loss_naive)(gen_params)["w"]
    assert not np.allclose(np.asarray(g_ours), np.asarray(g_naive), atol=1e-5)
