"""Model family tests: shapes, feature-head invariants, init/apply
consistency, EMA-apply (reference models/dcgan.py, models/densenet.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from otgan_tpu.models import dcgan, densenet, toy_mlp, get_model
from otgan_tpu.nn.ema import ema_init, ema_update


def test_get_model_switch():
    assert get_model("dcgan") is dcgan
    assert get_model("densenet") is densenet
    try:
        get_model("vae")
        assert False
    except ValueError:
        pass


def test_dcgan_critic_feature_head():
    """Feature dim 4*4*2048 = 32768, rows L2-normalized
    (models/dcgan.py:16-19; SURVEY.md: 'feature dim 32768')."""
    disc = dcgan.make_discriminator()
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3)), jnp.float32
    )
    params, f = disc.init(jax.random.PRNGKey(0), x)
    assert f.shape == (2, 32768)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(f), axis=1), 1.0, atol=1e-5
    )
    f2 = disc.apply(params, x)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f2), atol=2e-3)


def test_dcgan_generator_output():
    gen = dcgan.make_generator()
    params, x = gen.init(jax.random.PRNGKey(1), jax.random.PRNGKey(2), 2)
    assert x.shape == (2, 32, 32, 3)
    x = np.asarray(x)
    assert np.all(x >= -1.0) and np.all(x <= 1.0)
    # same rng -> same sample; different rng -> different.
    # atol: with a 2-sample init batch, data-dependent g = 1/std(pre) can be
    # large for some units, amplifying f32 reassociation between the init
    # path (scale output) and apply path (scale kernel) to ~5e-3.
    x_same = np.asarray(gen.apply(params, jax.random.PRNGKey(2), 2))
    np.testing.assert_allclose(x, x_same, atol=2e-2)
    x_diff = np.asarray(gen.apply(params, jax.random.PRNGKey(3), 2))
    assert np.abs(x - x_diff).max() > 1e-3


def test_densenet_small_config():
    """Small densenet (2 layers/block, 8 filters) exercises list convs,
    multi-res noise injection, upsample path (models/densenet.py)."""
    disc = densenet.make_discriminator(layers_per_block=2, filters_per_layer=8)
    gen = densenet.make_generator(layers_per_block=2, filters_per_layer=8)
    x = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (2, 32, 32, 3)), jnp.float32
    )
    dparams, f = disc.init(jax.random.PRNGKey(4), x)
    assert f.ndim == 2 and f.shape[0] == 2
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(f), axis=1), 1.0, atol=1e-5
    )
    gparams, xg = gen.init(jax.random.PRNGKey(5), jax.random.PRNGKey(6), 2)
    assert xg.shape == (2, 32, 32, 3)
    # apply-consistency
    f2 = disc.apply(dparams, x)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f2), atol=2e-3)
    xg2 = gen.apply(gparams, jax.random.PRNGKey(6), 2)
    np.testing.assert_allclose(np.asarray(xg), np.asarray(xg2), atol=2e-3)


def test_ema_apply_is_plain_apply_with_ema_params():
    gen = toy_mlp.make_generator()
    params, _ = gen.init(jax.random.PRNGKey(7), jax.random.PRNGKey(8), 4)
    ema = ema_init(params)
    # after init, EMA params == params -> same samples
    a = np.asarray(gen.apply(params, jax.random.PRNGKey(9), 4))
    b = np.asarray(gen.apply(ema, jax.random.PRNGKey(9), 4))
    np.testing.assert_allclose(a, b, atol=0)
    # after an update toward different params, samples differ
    other = jax.tree.map(lambda p: p + 1.0, params)
    ema = ema_update(ema, other, decay=0.5)
    c = np.asarray(gen.apply(ema, jax.random.PRNGKey(9), 4))
    assert np.abs(a - c).max() > 1e-4


def test_jit_apply():
    disc = toy_mlp.make_discriminator()
    x = jnp.ones((8, 2), jnp.float32)
    params, _ = disc.init(jax.random.PRNGKey(10), x)
    f = jax.jit(disc.apply)(params, x)
    assert f.shape == (8, toy_mlp.FEATURE_DIM)


def test_remat_matches_plain():
    disc = toy_mlp.make_discriminator(remat=True)
    disc2 = toy_mlp.make_discriminator(remat=False)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((4, 2)), jnp.float32
    )
    params, _ = disc2.init(jax.random.PRNGKey(11), x)
    a = np.asarray(disc.apply(params, x))
    b = np.asarray(disc2.apply(params, x))
    np.testing.assert_allclose(a, b, atol=1e-6)


@pytest.mark.slow  # ~80 s cold on the 1-core host: 6 XLA:CPU compiles of
# the full-width (32768-d head, reference parity) DCGAN — the save_point
# MECHANISM keeps a fast-tier guard (test_save_point_mechanism_exact_tiny)
def test_remat_policy_matches_plain():
    """Selective remat (save_point + save_only_these_names) is a pure
    scheduling decision: forward values AND gradients must match the
    no-remat module exactly."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    plain = dcgan.make_discriminator()
    sel = dcgan.make_discriminator(
        remat=True, remat_policy="disc_c3,disc_c4,unknown_name_is_inert"
    )
    params, _ = plain.init(jax.random.PRNGKey(13), x, data_dependent=False)
    np.testing.assert_allclose(
        np.asarray(sel.apply(params, x)),
        np.asarray(plain.apply(params, x)),
        atol=1e-6,
    )

    def loss(mod):
        return lambda p: jnp.sum(mod.apply(p, x) ** 2)

    g_plain = jax.grad(loss(plain))(params)
    g_sel = jax.grad(loss(sel))(params)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_sel)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # generator side: tagged GLU save points under jit + static batch arg
    gp = dcgan.make_generator()
    gs = dcgan.make_generator(remat=True, remat_policy="gen_g1,gen_g2")
    key = jax.random.PRNGKey(14)
    gparams, _ = gp.init(key, key, 2, data_dependent=False)
    gl_plain = jax.grad(lambda p: jnp.sum(gp.apply(p, key, 2) ** 2))(gparams)
    gl_sel = jax.grad(lambda p: jnp.sum(gs.apply(p, key, 2) ** 2))(gparams)
    for a, b in zip(jax.tree.leaves(gl_plain), jax.tree.leaves(gl_sel)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_bf16_compute_close_to_f32():
    """bfloat16 compute (f32 accumulation) stays close to f32 on the
    L2-normalized critic features; matching math remains f32 regardless."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    d32 = dcgan.make_discriminator(compute_dtype="float32")
    d16 = dcgan.make_discriminator(compute_dtype="bfloat16")
    params, f32 = d32.init(jax.random.PRNGKey(12), x, data_dependent=False)
    f16 = d16.apply(params, x)
    assert f16.dtype == jnp.float32  # accumulation/output stays f32
    cos = float(jnp.sum(f32 * f16, axis=-1).min())
    assert cos > 0.999, f"bf16 features diverged: min cosine {cos}"


def test_save_point_mechanism_exact_tiny():
    """Fast-tier guard for the save_point/remat_policy MECHANISM at a
    width that compiles in seconds: a tiny 3-conv module with tagged
    saves has bit-identical forwards and gradients under no remat, full
    remat, and selective saves (incl. an inert unknown name). The
    full-width DCGAN/DenseNet exactness variants are slow-tier
    (compile-bound on the 1-core CPU host)."""
    from otgan_tpu.nn.layers import Module, conv2d, save_point

    def spec(scope, x):
        x = save_point(
            conv2d(scope, x, 8, stride=(2, 2), pre_activation=None), "t_c1"
        )
        x = save_point(conv2d(scope, x, 8, stride=(2, 2)), "t_c2")
        x = conv2d(scope, x, 4)
        return jnp.sum(x ** 2)

    x = jnp.asarray(
        np.random.default_rng(5).uniform(-1, 1, (2, 16, 16, 3)), jnp.float32
    )
    plain = Module(spec)
    params, _ = plain.init(jax.random.PRNGKey(7), x, data_dependent=False)
    variants = [
        Module(spec, remat=True),
        Module(spec, remat=True, remat_policy="t_c1,unknown_name_is_inert"),
        Module(spec, remat=True, remat_policy="t_c1,t_c2"),
    ]
    f0 = float(plain.apply(params, x))
    g0 = jax.tree.leaves(jax.grad(lambda p: plain.apply(p, x))(params))
    for m in variants:
        assert float(m.apply(params, x)) == f0
        g = jax.tree.leaves(jax.grad(lambda p: m.apply(p, x))(params))
        for a, b in zip(g0, g):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
