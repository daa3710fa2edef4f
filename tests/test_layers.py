"""Layer library unit tests: weight norm, data-dependent init,
pre-activations, list convs, upsample (reference utils/nn.py behavior)."""

import numpy as np
import jax
import jax.numpy as jnp

from otgan_tpu.nn.layers import (
    Module,
    apply_pre_activation,
    conv2d,
    dense,
    glu,
    global_avg_pool,
    l2_normalize_rows,
    nn_upsample,
)


def test_pre_activation_variants():
    x = jnp.asarray([[1.0, -2.0]])
    # crelu: concat [x, -x] then relu
    out = apply_pre_activation(x, "crelu", axis=-1)
    np.testing.assert_allclose(np.asarray(out), [[1.0, 0.0, 0.0, 2.0]])
    # celu: concat [x, -x] then elu
    out = apply_pre_activation(x, "celu", axis=-1)
    want = np.array([[1.0, np.expm1(-2.0), np.expm1(-1.0), 2.0]])
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)
    # list input: interleave [x1, -x1, x2, -x2] (utils/nn.py:198-200)
    x2 = jnp.asarray([[3.0, -4.0]])
    out = apply_pre_activation([x, x2], "crelu", axis=-1)
    np.testing.assert_allclose(
        np.asarray(out), [[1.0, 0.0, 0.0, 2.0, 3.0, 0.0, 0.0, 4.0]]
    )
    # None with list = plain concat
    out = apply_pre_activation([x, x2], None, axis=-1)
    np.testing.assert_allclose(np.asarray(out), [[1.0, -2.0, 3.0, -4.0]])


def test_glu():
    x = jnp.asarray([[1.0, 2.0, 0.0, 100.0]])
    out = glu(x, axis=-1)
    want = np.array([[1.0 * 0.5, 2.0 * 1.0]])
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)


def test_nn_upsample_matches_resize():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
    got = nn_upsample(x)
    want = jax.image.resize(x, (2, 8, 8, 3), method="nearest")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)


def test_dense_data_dependent_init_normalizes():
    """Post-init activations: per-unit mean ~0, std ~init_scale
    (the reference's intended init, utils/nn.py:108-162)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(5.0 + 3.0 * rng.standard_normal((256, 20)).astype(np.float32))
    mod = Module(lambda s, x: dense(s, x, 32, pre_activation=None, init_scale=0.7))
    params, out = mod.init(jax.random.PRNGKey(0), x)
    out = np.asarray(out)
    np.testing.assert_allclose(out.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(out.std(0), 0.7, atol=1e-2)
    # init output == apply output on the same batch
    out2 = np.asarray(mod.apply(params, x))
    np.testing.assert_allclose(out, out2, atol=1e-4)


def test_conv_data_dependent_init_and_apply_consistency():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((8, 16, 16, 6)).astype(np.float32))
    mod = Module(
        lambda s, x: conv2d(
            s, x, 12, filter_size=(3, 3), stride=(2, 2), pre_activation="crelu"
        )
    )
    params, out = mod.init(jax.random.PRNGKey(1), x)
    out = np.asarray(out)
    assert out.shape == (8, 8, 8, 12)
    np.testing.assert_allclose(out.reshape(-1, 12).mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(out.reshape(-1, 12).std(0), 1.0, atol=1e-2)
    out2 = np.asarray(mod.apply(params, x))
    np.testing.assert_allclose(out, out2, atol=1e-4)


def test_weight_norm_direction_unit_norm():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((64, 10)).astype(np.float32))
    mod = Module(lambda s, x: dense(s, x, 4, pre_activation=None))
    params, _ = mod.init(jax.random.PRNGKey(2), x)
    p = params["dense_0"]
    # effective W = g * V/||V|| => columns of V/||V|| have unit norm
    v = np.asarray(p["V"])
    norms = np.linalg.norm(v, axis=0)
    w_dir = v / norms
    np.testing.assert_allclose(np.linalg.norm(w_dir, axis=0), 1.0, atol=1e-6)
    assert "g" in p and "b" in p


def test_list_conv_equals_manual_concat():
    """List input == pre-activate each element, concat, single conv
    (utils/nn.py:234-241)."""
    rng = np.random.default_rng(4)
    x1 = jnp.asarray(rng.standard_normal((4, 8, 8, 3)).astype(np.float32))
    x2 = jnp.asarray(rng.standard_normal((4, 8, 8, 5)).astype(np.float32))
    mod = Module(
        lambda s, xs: conv2d(s, xs, 7, pre_activation="crelu")
    )
    params, out = mod.init(jax.random.PRNGKey(3), [x1, x2])

    manual_in = apply_pre_activation([x1, x2], "crelu", axis=-1)
    mod2 = Module(lambda s, x: conv2d(s, x, 7, pre_activation=None))
    out2 = mod2.apply({"conv2d_0": params["conv2d_0"]}, manual_in)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_upsample_conv_shape_and_consistency():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 8)).astype(np.float32))
    mod = Module(
        lambda s, x: conv2d(
            s, x, 6, filter_size=(5, 5), pre_activation=None, upsample=True
        )
    )
    params, out = mod.init(jax.random.PRNGKey(4), x)
    assert out.shape == (2, 8, 8, 6)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(mod.apply(params, x)), atol=1e-4
    )


def test_dilated_conv_runs():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    mod = Module(
        lambda s, x: conv2d(s, x, 4, dilate=2, pre_activation="elu")
    )
    _, out = mod.init(jax.random.PRNGKey(5), x)
    assert out.shape == (2, 8, 8, 4)


def test_global_avg_pool():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
    out = global_avg_pool(x, pre_activation="crelu")
    assert out.shape == (2, 6)
    want = np.mean(
        np.asarray(apply_pre_activation(x, "crelu", axis=-1)), axis=(1, 2)
    )
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)


def test_l2_normalize_rows():
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((5, 9)).astype(np.float32))
    out = np.asarray(l2_normalize_rows(x))
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-6)


def test_name_counters():
    def spec(s, x):
        x = dense(s, x, 4, pre_activation=None)
        x = dense(s, x, 4, pre_activation="relu")
        return x

    mod = Module(spec)
    params, _ = mod.init(
        jax.random.PRNGKey(6), jnp.ones((4, 3), jnp.float32)
    )
    assert set(params) == {"dense_0", "dense_1"}
