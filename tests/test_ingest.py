"""uint8 ingest path: raw bytes cross H2D, the [0,255] -> [-1,1] normalize
is fused into the jitted step (``engine._ingest``, round-4 VERDICT item 1).

Contract: the uint8 path is BIT-IDENTICAL to the float path — u8 -> f32
(exact) -> /127.5 - 1 (f32) -> RNE to the compute dtype is the same math
whether it runs on the host (reference ``train.py:158``; the native LUT in
``runtime/otgan_host.cpp``) or inside the program.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from otgan_tpu.config import TrainConfig
from otgan_tpu.data import native
from otgan_tpu.data.cifar10 import DataLoader
from otgan_tpu.engine import Engine


def _tiny_cfg(**kw):
    base = dict(
        model="densenet",  # real conv family, tiny instantiation
        layers_per_block=2,
        filters_per_layer=8,
        batch_size=16,
        sinkhorn_lambda=50.0,
        nr_sinkhorn_iter=8,
        use_pallas=False,
    )
    base.update(kw)
    return TrainConfig(**base)


def _u8(seed, n=16):
    return np.random.default_rng(seed).integers(
        0, 256, (n, 32, 32, 3)
    ).astype(np.uint8)


def _f32(x_u8):
    return x_u8.astype(np.float32) / 127.5 - 1.0


def test_native_raw_assembly_matches_numpy():
    rng = np.random.default_rng(0)
    data = _u8(1, 32)
    idx = rng.integers(0, 32, 20)
    flips = (rng.random(20) < 0.5).astype(np.uint8)
    got = native.assemble_batch_u8(data, idx, flips, out_dtype="uint8")
    assert got.dtype == np.uint8
    want = data[idx].copy()
    m = flips.astype(bool)
    want[m] = want[m, :, ::-1, :]
    np.testing.assert_array_equal(got, want)


def test_loader_uint8_emission():
    data = _u8(2, 64)
    loader = DataLoader("", batch_size=16, data=data, out_dtype="uint8")
    assert loader.out_dtype == "uint8"
    batch = next(iter(loader))
    assert batch.dtype == np.uint8 and batch.shape == (16, 32, 32, 3)
    init = loader.init_batch(8)
    assert init.dtype == np.uint8
    np.testing.assert_array_equal(init, data[:8])
    # float datasets cannot emit raw uint8: silent f32 fallback
    loader_f = DataLoader(
        "", batch_size=16, data=_f32(data), out_dtype="uint8"
    )
    assert loader_f.out_dtype == "float32"
    assert next(iter(loader_f)).dtype == np.float32


def test_engine_uint8_step_bit_exact():
    """gen + disc steps fed raw uint8 produce bit-identical results to the
    float path (host-normalized f32, the round-3 behavior)."""
    x_init, xa, xb = _u8(3), _u8(4), _u8(5)
    results = []
    for conv in (lambda x: x, _f32):
        eng = Engine(_tiny_cfg())
        state, _ = eng.init_state(0, eng.shard(conv(x_init)))
        state, met_g = eng.gen_step(state, eng.shard(conv(xa)))
        state, met_d = eng.disc_step(state, eng.shard(conv(xb)))
        results.append(
            (
                float(met_g.dist),
                float(met_d.dist),
                float(met_d.entropy),
                jax.tree_util.tree_leaves(state.gen_params),
                jax.tree_util.tree_leaves(state.disc_params),
            )
        )
    (dg0, dd0, e0, gp0, dp0), (dg1, dd1, e1, gp1, dp1) = results
    assert dg0 == dg1 and dd0 == dd1 and e0 == e1
    for a, b in zip(gp0 + dp0, gp1 + dp1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow  # ~113 s cold on the 1-core host (4 engine compiles);
# the fast tier keeps the whole-step bit-exact contract
# (test_engine_uint8_step_bit_exact) + image-shaped accum plumbing
# (test_grad_accum.py::test_accum_tiny_conv_smoke)
def test_engine_uint8_grad_accum_bit_exact():
    """The microbatched phases normalize per microbatch in-scan — still
    bit-identical to the float path."""
    x_init, xa = _u8(6), _u8(7)
    mets = []
    for conv in (lambda x: x, _f32):
        eng = Engine(_tiny_cfg(grad_accum=2))
        state, _ = eng.init_state(0, eng.shard(conv(x_init)))
        state, met_g = eng.gen_step(state, eng.shard(conv(xa)))
        state, met_d = eng.disc_step(state, eng.shard(conv(xa)))
        mets.append((float(met_g.dist), float(met_d.dist)))
    assert mets[0] == mets[1]


def test_engine_uint8_cycle_step():
    """The fused multi-step cycle accepts a uint8 step stack (kept uint8 in
    HBM; each step normalizes its own slice)."""
    eng = Engine(_tiny_cfg(nr_gen_per_disc=1))
    state, _ = eng.init_state(0, eng.shard(_u8(8)))
    xs = np.stack([_u8(9), _u8(10)])
    state, mets = eng.cycle_step(state, eng.shard_steps(xs))
    assert np.all(np.isfinite(np.asarray(mets.dist)))
    assert int(np.asarray(state.step)) == 2


def test_ingest_noop_on_float_and_toy():
    """Float inputs pass through _ingest untouched (the toy pipeline's 2-D
    points must never be rescaled)."""
    eng = Engine(_tiny_cfg())
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 2)), jnp.float32)
    out = eng._ingest(x)
    assert out is x
    u8 = jnp.asarray(_u8(0, 2))
    y = jax.jit(eng._ingest)(u8)
    assert y.dtype == jnp.dtype(eng.cfg.compute_dtype)
    ref = np.asarray(_f32(np.asarray(u8))).astype(y.dtype)
    np.testing.assert_array_equal(np.asarray(y), ref)
