"""Sharded matcher == global matcher (modulo the documented batch-half
permutation), on the 8-virtual-device CPU mesh (SURVEY.md section 4 (d))."""

import numpy as np
import jax
import jax.numpy as jnp

from otgan_tpu.ops.matching import (
    calc_distance,
    match_single_batch,
    match_two_batch,
)
from otgan_tpu.parallel.matching_sharded import (
    make_sharded_single_batch_matcher,
    make_sharded_two_batch_matcher,
    sharded_permutation,
)
from otgan_tpu.parallel.mesh import make_mesh, shard_batch

LAM, ITERS = 50.0, 40


def _features(seed, n, d=32):
    rng = np.random.default_rng(seed)
    f = rng.standard_normal((n, d)).astype(np.float32)
    return f / np.linalg.norm(f, axis=1, keepdims=True)


def test_sharded_matches_global_up_to_permutation():
    B = 128
    mesh = make_mesh(8)
    fa = _features(0, B)
    fb = _features(1, B)

    matcher = make_sharded_two_batch_matcher(mesh, LAM, ITERS)
    got = matcher(shard_batch(mesh, jnp.asarray(fa)), shard_batch(mesh, jnp.asarray(fb)))

    perm = np.asarray(sharded_permutation(B, 8))
    want = match_two_batch(
        jnp.asarray(fa[perm]), jnp.asarray(fb[perm]), LAM, ITERS
    )
    inv = np.empty_like(perm)
    inv[perm] = np.arange(B)

    for g, w in [
        (got.a_a, want.a_a),
        (got.b_b, want.b_b),
        (got.a_b, want.a_b),
        (got.b_a, want.b_a),
    ]:
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w)[inv], atol=2e-4
        )
    np.testing.assert_allclose(
        float(got.entropy), float(want.entropy), atol=1e-4
    )


def test_sharded_distance_matches_global():
    """calc_distance is permutation-invariant -> sharded pipeline must give
    the same reported MED distance as the global one."""
    B = 64
    mesh = make_mesh(8)
    fa = _features(2, B)
    fb = _features(3, B)
    matcher = make_sharded_two_batch_matcher(mesh, LAM, ITERS)
    got = matcher(shard_batch(mesh, jnp.asarray(fa)), shard_batch(mesh, jnp.asarray(fb)))
    d_sharded = calc_distance(jnp.asarray(fa), jnp.asarray(fb), got)

    perm = np.asarray(sharded_permutation(B, 8))
    want = match_two_batch(jnp.asarray(fa[perm]), jnp.asarray(fb[perm]), LAM, ITERS)
    d_global = calc_distance(jnp.asarray(fa[perm]), jnp.asarray(fb[perm]), want)
    np.testing.assert_allclose(float(d_sharded), float(d_global), atol=1e-5)


def test_sharded_batch_divisibility_check():
    mesh = make_mesh(8)
    matcher = make_sharded_two_batch_matcher(mesh, LAM, 5)
    f = jnp.asarray(_features(4, 24))  # 24 not divisible by 16
    try:
        matcher(f, f)
        assert False
    except ValueError as e:
        assert "divisible" in str(e)


def test_sharded_gradient_path():
    """jax.grad flows through the raw features (Sinkhorn detached), matching
    the global matcher's gradient semantics."""
    from otgan_tpu.ops.losses import med_generator_loss

    B = 64
    mesh = make_mesh(8)
    fa = jnp.asarray(_features(5, B))
    fb = jnp.asarray(_features(6, B))
    matcher = make_sharded_two_batch_matcher(mesh, LAM, 20)

    def loss_sharded(w):
        f = fa * w
        m = matcher(f, fb)
        return med_generator_loss(f, m)

    perm = np.asarray(sharded_permutation(B, 8))
    fa_p, fb_p = jnp.asarray(np.asarray(fa)[perm]), jnp.asarray(np.asarray(fb)[perm])

    def loss_global(w):
        f = fa_p * w
        m = match_two_batch(f, fb_p, LAM, 20)
        return med_generator_loss(f, m)

    g_s = jax.grad(loss_sharded)(jnp.ones(()))
    g_g = jax.grad(loss_global)(jnp.ones(()))
    np.testing.assert_allclose(float(g_s), float(g_g), rtol=1e-4)


def test_engine_sharded_vs_global_matching_close_distance():
    """Engine-level wiring guard: the sharded matcher and the GSPMD global
    matcher use different (statistically equivalent) batch-half splits, so
    the reported MED estimates differ slightly (~1-2% at B=64) but must be
    close — a gross mismatch means the dispatch is wired wrong. Exact
    equivalence modulo the split permutation is proven at matcher level in
    test_sharded_matches_global_up_to_permutation."""
    from otgan_tpu.config import TrainConfig
    from otgan_tpu.engine import Engine

    kw = dict(
        model="toy_mlp",
        batch_size=64,
        sinkhorn_lambda=50.0,
        nr_sinkhorn_iter=20,
        use_pallas=False,
    )
    eng_s = Engine(TrainConfig(sharded_matching=True, **kw))
    eng_g = Engine(TrainConfig(sharded_matching=False, **kw))
    x0 = _features(20, 64, 2)  # 2-D toy points
    import jax.numpy as jnp

    state_s, _ = eng_s.init_state(0, eng_s.shard(jnp.asarray(x0)))
    state_g, _ = eng_g.init_state(0, eng_g.shard(jnp.asarray(x0)))
    x1 = jnp.asarray(_features(21, 64, 2))
    state_s, met_s = eng_s.gen_step(state_s, eng_s.shard(x1))
    state_g, met_g = eng_g.gen_step(state_g, eng_g.shard(x1))
    np.testing.assert_allclose(
        float(met_s.dist), float(met_g.dist), rtol=0.1
    )
    np.testing.assert_allclose(
        float(met_s.entropy), float(met_g.entropy), rtol=0.1
    )


def test_sharded_single_batch_matches_global_exactly():
    """No batch halving in single-batch mode -> the sharded matcher must
    reproduce the global ``match_single_batch`` row-for-row (no
    permutation), including the +999 self-match diagonals."""
    B = 64
    mesh = make_mesh(8)
    fa, fb = _features(7, B), _features(8, B)
    matcher = make_sharded_single_batch_matcher(mesh, LAM, ITERS)
    got = matcher(
        shard_batch(mesh, jnp.asarray(fa)), shard_batch(mesh, jnp.asarray(fb))
    )
    want = match_single_batch(jnp.asarray(fa), jnp.asarray(fb), LAM, ITERS)
    for g, w in [
        (got.a_a, want.a_a),
        (got.b_b, want.b_b),
        (got.a_b, want.a_b),
        (got.b_a, want.b_a),
    ]:
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-4)
    np.testing.assert_allclose(
        float(got.entropy), float(want.entropy), atol=1e-4
    )


def test_sharded_single_batch_divisibility_check():
    mesh = make_mesh(8)
    matcher = make_sharded_single_batch_matcher(mesh, LAM, 5)
    f = jnp.asarray(_features(9, 60))  # 60 not divisible by 8
    try:
        matcher(f, f)
        assert False
    except ValueError as e:
        assert "divisible" in str(e)


def test_sharded_tol_early_exit_matches_fixed_loop():
    """tol > 0 runs a collective while_loop; at a tight tolerance the
    assignment must agree with the fixed-count loop."""
    B = 64
    mesh = make_mesh(8)
    fa, fb = _features(10, B), _features(11, B)
    exact = make_sharded_two_batch_matcher(mesh, LAM, 200)
    tol = make_sharded_two_batch_matcher(mesh, LAM, 200, tol=1e-6)
    fa_s = shard_batch(mesh, jnp.asarray(fa))
    fb_s = shard_batch(mesh, jnp.asarray(fb))
    got_e, got_t = exact(fa_s, fb_s), tol(fa_s, fb_s)
    for g, w in zip(got_t[:4], got_e[:4]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-4)


def test_sharded_pallas_local_step_matches_xla():
    """The fused Pallas local-iteration kernel (interpret mode on CPU) must
    reproduce the XLA lowering bit-closely, two-batch and single-batch.

    B=256 so both gathered widths are lane-aligned (two-batch N=128,
    single-batch N=256) — smaller widths would silently fall back to XLA."""
    B = 256
    mesh = make_mesh(8)
    fa, fb = _features(12, B), _features(13, B)
    fa_s = shard_batch(mesh, jnp.asarray(fa))
    fb_s = shard_batch(mesh, jnp.asarray(fb))
    for make in (
        make_sharded_two_batch_matcher,
        make_sharded_single_batch_matcher,
    ):
        ref = make(mesh, LAM, ITERS)(fa_s, fb_s)
        got = make(mesh, LAM, ITERS, use_pallas=True)(fa_s, fb_s)
        for g, w in zip(got[:4], ref[:4]):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-5)
        np.testing.assert_allclose(
            float(got.entropy), float(ref.entropy), atol=1e-5
        )


def test_sharded_pallas_misaligned_pads_onto_grid():
    """Tile-misaligned local blocks must now run through the PAD-AWARE
    fused kernel (not silently fall back to XLA) and still match the XLA
    lowering exactly. B=176 on 8 devices: two-batch rows n_loc=11 (not a
    multiple of 8) and width N=88 (not a multiple of 128); single-batch
    n_loc=22 / N=176 — both misaligned on both axes."""
    B = 176
    mesh = make_mesh(8)
    fa, fb = _features(16, B), _features(17, B)
    fa_s = shard_batch(mesh, jnp.asarray(fa))
    fb_s = shard_batch(mesh, jnp.asarray(fb))
    for make in (
        make_sharded_two_batch_matcher,
        make_sharded_single_batch_matcher,
    ):
        ref = make(mesh, LAM, ITERS)(fa_s, fb_s)
        got = make(mesh, LAM, ITERS, use_pallas=True)(fa_s, fb_s)
        for g, w in zip(got[:4], ref[:4]):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-5)
        np.testing.assert_allclose(
            float(got.entropy), float(ref.entropy), atol=1e-5
        )
    # the early-exit while_loop must not see the padded columns' pinned
    # values as movement (nor NaNs from the masked combine)
    tol = make_sharded_two_batch_matcher(
        mesh, LAM, 500, tol=1e-4, use_pallas=True
    )(fa_s, fb_s)
    exact = make_sharded_two_batch_matcher(mesh, LAM, 500)(fa_s, fb_s)
    for g, w in zip(tol[:4], exact[:4]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-4)


def test_fused_local_step_pad_mask_unit():
    """Unit parity of the in-kernel masking: a zero-padded block with
    n_rows/n_cols set must reproduce the XLA step on the unpadded block
    (valid columns), and emit empty partials (m=-1e30, s=0) on padding."""
    from otgan_tpu.ops.sinkhorn_pallas_step import (
        fused_local_sinkhorn_step,
        pad_to_grid,
    )
    from otgan_tpu.parallel.matching_sharded import _local_step_xla

    rng = np.random.default_rng(5)
    n_loc, n = 11, 88
    x = jnp.asarray(rng.uniform(-50, 0, (2, n_loc, n)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-5, 5, (2, 1, n)).astype(np.float32))
    n_loc_pad, n_pad = pad_to_grid(n_loc, n)
    assert (n_loc_pad, n_pad) == (16, 128)
    x_pad = jnp.pad(x, ((0, 0), (0, n_loc_pad - n_loc), (0, n_pad - n)))
    v_pad = jnp.pad(v, ((0, 0), (0, 0), (0, n_pad - n)))
    m_k, s_k = fused_local_sinkhorn_step(
        x_pad, v_pad, interpret=True, n_rows=n_loc, n_cols=n
    )
    m_x, s_x = _local_step_xla(x, v)
    np.testing.assert_allclose(np.asarray(m_k[..., :n]), np.asarray(m_x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_k[..., :n]), np.asarray(s_x), rtol=1e-5)
    assert float(jnp.max(m_k[..., n:])) <= -1e29
    np.testing.assert_allclose(np.asarray(s_k[..., n:]), 0.0, atol=0)


def test_fused_local_step_unit():
    """Unit parity: fused_local_sinkhorn_step (interpret) vs the plain XLA
    local step on random logits."""
    from otgan_tpu.ops.sinkhorn_pallas_step import fused_local_sinkhorn_step
    from otgan_tpu.parallel.matching_sharded import _local_step_xla

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-50, 0, (3, 16, 128)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-5, 5, (3, 1, 128)).astype(np.float32))
    m_k, s_k = fused_local_sinkhorn_step(x, v, interpret=True)
    m_x, s_x = _local_step_xla(x, v)
    np.testing.assert_allclose(np.asarray(m_k), np.asarray(m_x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_x), rtol=1e-5)


def test_sharded_single_batch_gradient_path():
    """Gradient parity for the sharded single-batch matcher (the two-batch
    version is covered above): jax.grad flows through raw features only."""
    from otgan_tpu.ops.losses import med_generator_loss

    B = 64
    mesh = make_mesh(8)
    fa = jnp.asarray(_features(14, B))
    fb = jnp.asarray(_features(15, B))
    matcher = make_sharded_single_batch_matcher(mesh, LAM, 20)

    def loss_sharded(w):
        f = fa * w
        m = matcher(f, fb)
        return med_generator_loss(f, m)

    def loss_global(w):
        f = fa * w
        m = match_single_batch(f, fb, LAM, 20)
        return med_generator_loss(f, m)

    g_s = jax.grad(loss_sharded)(jnp.ones(()))
    g_g = jax.grad(loss_global)(jnp.ones(()))
    np.testing.assert_allclose(float(g_s), float(g_g), rtol=1e-4)
