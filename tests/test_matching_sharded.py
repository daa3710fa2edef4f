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


def test_sharded_two_batch_odd_batch_raises():
    mesh = make_mesh(8)
    matcher = make_sharded_two_batch_matcher(mesh, LAM, 5)
    f = jnp.asarray(_features(4, 23))  # odd: halves undefined
    try:
        matcher(f, f)
        assert False
    except ValueError as e:
        assert "even" in str(e)


def test_sharded_two_batch_uneven_matches_global_exactly():
    """The padded-halves path (VERDICT r2 Missing #2): a global batch whose
    half does NOT divide the mesh (B=120 -> half 60, 60 % 8 = 4) must run
    row-sharded and reproduce the global matcher EXACTLY, in global row
    order (no permutation) — the construction the reference's own
    batch-5000-on-8 default (train.py:16,23) rides."""
    B = 120
    mesh = make_mesh(8)
    fa, fb = _features(30, B), _features(31, B)
    matcher = make_sharded_two_batch_matcher(mesh, LAM, ITERS)
    got = matcher(
        shard_batch(mesh, jnp.asarray(fa)), shard_batch(mesh, jnp.asarray(fb))
    )
    want = match_two_batch(jnp.asarray(fa), jnp.asarray(fb), LAM, ITERS)
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


def test_sharded_single_batch_uneven_matches_global_exactly():
    """Tail-padded single-batch path: B=60 on 8 devices (60 % 8 = 4)."""
    from otgan_tpu.ops.matching import match_single_batch as msb

    B = 60
    mesh = make_mesh(8)
    fa, fb = _features(32, B), _features(33, B)
    matcher = make_sharded_single_batch_matcher(mesh, LAM, ITERS)
    got = matcher(jnp.asarray(fa), jnp.asarray(fb))
    want = msb(jnp.asarray(fa), jnp.asarray(fb), LAM, ITERS)
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


def test_sharded_uneven_pallas_and_tol():
    """Padded-halves path composed with (a) the fused Pallas local step and
    (b) the collective tol early exit — both must agree with the global
    matcher on the uneven batch."""
    B = 120
    mesh = make_mesh(8)
    fa, fb = _features(34, B), _features(35, B)
    fa_j, fb_j = jnp.asarray(fa), jnp.asarray(fb)
    want = match_two_batch(fa_j, fb_j, LAM, ITERS)
    for kw in ({"use_pallas": True}, {"tol": 1e-6}):
        got = make_sharded_two_batch_matcher(mesh, LAM, ITERS, **kw)(
            fa_j, fb_j
        )
        for g, w in zip(got[:4], want[:4]):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=2e-4
            )
        np.testing.assert_allclose(
            float(got.entropy), float(want.entropy), atol=1e-4
        )


def test_sharded_uneven_gradient_path():
    """jax.grad flows through raw features on the padded-halves path with
    the same semantics as the global matcher (Sinkhorn detached; pad rows
    contribute zero gradient)."""
    from otgan_tpu.ops.losses import med_generator_loss

    B = 120
    mesh = make_mesh(8)
    fa = jnp.asarray(_features(36, B))
    fb = jnp.asarray(_features(37, B))
    matcher = make_sharded_two_batch_matcher(mesh, LAM, 20)

    def loss_sharded(w):
        f = fa * w
        m = matcher(f, fb)
        return med_generator_loss(f, m)

    def loss_global(w):
        f = fa * w
        m = match_two_batch(f, fb, LAM, 20)
        return med_generator_loss(f, m)

    g_s = jax.grad(loss_sharded)(jnp.ones(()))
    g_g = jax.grad(loss_global)(jnp.ones(()))
    np.testing.assert_allclose(float(g_s), float(g_g), rtol=1e-4)


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


def test_streaming_local_step_unit():
    """Unit parity of the streaming (panelled, online column-LSE) local step
    against the plain XLA local step, including row/column grid padding."""
    from otgan_tpu.ops.sinkhorn_pallas_step import (
        pad_to_stream_grid,
        streaming_local_sinkhorn_step,
    )
    from otgan_tpu.parallel.matching_sharded import _local_step_xla

    rng = np.random.default_rng(7)
    n_loc, n, panel = 21, 200, 8
    x = jnp.asarray(rng.uniform(-50, 0, (3, n_loc, n)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-5, 5, (3, 1, n)).astype(np.float32))
    n_loc_pad, n_pad = pad_to_stream_grid(n_loc, n, panel)
    assert (n_loc_pad, n_pad) == (24, 256)
    x_pad = jnp.pad(x, ((0, 0), (0, n_loc_pad - n_loc), (0, n_pad - n)))
    v_pad = jnp.pad(v, ((0, 0), (0, 0), (0, n_pad - n)))
    m_k, s_k = streaming_local_sinkhorn_step(
        x_pad, v_pad, panel=panel, interpret=True, n_rows=n_loc, n_cols=n
    )
    m_x, s_x = _local_step_xla(x, v)
    np.testing.assert_allclose(
        np.asarray(m_k[..., :n]), np.asarray(m_x), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(s_k[..., :n]), np.asarray(s_x), rtol=1e-5
    )
    assert float(jnp.max(m_k[..., n:])) <= -1e29
    np.testing.assert_allclose(np.asarray(s_k[..., n:]), 0.0, atol=0)


def test_sharded_streaming_tier_matches_xla(monkeypatch):
    """Force the streaming tier by shrinking the fused-kernel VMEM ceiling:
    the sharded matcher must dispatch to the panelled streaming step and
    still match the XLA lowering exactly (two-batch and single-batch)."""
    from otgan_tpu.ops import sinkhorn_pallas_step as step_mod

    monkeypatch.setattr(step_mod, "_MAX_CELLS", 256)
    monkeypatch.setattr(step_mod, "_PANELS", (8,))  # force multi-panel
    B = 256  # two-batch: n_loc=16, N=128 -> 2048 cells > 256 -> stream
    assert step_mod.local_step_mode(16, 128) == "stream"
    assert step_mod.streaming_panel(16, 128) == 8
    mesh = make_mesh(8)
    fa, fb = _features(38, B), _features(39, B)
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


def test_sharded_reference_batch_5000_exact():
    """The reference's own train.py default: global batch 5000 on 8 devices
    (625 x 8, /root/reference/train.py:16,23). 2500 % 8 != 0, so this rides
    the padded-halves path (n_loc=313, +4 pad rows per half) and must equal
    the global matcher exactly (VERDICT r2 Missing #2 'done' criterion).
    Small d and 2 iterations keep the CPU-mesh run fast; the construction is
    iteration-count-independent."""
    B, d, iters = 5000, 8, 2
    mesh = make_mesh(8)
    fa, fb = _features(40, B, d), _features(41, B, d)
    fa_j, fb_j = jnp.asarray(fa), jnp.asarray(fb)
    got = make_sharded_two_batch_matcher(mesh, LAM, iters)(
        shard_batch(mesh, fa_j), shard_batch(mesh, fb_j)
    )
    want = match_two_batch(fa_j, fb_j, LAM, iters)
    for g, w in zip(got[:4], want[:4]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-4)
    np.testing.assert_allclose(
        float(got.entropy), float(want.entropy), atol=1e-4
    )


def test_sharded_reference_batch_8000_streaming_exact():
    """The paper's batch-8000 config (train_with_model_saving.py:16,23) on 8
    devices: per-chip two-batch row blocks are 500 x 4000 = 2M cells, beyond
    the fused step's VMEM ceiling — this must dispatch to the STREAMING tier
    (VERDICT r2 Missing #3) and still match the global matcher exactly.
    interpret-mode Pallas on the CPU mesh; d=8, 2 iterations."""
    from otgan_tpu.ops.sinkhorn_pallas_step import (
        local_step_mode,
        streaming_panel,
    )

    assert local_step_mode(500, 4000) == "stream"
    assert streaming_panel(500, 4000) == 256  # 256 x 4096 <= panel budget

    B, d, iters = 8000, 8, 2
    mesh = make_mesh(8)
    fa, fb = _features(42, B, d), _features(43, B, d)
    fa_j, fb_j = jnp.asarray(fa), jnp.asarray(fb)
    got = make_sharded_two_batch_matcher(mesh, LAM, iters, use_pallas=True)(
        shard_batch(mesh, fa_j), shard_batch(mesh, fb_j)
    )
    want = match_two_batch(fa_j, fb_j, LAM, iters)
    perm = np.asarray(sharded_permutation(B, 8))
    want_p = match_two_batch(fa_j[perm], fb_j[perm], LAM, iters)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(B)
    for g, w in zip(got[:4], want_p[:4]):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w)[inv], atol=2e-4
        )
    np.testing.assert_allclose(
        float(got.entropy), float(want_p.entropy), atol=1e-4
    )


def test_sharded_matcher_never_materializes_full_matrices():
    """Compiled-HLO guard: the row-sharded matcher must keep every device's
    cost/assignment buffers at the LOCAL row-block shape (6, n_loc, N) —
    a full (6, N, N) allocation anywhere means a regression gathered the
    matrices back onto one device (the reference's whole-matrix
    round-robin layout, utils/matching.py:49, that this component exists
    to avoid). B=128 on 8 devices: local blocks f32[6,8,64]."""
    mesh = make_mesh(8)
    matcher = make_sharded_two_batch_matcher(mesh, LAM, 5)
    f = jnp.asarray(_features(50, 128))
    txt = matcher.lower(f, f).compile().as_text()
    assert "f32[6,8,64]" in txt  # the sharded row blocks exist
    assert "f32[6,64,64]" not in txt  # no device holds full matrices
