"""Matrix-parallel matcher == global matcher, EXACTLY (no permutation),
on the 8/4/2-virtual-device CPU mesh.

The matrix-parallel layout (`parallel/matching_matrix.py`) shards whole
Sinkhorn instances across chips — the reference's own round-robin
placement (``utils/matching.py:49``) — instead of sharding matrix rows.
Because halves are sliced from the GATHERED features, outputs must be
row-for-row identical to ``ops.matching.match_two_batch`` /
``match_single_batch`` for ANY even global batch, divisible by the mesh
or not."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from otgan_tpu.ops.matching import (
    calc_distance,
    match_single_batch,
    match_two_batch,
)
from otgan_tpu.parallel.matching_matrix import (
    _owner_counts,
    make_matrix_parallel_single_batch_matcher,
    make_matrix_parallel_two_batch_matcher,
)
from otgan_tpu.parallel.mesh import make_mesh, shard_batch

LAM, ITERS = 50.0, 40


def _features(seed, n, d=32):
    rng = np.random.default_rng(seed)
    f = rng.standard_normal((n, d)).astype(np.float32)
    return f / np.linalg.norm(f, axis=1, keepdims=True)


def _assert_matched_equal(got, want, atol=2e-5):
    for g, w in [
        (got.a_a, want.a_a),
        (got.b_b, want.b_b),
        (got.a_b, want.a_b),
        (got.b_a, want.b_a),
    ]:
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=atol)
    np.testing.assert_allclose(
        float(got.entropy), float(want.entropy), atol=1e-5
    )


def test_owner_counts_cover_every_matrix():
    """Every matrix gets >=1 owner slot and the 1/count weights cancel
    duplicates exactly, for every (n_mats, n_dev) regime: more devices
    than matrices (dup owners), fewer (multiple rounds), equal."""
    for n_mats in (3, 6):
        for n_dev in (1, 2, 3, 4, 5, 6, 8, 16):
            rounds, counts = _owner_counts(n_mats, n_dev)
            assert len(counts) == n_mats
            assert all(c >= 1 for c in counts)
            # recount by enumerating the actual (idx, r) assignment
            seen = [0] * n_mats
            for idx in range(n_dev):
                for r in range(rounds):
                    seen[(idx + r * n_dev) % n_mats] += 1
            assert seen == counts, (n_mats, n_dev, seen, counts)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_matrix_parallel_two_batch_exact(n_dev):
    """Divisible batch: n_dev=8 exercises duplicate owners (8 slots over 6
    matrices), n_dev=4/2 exercise 2 and 3 rounds per chip."""
    B = 64
    mesh = make_mesh(n_dev)
    fa, fb = _features(0, B), _features(1, B)
    matcher = make_matrix_parallel_two_batch_matcher(mesh, LAM, ITERS)
    got = matcher(
        shard_batch(mesh, jnp.asarray(fa)), shard_batch(mesh, jnp.asarray(fb))
    )
    want = match_two_batch(jnp.asarray(fa), jnp.asarray(fb), LAM, ITERS)
    _assert_matched_equal(got, want)


def test_matrix_parallel_two_batch_indivisible_batch():
    """B=50 on 8 devices (the reference's own 5000-on-8 shape class scaled
    down, train.py:16,23): only the in/out sharding is tail-padded, the
    matching math sees exactly the global batch."""
    B = 50
    mesh = make_mesh(8)
    fa, fb = _features(2, B), _features(3, B)
    matcher = make_matrix_parallel_two_batch_matcher(mesh, LAM, ITERS)
    got = matcher(jnp.asarray(fa), jnp.asarray(fb))
    want = match_two_batch(jnp.asarray(fa), jnp.asarray(fb), LAM, ITERS)
    _assert_matched_equal(got, want)


def test_matrix_parallel_two_batch_odd_batch_raises():
    mesh = make_mesh(8)
    matcher = make_matrix_parallel_two_batch_matcher(mesh, LAM, 5)
    f = jnp.asarray(_features(4, 23))
    with pytest.raises(ValueError, match="even global batch"):
        matcher(f, f)


@pytest.mark.parametrize("B", [64, 50])
def test_matrix_parallel_single_batch_exact(B):
    """3 matrices (a.a/b.b with the +999 self-match diagonal, a.b) over 8
    chips; both divisible and tail-padded batches."""
    mesh = make_mesh(8)
    fa, fb = _features(5, B), _features(6, B)
    matcher = make_matrix_parallel_single_batch_matcher(mesh, LAM, ITERS)
    got = matcher(jnp.asarray(fa), jnp.asarray(fb))
    want = match_single_batch(jnp.asarray(fa), jnp.asarray(fb), LAM, ITERS)
    _assert_matched_equal(got, want)


def test_matrix_parallel_distance_matches_global():
    B = 64
    mesh = make_mesh(8)
    fa, fb = _features(7, B), _features(8, B)
    matcher = make_matrix_parallel_two_batch_matcher(mesh, LAM, ITERS)
    got = matcher(jnp.asarray(fa), jnp.asarray(fb))
    want = match_two_batch(jnp.asarray(fa), jnp.asarray(fb), LAM, ITERS)
    d_mp = calc_distance(jnp.asarray(fa), jnp.asarray(fb), got)
    d_gl = calc_distance(jnp.asarray(fa), jnp.asarray(fb), want)
    np.testing.assert_allclose(float(d_mp), float(d_gl), atol=1e-6)


def test_matrix_parallel_tol_early_exit_matches_global():
    """tol runs chip-locally (each chip owns whole matrices, so no
    collective while_loop is needed) and must still agree with the global
    matcher at the same tol."""
    B = 64
    mesh = make_mesh(8)
    fa, fb = _features(9, B), _features(10, B)
    matcher = make_matrix_parallel_two_batch_matcher(
        mesh, LAM, 200, tol=1e-5
    )
    got = matcher(jnp.asarray(fa), jnp.asarray(fb))
    want = match_two_batch(jnp.asarray(fa), jnp.asarray(fb), LAM, 200, tol=1e-5)
    _assert_matched_equal(got, want, atol=2e-4)


def test_matrix_parallel_gradient_path():
    """jax.grad flows through the raw features exactly as the global
    matcher's (Sinkhorn detached; matched outputs under stop_gradient)."""
    from otgan_tpu.ops.losses import med_generator_loss

    B = 64
    mesh = make_mesh(8)
    fa = jnp.asarray(_features(11, B))
    fb = jnp.asarray(_features(12, B))
    matcher = make_matrix_parallel_two_batch_matcher(mesh, LAM, 20)

    def loss_mp(w):
        f = fa * w
        return med_generator_loss(f, matcher(f, fb))

    def loss_global(w):
        f = fa * w
        return med_generator_loss(f, match_two_batch(f, fb, LAM, 20))

    g_mp = jax.grad(loss_mp)(jnp.ones(()))
    g_gl = jax.grad(loss_global)(jnp.ones(()))
    np.testing.assert_allclose(float(g_mp), float(g_gl), rtol=1e-5)


def test_engine_matrix_layout_dispatch_and_distance():
    """--matching_layout matrices: the engine builds the matrix-parallel
    matcher, records it in matcher_desc, and a jitted gen step produces
    the same distance as the global GSPMD layout."""
    import dataclasses

    from otgan_tpu.config import TrainConfig
    from otgan_tpu.engine import Engine

    n_dev = 8
    cfg = TrainConfig(
        model="toy_mlp",
        batch_size=4 * n_dev,
        sinkhorn_lambda=50.0,
        nr_sinkhorn_iter=20,
        num_devices=n_dev,
        use_pallas=False,
        matching_layout="matrices",
    )
    mesh = make_mesh(n_dev)
    eng = Engine(cfg, mesh=mesh)
    assert "matrix-parallel" in eng.matcher_desc, eng.matcher_desc

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((cfg.batch_size, 2)),
        jnp.float32,
    )
    state, _ = eng.init_state(0, eng.shard(x))
    state, met = eng.gen_step(state, eng.shard(x))
    assert np.isfinite(float(met.dist))

    cfg_g = dataclasses.replace(cfg, sharded_matching=False)
    eng_g = Engine(cfg_g, mesh=mesh)
    state_g, _ = eng_g.init_state(0, eng_g.shard(x))
    state_g, met_g = eng_g.gen_step(state_g, eng_g.shard(x))
    np.testing.assert_allclose(
        float(met.dist), float(met_g.dist), atol=1e-5
    )


def test_matrix_parallel_collective_budget():
    """Compiled-HLO guard for the layout's selling point: ZERO collectives
    inside the Sinkhorn loop — the whole program carries only the 2 feature
    all-gathers + the output/entropy psums (module docstring), so the
    collective op count must be tiny and independent of n_iters (the
    row-sharded layout runs 2 collectives per iteration inside its loop
    body)."""
    import re

    mesh = make_mesh(8)
    f = jnp.asarray(_features(13, 64))

    def count_collectives(n_iters):
        m = make_matrix_parallel_two_batch_matcher(mesh, LAM, n_iters)
        txt = m.lower(f, f).compile().as_text()
        return (
            len(
                re.findall(
                    r"\b(all-reduce|all-gather|collective-permute"
                    r"|reduce-scatter)\b",
                    txt,
                )
            ),
            "reduce-scatter" in txt,
        )

    (c5, rs5), (c50, _) = count_collectives(5), count_collectives(50)
    assert c5 == c50, (c5, c50)
    assert c5 <= 6, f"expected <=6 collective ops, compiled {c5}"
    # the (4, B, d) output reduction must be a reduce-scatter (each chip
    # keeps only its block), not an all-reduce of the full tensor
    assert rs5, "expected the output psum_scatter to compile to reduce-scatter"


def test_engine_unknown_layout_raises():
    from otgan_tpu.config import TrainConfig
    from otgan_tpu.engine import Engine

    cfg = TrainConfig(
        model="toy_mlp", batch_size=16, num_devices=8,
        matching_layout="diagonal",
    )
    with pytest.raises(ValueError, match="matching_layout"):
        Engine(cfg, mesh=make_mesh(8))
