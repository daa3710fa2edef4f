"""Engine integration tests on the 8-virtual-device CPU mesh: SPMD steps,
matching-mode dispatch, exact resume (SURVEY.md section 4 item (d))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from otgan_tpu.config import TrainConfig
from otgan_tpu.data.toy import sample_8gaussians
from otgan_tpu.engine import Engine
from otgan_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint


def _toy_cfg(**kw):
    base = dict(
        model="toy_mlp",
        batch_size=64,
        sinkhorn_lambda=50.0,
        nr_sinkhorn_iter=8,
        learning_rate_gen=1e-4,
        learning_rate_disc=2e-5,
        use_pallas=False,
    )
    base.update(kw)
    return TrainConfig(**base)


def _data(seed, n=64):
    return jnp.asarray(sample_8gaussians(np.random.default_rng(seed), n))


def test_engine_steps_run_and_are_finite():
    eng = Engine(_toy_cfg())
    assert len(eng.mesh.devices.flat) == 8
    state, nf = eng.init_state(0, eng.shard(_data(0)))
    assert nf == 16
    state, met = eng.gen_step(state, eng.shard(_data(1)))
    assert np.isfinite(float(met.dist)) and np.isfinite(float(met.entropy))
    state, met2 = eng.disc_step(state, eng.shard(_data(2)))
    assert np.isfinite(float(met2.dist))
    assert int(np.asarray(state.step)) == 2


def test_matching_mode_dispatch():
    for kw, expect_entropy_zero in [
        (dict(no_sinkhorn=True), True),
        (dict(single_batch=True), False),
        (dict(), False),
    ]:
        eng = Engine(_toy_cfg(**kw))
        state, _ = eng.init_state(0, eng.shard(_data(0)))
        state, met = eng.gen_step(state, eng.shard(_data(1)))
        if expect_entropy_zero:
            assert float(met.entropy) == 0.0
        else:
            assert float(met.entropy) > 0.0


@pytest.mark.slow  # ~97 s cold on the 1-core host (2 full engine
# compiles); the mechanism keeps a fast-tier guard
# (test_models.py::test_save_point_mechanism_exact_tiny)
def test_engine_remat_policy_is_exact():
    """Selective remat through the FULL engine step (jit + donation +
    shard_map matching on the 8-device mesh): updated params and metrics
    must match the no-remat engine exactly."""
    import jax.numpy as jnp

    kw = dict(
        model="densenet",
        layers_per_block=2,
        filters_per_layer=8,
        batch_size=16,
        sinkhorn_lambda=50.0,
        nr_sinkhorn_iter=5,
        use_pallas=False,
    )
    x0 = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (16, 32, 32, 3)),
        jnp.float32,
    )
    x1 = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (16, 32, 32, 3)),
        jnp.float32,
    )
    results = []
    for extra in (
        {},
        dict(remat=True, remat_policy="gen_u1,gen_u2,disc_d2,disc_d3"),
    ):
        eng = Engine(TrainConfig(**kw, **extra))
        state, _ = eng.init_state(0, eng.shard(x0))
        state, met = eng.gen_step(state, eng.shard(x1))
        results.append((jax.tree.leaves(state), float(met.dist)))
    (leaves_a, dist_a), (leaves_b, dist_b) = results
    assert dist_a == dist_b
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        )


def test_train_disc_against_ema():
    eng = Engine(_toy_cfg(train_disc_against_ema=True))
    state, _ = eng.init_state(0, eng.shard(_data(0)))
    state, met = eng.disc_step(state, eng.shard(_data(1)))
    assert np.isfinite(float(met.dist))


def test_gen_step_only_touches_gen_and_ema():
    eng = Engine(_toy_cfg())
    state, _ = eng.init_state(0, eng.shard(_data(0)))
    disc_before = jax.tree.map(np.asarray, state.disc_params)
    gen_before = jax.tree.map(np.asarray, state.gen_params)
    state, _ = eng.gen_step(state, eng.shard(_data(1)))
    # disc unchanged
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
        disc_before,
        state.disc_params,
    )
    # gen changed
    changed = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: float(np.abs(a - np.asarray(b)).max()),
            gen_before,
            state.gen_params,
        )
    )
    assert max(changed) > 0.0


def test_exact_resume(tmp_path):
    """save -> restore -> step == keep -> step (fixes the reference's lossy
    resume, SURVEY.md section 5.4)."""
    eng = Engine(_toy_cfg())
    state, _ = eng.init_state(0, eng.shard(_data(0)))
    state, _ = eng.gen_step(state, eng.shard(_data(1)))

    path = save_checkpoint(str(tmp_path), state, 1)
    x2 = _data(2)

    state_a, met_a = eng.gen_step(state, eng.shard(x2))
    # NOTE: state was donated by the step above; restore into a fresh template
    eng2 = Engine(_toy_cfg())
    template, _ = eng2.init_state(0, eng2.shard(_data(0)))
    restored = restore_checkpoint(path, template)
    restored = jax.tree.map(jnp.asarray, restored)
    state_b, met_b = eng2.gen_step(restored, eng2.shard(x2))

    np.testing.assert_allclose(float(met_a.dist), float(met_b.dist), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-7
        ),
        state_a.gen_params,
        state_b.gen_params,
    )


def test_distance_decreases_with_frozen_critic():
    """Generator-only steps must reduce the transport distance (with the
    critic adversarially ascending the metric is not monotone — the full
    adversarial convergence check lives in test_toy_e2e.py)."""
    eng = Engine(_toy_cfg(learning_rate_gen=1e-3))
    rng = np.random.default_rng(0)
    state, _ = eng.init_state(0, eng.shard(jnp.asarray(sample_8gaussians(rng, 64))))
    dists = []
    for it in range(60):
        x = eng.shard(jnp.asarray(sample_8gaussians(rng, 64)))
        state, met = eng.gen_step(state, x)
        dists.append(float(met.dist))
    assert np.mean(dists[-10:]) < np.mean(dists[:10])


def test_cycle_step_matches_individual_steps():
    """One fused lax.scan cycle == the same steps run individually."""
    cfg = _toy_cfg(nr_gen_per_disc=2)
    eng_a, eng_b = Engine(cfg), Engine(cfg)
    x0 = _data(0)
    state_a, _ = eng_a.init_state(0, eng_a.shard(x0))
    state_b, _ = eng_b.init_state(0, eng_b.shard(x0))

    xs = [_data(i + 1) for i in range(6)]  # two full cycles
    # engine A: fused
    stacked = jnp.stack(xs)
    state_a, mets_a = eng_a.cycle_step(state_a, eng_a.shard_steps(stacked))
    # engine B: individual steps with the driver's schedule
    dists_b = []
    for i, x in enumerate(xs):
        if i % 3 == 0:
            state_b, met = eng_b.disc_step(state_b, eng_b.shard(x))
        else:
            state_b, met = eng_b.gen_step(state_b, eng_b.shard(x))
        dists_b.append(float(met.dist))

    np.testing.assert_allclose(
        np.asarray(mets_a.dist), np.asarray(dists_b), rtol=1e-5, atol=1e-6
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        state_a.gen_params,
        state_b.gen_params,
    )
    assert int(np.asarray(state_a.step)) == int(np.asarray(state_b.step)) == 6


def test_disc_freeze_after_steps():
    """Notebook-2 schedule (med_gan_toy_example2.ipynb cell 1): the critic
    freezes after ``disc_freeze_after_steps``; its update slots become
    generator steps. Verified through the fused cycle_step program."""
    cfg = _toy_cfg(nr_gen_per_disc=1, disc_freeze_after_steps=1)
    eng = Engine(cfg)
    state, _ = eng.init_state(0, eng.shard(_data(0)))
    disc0 = jax.tree.map(np.asarray, state.disc_params)

    # cycle 1 (steps 0-3): step 0 is a critic step (0 < freeze) -> disc moves
    xs = jnp.stack([_data(i + 1) for i in range(4)])
    state, _ = eng.cycle_step(state, eng.shard_steps(xs))
    disc1 = jax.tree.map(np.asarray, state.disc_params)
    moved = max(
        jax.tree.leaves(
            jax.tree.map(lambda a, b: float(np.abs(a - b).max()), disc0, disc1)
        )
    )
    assert moved > 0.0

    # cycle 2 (steps 4-7): steps 4 and 6 would be critic steps, but the
    # critic is frozen -> disc params must be bit-identical
    xs2 = jnp.stack([_data(i + 10) for i in range(4)])
    state, _ = eng.cycle_step(state, eng.shard_steps(xs2))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
        disc1,
        state.disc_params,
    )
    assert int(np.asarray(state.step)) == 8


def test_indivisible_batch_runs_row_sharded():
    """The reference's own train.py default (global 5000 on 8 devices) is
    not divisible by 2*n_devices — since round 3 the engine keeps the
    row-sharded matcher (padded-halves path) instead of falling back to the
    GSPMD global matcher, and records the dispatch in ``matcher_desc``."""
    # layout pinned to rows: this test exercises the row-sharded padding
    # machinery specifically (the default "auto" may pick matrix-parallel
    # at toy scale, test_engine_auto_layout)
    cfg = _toy_cfg(batch_size=40, matching_layout="rows")
    eng = Engine(cfg)
    assert "padded halves" in eng.matcher_desc, eng.matcher_desc
    state, _ = eng.init_state(0, eng.shard(_data(0, 40)))
    state, met = eng.gen_step(state, eng.shard(_data(1, 40)))
    assert np.isfinite(float(met.dist))

    # divisible batches keep the zero-copy whole-halves convention
    eng2 = Engine(_toy_cfg(batch_size=32, matching_layout="rows"))
    assert "whole local halves" in eng2.matcher_desc, eng2.matcher_desc


def test_engine_auto_layout():
    """--matching_layout auto resolves by the memory-feasibility rule at
    init (VERDICT r03 next #3): matrix-parallel when the per-chip estimate
    fits the budget, row-sharded otherwise; the decision + estimate land in
    matcher_desc for the run log."""
    eng = Engine(_toy_cfg(batch_size=32))  # default layout = auto
    assert "auto" in eng.matcher_desc
    state, _ = eng.init_state(0, eng.shard(_data(0, 32)))
    # toy scale: (4, 32, 16) f32 is far under any budget -> matrices
    assert "matrix-parallel" in eng.matcher_desc, eng.matcher_desc
    assert "[auto: estimated" in eng.matcher_desc
    state, met = eng.gen_step(state, eng.shard(_data(1, 32)))
    assert np.isfinite(float(met.dist))

    # a tiny budget forces the minimum-memory rows layout
    eng2 = Engine(_toy_cfg(batch_size=32, matching_memory_budget_gb=1e-9))
    eng2.resolve_auto_layout(16)
    assert "row-sharded" in eng2.matcher_desc, eng2.matcher_desc

    # the paper-scale DCGAN shape (B=8000, d=32768) exceeds the default
    # budget: accumulator alone is 4*8000*32768*4 = 4.2 GB -> rows
    eng3 = Engine(_toy_cfg(batch_size=8000))
    est = eng3.auto_layout_estimate(32768)
    assert est["accumulator_bytes"] == 4 * 8000 * 32768 * 4
    eng3.resolve_auto_layout(32768)
    assert "row-sharded" in eng3.matcher_desc, eng3.matcher_desc


@pytest.mark.slow  # ~90 s cold on the 1-core host: 3 compiles of the
# full-width (32768-d, reference parity) discriminator grad
def test_half_save_policy_is_exact():
    """save_point_half (disc_c2_half): the half-granularity save must be
    numerically identical to full recompute and to the full-tensor save —
    remat policies change scheduling, never math. Module-level (the full
    engine variant is too heavy for the 1-core CPU suite)."""
    from otgan_tpu.models import dcgan

    x0 = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (4, 32, 32, 3)),
        jnp.float32,
    )
    seed = jnp.asarray(
        np.random.default_rng(2).uniform(-1, 1, (4, 32768)), jnp.float32
    )
    grads = []
    for kw in (
        dict(remat=False),
        dict(remat=True, remat_policy="disc_c2_half"),
        dict(remat=True, remat_policy="disc_c2"),
    ):
        disc = dcgan.make_discriminator(**kw)
        params, _ = jax.jit(
            lambda k, x: disc.init(k, x, data_dependent=False)
        )(jax.random.PRNGKey(0), x0)

        def loss(p):
            return jnp.sum(disc.apply(p, x0) * seed)

        grads.append(jax.tree.leaves(jax.jit(jax.grad(loss))(params)))
    for a, b, c in zip(*grads):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)
