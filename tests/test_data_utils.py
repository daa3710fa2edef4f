"""Data pipeline, plotting, checkpoint, metrics tests."""

import os

import numpy as np
import jax.numpy as jnp

from otgan_tpu.data.cifar10 import DataLoader, random_flip, to_nhwc_float
from otgan_tpu.data.toy import GAUSSIAN_CENTERS, mode_coverage, sample_8gaussians
from otgan_tpu.utils.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
    checkpoint_step,
)
from otgan_tpu.utils.metrics import MetricLogger
from otgan_tpu.utils.plotting import img_stretch, img_tile, save_tile_img


def _fake_cifar(n=512):
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, (n, 3, 32, 32)).astype(np.uint8)


def test_to_nhwc_float_range():
    x = to_nhwc_float(_fake_cifar(8))
    assert x.shape == (8, 32, 32, 3)
    assert x.min() >= -1.0 and x.max() <= 1.0
    assert x.dtype == np.float32


def test_random_flip_only_mirrors():
    rng = np.random.default_rng(1)
    x = to_nhwc_float(_fake_cifar(64))
    out = random_flip(x, rng)
    for i in range(64):
        same = np.array_equal(out[i], x[i])
        mirrored = np.array_equal(out[i], x[i, :, ::-1, :])
        assert same or mirrored
    # both outcomes occur
    flips = sum(
        not np.array_equal(out[i], x[i]) for i in range(64)
    )
    assert 0 < flips < 64


def test_dataloader_epochs(tmp_path):
    data = to_nhwc_float(_fake_cifar(256))
    dl = DataLoader(
        str(tmp_path), batch_size=64, data=data,
        labels=np.zeros((256,), np.uint8), rng=np.random.default_rng(2),
    )
    assert dl.num_batches == 4
    batches = list(dl.epoch())
    assert len(batches) == 4
    assert all(b.shape == (64, 32, 32, 3) for b in batches)
    # shuffled epochs differ
    b2 = list(dl.epoch())
    assert not np.array_equal(batches[0], b2[0])


def test_images_255_both_storage_dtypes(tmp_path):
    """images_255 (the real side of FID statistics) returns identical
    uint8-range NHWC pixels whether the loader stores uint8 (native path)
    or float32 [-1,1] (reference layout), honoring limit."""
    raw = _fake_cifar(16)  # NCHW uint8
    nhwc_u8 = np.transpose(raw, (0, 2, 3, 1))
    dl_u8 = DataLoader(
        str(tmp_path), batch_size=4, data=nhwc_u8,
        rng=np.random.default_rng(0),
    )
    dl_f32 = DataLoader(
        str(tmp_path), batch_size=4, data=to_nhwc_float(raw),
        rng=np.random.default_rng(0),
    )
    a = dl_u8.images_255()
    b = dl_f32.images_255()
    assert a.shape == b.shape == (16, 32, 32, 3)
    np.testing.assert_allclose(
        np.asarray(a, np.float32), b, atol=1e-3
    )
    assert dl_u8.images_255(limit=5).shape[0] == 5
    assert dl_f32.images_255(limit=99).shape[0] == 16  # clamped to rows


def test_toy_data():
    rng = np.random.default_rng(3)
    x = sample_8gaussians(rng, 4096)
    assert x.shape == (4096, 2)
    assert mode_coverage(x) == 8
    # degenerate single-mode cloud covers 1
    assert mode_coverage(np.tile(GAUSSIAN_CENTERS[0], (100, 1))) == 1


def test_img_tile_and_save(tmp_path):
    imgs = np.zeros((7, 8, 8, 3), np.float32)
    grid = img_tile(imgs, border=1, border_color=1.0)
    th = tw = 3  # ceil(sqrt(7))
    assert grid.shape == (3 * 9 - 1, 3 * 9 - 1, 3)
    # borders are 1.0, cells are 0.0
    assert grid[8, 0, 0] == 1.0 and grid[0, 0, 0] == 0.0
    # empty trailing cells stay border-colored
    assert grid[-1, -1, 0] == 1.0
    path = os.path.join(tmp_path, "t.png")
    save_tile_img(grid, path)
    assert os.path.exists(path)


def test_img_tile_matches_reference_semantics():
    """Vectorized tiler == straightforward loop implementation."""
    rng = np.random.default_rng(4)
    imgs = rng.random((5, 4, 6, 3)).astype(np.float32)
    got = img_tile(imgs, border=2, border_color=0.5)
    # loop reference
    th, tw = 3, 2  # aspect: w/h=1.5 -> th=ceil(sqrt(7.5))=3, tw=ceil(sqrt(10/3))=2
    H, W = 4 + 2, 6 + 2
    want = np.full((th * H - 2, tw * W - 2, 3), 0.5, np.float32)
    for i in range(th):
        for j in range(tw):
            k = j + i * tw
            if k >= 5:
                break
            want[i * H : i * H + 4, j * W : j * W + 6] = imgs[k]
    np.testing.assert_allclose(got, want, atol=0)


def test_img_stretch():
    x = np.asarray([[-2.0, 0.0, 2.0]])
    s = img_stretch(x)
    np.testing.assert_allclose(s, [[0.0, 0.5, 1.0]], atol=1e-9)


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "b": (jnp.zeros((4,)), jnp.ones((), jnp.int32)),
    }
    p1 = save_checkpoint(str(tmp_path), state, 10)
    p2 = save_checkpoint(str(tmp_path), state, 200)
    assert latest_checkpoint(str(tmp_path)) == p2
    assert checkpoint_step(p2) == 200
    template = jax.tree.map(jnp.zeros_like, state)
    restored = restore_checkpoint(p1, template)
    np.testing.assert_allclose(np.asarray(restored["a"]), np.asarray(state["a"]))
    np.testing.assert_allclose(np.asarray(restored["b"][0]), 0.0)
    assert int(restored["b"][1]) == 1


def test_checkpoint_shape_mismatch_raises(tmp_path):
    state = {"a": jnp.zeros((2,))}
    p = save_checkpoint(str(tmp_path), state, 0)
    try:
        restore_checkpoint(p, {"a": jnp.zeros((3,))})
        assert False
    except ValueError:
        pass


def test_checkpoint_orbax_roundtrip_sharded(tmp_path):
    """Orbax backend: save/restore a pytree whose leaves include a
    batch-SHARDED array on the 8-virtual-device mesh (the pod path the npz
    backend can't do without a gather), plus retention and the unified
    restore/latest dispatch through utils.checkpoint."""
    from collections import namedtuple

    from otgan_tpu.parallel.mesh import make_mesh, shard_batch
    from otgan_tpu.utils import checkpoint_orbax as co

    mesh = make_mesh(8)
    x = shard_batch(mesh, jnp.arange(64, dtype=jnp.float32).reshape(8, 8))
    S = namedtuple("S", "a b step")
    state = S(a=x, b={"w": jnp.full((3,), 2.0)}, step=jnp.asarray(7))

    p = co.save_checkpoint(str(tmp_path), state, 200, async_write=True)
    assert p.endswith(os.path.join("orbax", "200"))

    template = S(
        a=shard_batch(mesh, jnp.zeros((8, 8))),
        b={"w": jnp.zeros((3,))},
        step=jnp.asarray(0),
    )
    r = co.restore_checkpoint(str(tmp_path), template)
    np.testing.assert_allclose(np.asarray(r.a), np.asarray(x))
    assert int(r.step) == 7
    # restored leaf keeps the template's sharding
    assert r.a.sharding.is_equivalent_to(x.sharding, ndim=2)

    # unified surface: latest_checkpoint finds the orbax step dir and
    # restore_checkpoint dispatches on it (what sample/evaluate CLIs use)
    assert latest_checkpoint(str(tmp_path)) == p
    assert checkpoint_step(p) == 200
    r2 = restore_checkpoint(p, template)
    np.testing.assert_allclose(np.asarray(r2.a), np.asarray(x))

    # npz at a higher step wins the latest-checkpoint race
    p_npz = save_checkpoint(str(tmp_path), state, 300)
    assert latest_checkpoint(str(tmp_path)) == p_npz

    # orbax-native retention (tf.train.Saver semantics); commits are async
    # (cached writer managers), so synchronize before listing
    co.save_checkpoint(str(tmp_path), state, 201, max_to_keep=2)
    co.save_checkpoint(str(tmp_path), state, 202, max_to_keep=2)
    co.wait_for_pending_saves()
    steps = sorted(
        int(os.path.basename(q))
        for q in (tmp_path / "orbax").iterdir()
        if q.is_dir() and os.path.basename(q).isdigit()
    )
    assert steps == [201, 202]

    # a directory that is NOT an orbax step dir is rejected with the
    # module's own error, not a bare int() crash
    try:
        restore_checkpoint(str(tmp_path), template)
        assert False
    except ValueError as e:
        assert "not a checkpoint path" in str(e)


def test_checkpoint_orbax_restores_onto_different_mesh(tmp_path):
    """The module docstring's pod-elasticity claim: a checkpoint written
    with one sharding restores onto a template with a DIFFERENT sharding
    (orbax reshards on read). Save batch-sharded over 8 devices, restore
    fully replicated and batch-sharded over 4."""
    import jax.sharding as shd

    from otgan_tpu.parallel.mesh import make_mesh, shard_batch
    from otgan_tpu.utils import checkpoint_orbax as co

    mesh8 = make_mesh(8)
    x = shard_batch(mesh8, jnp.arange(64, dtype=jnp.float32).reshape(8, 8))
    co.save_checkpoint(str(tmp_path), {"a": x}, 1, async_write=False)

    # replicated restore
    repl = jax.device_put(
        jnp.zeros((8, 8)),
        shd.NamedSharding(mesh8, shd.PartitionSpec()),
    )
    r = co.restore_checkpoint(str(tmp_path), {"a": repl})
    np.testing.assert_allclose(np.asarray(r["a"]), np.asarray(x))
    assert r["a"].sharding.is_equivalent_to(repl.sharding, ndim=2)

    # 4-device mesh restore
    mesh4 = shd.Mesh(np.array(jax.devices()[:4]), ("data",))
    tmpl4 = jax.device_put(
        jnp.zeros((8, 8)),
        shd.NamedSharding(mesh4, shd.PartitionSpec("data")),
    )
    r4 = co.restore_checkpoint(str(tmp_path), {"a": tmpl4})
    np.testing.assert_allclose(np.asarray(r4["a"]), np.asarray(x))
    assert r4["a"].sharding.is_equivalent_to(tmpl4.sharding, ndim=2)


def test_checkpoint_orbax_bf16_slots(tmp_path):
    """slot_dtype='bfloat16' on the orbax backend: EMA/opt-slot fields are
    stored bf16 and restore upcasts into the f32 template (params exact,
    slots within bf16 rounding) — parity with the npz backend's diet."""
    from collections import namedtuple

    from otgan_tpu.utils import checkpoint_orbax as co

    S = namedtuple("S", "gen_params gen_ema gen_opt disc_opt step")
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)
    state = S(
        gen_params=mk(), gen_ema=mk(), gen_opt=mk(), disc_opt=mk(),
        step=jnp.asarray(3),
    )
    co.save_checkpoint(
        str(tmp_path), state, 5, slot_dtype="bfloat16", async_write=False
    )
    template = jax.tree.map(jnp.zeros_like, state)
    r = co.restore_checkpoint(str(tmp_path), template)
    # params bit-exact (never compressed)
    np.testing.assert_array_equal(
        np.asarray(r.gen_params), np.asarray(state.gen_params)
    )
    assert r.gen_ema.dtype == jnp.float32  # template dtype after upcast
    np.testing.assert_allclose(
        np.asarray(r.gen_ema), np.asarray(state.gen_ema), rtol=8e-3
    )
    # and bf16 rounding actually happened (file stored compressed)
    assert np.any(np.asarray(r.gen_ema) != np.asarray(state.gen_ema))


def test_metric_logger(tmp_path):
    ml = MetricLogger(str(tmp_path), echo=False)
    ml.log(1, dist_gen=0.5, entropy=2.0)
    ml.log(2, dist_gen=0.25, dist_disc=0.1)
    path = ml.save_distances()
    ml.close()
    import json

    recs = [json.loads(l) for l in open(ml.path)]
    assert recs[0]["dist_gen"] == 0.5 and recs[1]["step"] == 2
    data = np.load(path)
    np.testing.assert_allclose(data["mean_dist_gen"], [0.5, 0.25])
    np.testing.assert_allclose(data["mean_dist_disc"], [0.1])


import jax  # noqa: E402  (used by checkpoint tests)


def test_legacy_plotting_helpers():
    from otgan_tpu.utils.plotting import (
        conv_filter_tile,
        plot_img,
        scale_to_unit_interval,
        tile_raster_images,
    )

    rng = np.random.default_rng(7)
    rgb = rng.random((4, 3, 5, 5)).astype(np.float32)
    assert conv_filter_tile(rgb).shape == (11, 11, 3)
    gray = rng.random((4, 2, 5, 5)).astype(np.float32)
    assert conv_filter_tile(gray).shape == (11, 23)
    X = rng.random((6, 16)).astype(np.float32)
    r = tile_raster_images(X, (4, 4), (2, 3), (1, 1))
    assert r.shape == (9, 14) and r.dtype == np.uint8
    r4 = tile_raster_images((X, X, None, None), (4, 4), (2, 3))
    assert r4.shape == (8, 12, 4)
    np.testing.assert_allclose(
        scale_to_unit_interval(np.array([1.0, 3.0])), [0.0, 1.0], atol=1e-7
    )
    fig = plot_img(rng.random((4, 4)))
    assert fig is not None


def test_prune_checkpoints(tmp_path):
    import time as _time
    from otgan_tpu.utils.checkpoint import prune_checkpoints

    state = {"a": jnp.zeros((2,))}
    paths = []
    base = _time.time() - 10 * 3600
    for i in range(10):
        p = save_checkpoint(str(tmp_path), state, i)
        # simulate hourly checkpoints over 10 hours
        os.utime(p, (base + i * 3600, base + i * 3600))
        paths.append(p)
    deleted = prune_checkpoints(str(tmp_path), max_to_keep=3, keep_every_hours=5.0)
    remaining = sorted(os.listdir(tmp_path))
    # newest 3 kept
    for p in paths[-3:]:
        assert os.path.basename(p) in remaining
    # long-term anchors: first (t=0) and t>=5h kept
    assert os.path.basename(paths[0]) in remaining
    assert os.path.basename(paths[5]) in remaining
    assert len(deleted) > 0 and len(remaining) < 10


def test_prune_checkpoints_ignores_tmp_and_ranks_by_step(tmp_path):
    """Regression: stale .tmp.npz files are cleaned (not retained as
    checkpoints), and 'newest' means highest STEP even when mtimes are
    flattened by a copy/restore."""
    from otgan_tpu.utils.checkpoint import prune_checkpoints

    state = {"a": jnp.zeros((2,))}
    paths = [save_checkpoint(str(tmp_path), state, i * 100) for i in range(6)]
    # crash leftover
    tmp_file = os.path.join(tmp_path, "otgan_state-999.npz.tmp.npz")
    open(tmp_file, "wb").write(b"partial")
    # flatten mtimes (simulates cp -r restore)
    now = os.path.getmtime(paths[0])
    for p in paths:
        os.utime(p, (now, now))
    prune_checkpoints(str(tmp_path), max_to_keep=2, keep_every_hours=5.0)
    remaining = set(os.listdir(tmp_path))
    assert "otgan_state-999.npz.tmp.npz" not in remaining
    # highest-step checkpoints survive
    assert os.path.basename(paths[-1]) in remaining
    assert os.path.basename(paths[-2]) in remaining


def test_async_save_failure_surfaces_at_barrier(tmp_path):
    """A writer-thread failure (unwritable dir) must be raised at the next
    wait_for_pending_saves barrier — not swallowed while train() reports
    the checkpoint as saved."""
    import pytest

    from otgan_tpu.utils.checkpoint import (
        save_checkpoint,
        wait_for_pending_saves,
    )

    state = {"a": jnp.zeros((2,))}
    # squat the final path with a non-empty directory: os.replace in the
    # writer thread fails (works even as root, unlike permission bits)
    squat = tmp_path / "otgan_state-0.npz"
    (squat / "x").mkdir(parents=True)
    save_checkpoint(str(tmp_path), state, 0, async_write=True)
    with pytest.raises(RuntimeError, match="background checkpoint"):
        wait_for_pending_saves()
    # the barrier must clear the error: subsequent saves work again
    wait_for_pending_saves()
    p = save_checkpoint(str(tmp_path), state, 1, async_write=True)
    wait_for_pending_saves()
    assert os.path.exists(p)


def test_async_save_applies_retention_in_writer(tmp_path):
    """save_checkpoint(max_to_keep=...) prunes inside the writer thread, so
    async saves keep the retention policy without a caller-side join."""
    from otgan_tpu.utils.checkpoint import (
        save_checkpoint,
        wait_for_pending_saves,
    )

    state = {"a": jnp.zeros((2,))}
    for i in range(6):
        save_checkpoint(
            str(tmp_path),
            state,
            i,
            async_write=True,
            max_to_keep=2,
            keep_every_hours=1e9,  # only the oldest survives as an anchor
        )
    wait_for_pending_saves()
    remaining = sorted(os.listdir(tmp_path))
    assert remaining == [
        "otgan_state-0.npz",  # long-term anchor
        "otgan_state-4.npz",
        "otgan_state-5.npz",
    ]


def test_checkpoint_bf16_slots_roundtrip_and_size(tmp_path):
    """slot_dtype="bfloat16" must ~halve the file and roundtrip EMA/opt
    slots within bf16 precision while keeping params bit-exact."""
    import collections

    import jax.numpy as jnp
    import numpy as np

    from otgan_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    State = collections.namedtuple(
        "State",
        ["gen_params", "disc_params", "gen_ema", "gen_opt", "disc_opt", "step", "rng"],
    )
    rng = np.random.default_rng(0)
    big = lambda: jnp.asarray(rng.standard_normal((256, 256)), jnp.float32)
    tiny = jnp.asarray(rng.uniform(1e-9, 1e-7, (64,)), jnp.float32)
    state = State(
        gen_params={"w": big()},
        disc_params={"w": big()},
        gen_ema={"w": big()},
        gen_opt={"m": big(), "v": tiny},
        disc_opt={"m": big()},
        step=jnp.zeros((), jnp.int32),
        rng=jnp.zeros((2,), jnp.uint32),
    )
    p_full = save_checkpoint(str(tmp_path / "full"), state, 1)
    p_bf16 = save_checkpoint(
        str(tmp_path / "bf16"), state, 1, slot_dtype="bfloat16"
    )
    import os

    full_sz, bf16_sz = os.path.getsize(p_full), os.path.getsize(p_bf16)
    # 4 of 6 big arrays compress: expect ~2/3 size; assert < 3/4
    assert bf16_sz < 0.75 * full_sz, (full_sz, bf16_sz)

    got = restore_checkpoint(p_bf16, state)
    # params bit-exact
    np.testing.assert_array_equal(
        np.asarray(got.gen_params["w"]), np.asarray(state.gen_params["w"])
    )
    # slots within bf16 relative precision (~2^-8)
    np.testing.assert_allclose(
        np.asarray(got.gen_ema["w"]), np.asarray(state.gen_ema["w"]), rtol=1e-2
    )
    # tiny Adam second moments survive (bf16 keeps f32's exponent range)
    v = np.asarray(got.gen_opt["v"])
    assert (v > 0).all()
    np.testing.assert_allclose(v, np.asarray(tiny), rtol=1e-2)


def test_checkpoint_async_write(tmp_path):
    import collections

    import jax.numpy as jnp
    import numpy as np

    from otgan_tpu.utils.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
        wait_for_pending_saves,
    )

    State = collections.namedtuple("State", ["gen_params", "step"])
    state = State(
        gen_params={"w": jnp.arange(16.0, dtype=jnp.float32)},
        step=jnp.asarray(7, jnp.int32),
    )
    path = save_checkpoint(str(tmp_path), state, 3, async_write=True)
    wait_for_pending_saves()
    import os

    assert os.path.exists(path)
    got = restore_checkpoint(path, state)
    np.testing.assert_array_equal(
        np.asarray(got.gen_params["w"]), np.asarray(state.gen_params["w"])
    )
    assert int(np.asarray(got.step)) == 7


def test_compilation_cache_writes_entries(tmp_path):
    """enable_compilation_cache points jax's persistent cache at the dir;
    a jitted computation then persists an executable there (CPU backend —
    the TPU/axon behavior is documented in utils/compile_cache.py)."""
    import jax

    from otgan_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache("")  # no-op must not touch config
    enable_compilation_cache(str(tmp_path))
    # the directory is size-bounded by default via jax's own LRU eviction
    # (20 GB; OTGAN_XLA_CACHE_MAX_GB overrides, <= 0 = unbounded)
    assert jax.config.jax_compilation_cache_max_size == int(20e9)
    # jax latches its cache handle at first init: an earlier test (or the
    # session cache conftest.py points at) may have initialized it — force
    # re-init at THIS test's directory
    from jax._src import compilation_cache as _cc

    _cc.reset_cache()
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        f = jax.jit(lambda a: (a * 2.000421).sum())
        float(f(jnp.ones((64, 64))))
        assert any(tmp_path.iterdir()), "no cache entry written"
    finally:
        # Restore the REAL defaults (min_entry_size default is 0, NOT None:
        # restoring None made every later same-process compile warn
        # "TypeError: '<' not supported between 'int' and 'NoneType'" from
        # jax's cache-put path — 55 warnings across the round-2 suite), and
        # unlatch the cache machinery so later compiles don't attempt puts
        # against the now-dead directory config.
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_compilation_cache_max_size", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        from jax._src import compilation_cache as _cc

        _cc.reset_cache()


def test_compilation_cache_max_size_env_override(tmp_path, monkeypatch):
    """OTGAN_XLA_CACHE_MAX_GB=-1 (or any <= 0) keeps the cache unbounded."""
    import jax

    from otgan_tpu.utils.compile_cache import enable_compilation_cache

    monkeypatch.setenv("OTGAN_XLA_CACHE_MAX_GB", "-1")
    try:
        enable_compilation_cache(str(tmp_path))
        assert jax.config.jax_compilation_cache_max_size == -1
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_compilation_cache_max_size", -1)
        from jax._src import compilation_cache as _cc

        _cc.reset_cache()


def test_cache_telemetry_records_hits_and_misses(tmp_path):
    """install_cache_telemetry must see the persistent-cache MISS of a first
    compile and the HIT when a second, separately-jitted but byte-identical
    program compiles (how bench.py states whether the paper-scale cycle
    program was served from cache)."""
    import logging

    import jax

    from otgan_tpu.utils.compile_cache import (
        enable_compilation_cache,
        install_cache_telemetry,
    )

    enable_compilation_cache(str(tmp_path))
    from jax._src import compilation_cache as _cc_init

    _cc_init.reset_cache()  # re-init at this test's dir (see above)
    tel = install_cache_telemetry()
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

        def body(a):
            return (a * 3.14159 + 0.577).sum()

        float(jax.jit(body)(jnp.ones((32, 32))))
        assert any("jit_body" in n for n in tel.misses), tel.misses
        # drop the in-memory executable caches so the byte-identical
        # program must come back from the persistent cache
        jax.clear_caches()
        float(jax.jit(body)(jnp.ones((32, 32))))
        assert any("jit_body" in n for n in tel.hits), tel.hits
        s = tel.summary()
        assert s["cache_put_errors"] == 0
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_compilation_cache_max_size", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        from jax._src import compilation_cache as _cc

        _cc.reset_cache()
        logging.captureWarnings(False)
        for name in ("jax._src.compiler", "py.warnings"):
            logging.getLogger(name).removeHandler(tel)


def test_init_watchdog_fires_and_disarms():
    """arm() triggers on_timeout unless disarmed in time; timeout <= 0
    returns an already-disarmed handle (the trainer's default-off mode)."""
    import threading
    import time

    from otgan_tpu.utils.init_watchdog import arm

    fired = threading.Event()
    arm(0.05, on_timeout=fired.set)
    assert fired.wait(2.0), "watchdog never fired"

    fired2 = threading.Event()
    wd = arm(0.2, on_timeout=fired2.set)
    wd.disarm()
    time.sleep(0.4)
    assert not fired2.is_set(), "disarmed watchdog still fired"

    wd0 = arm(0, on_timeout=lambda: (_ for _ in ()).throw(AssertionError()))
    wd0.disarm()  # no-op, already disarmed
