"""Typed training configuration, preserving every reference CLI flag.

The reference's argparse surface (``train.py:14-33``, 18 flags) maps 1:1
onto this dataclass; TPU-specific knobs are additive. ``nr_gpu`` becomes
``num_devices`` (mesh size); ``batch_size`` here is the GLOBAL batch
(reference global batch = ``batch_size * nr_gpu``, ``train.py:159``).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
from typing import Optional


@dataclasses.dataclass
class TrainConfig:
    # ---- reference flags (train.py:14-33) ----
    seed: int = 1
    batch_size: int = 256  # GLOBAL batch (reference: 625/gpu * 8 = 5000)
    learning_rate_disc: float = 3e-4
    learning_rate_gen: float = 3e-4
    data_dir: str = "/tmp/data"
    save_dir: str = "/tmp/otgan_tpu"
    optimizer: str = "adam"  # adam | adamax | nesterov
    nonlinearity: str = "crelu"  # crelu | celu | relu | elu
    num_devices: int = 0  # 0 = all available (replaces --nr_gpu)
    nr_gen_per_disc: int = 5
    sinkhorn_lambda: float = 500.0
    nr_sinkhorn_iter: int = 500
    single_batch: bool = False
    train_disc_against_ema: bool = False
    model: str = "dcgan"  # dcgan | densenet | toy_mlp
    load_params: bool = False
    model_name: str = ""  # checkpoint path override; "" = latest in save_dir
    no_sinkhorn: bool = False
    # ---- training-loop knobs with reference defaults ----
    ema_decay: float = 0.999  # train.py:63
    adam_mom1: float = 0.5  # train.py:142
    adam_mom2: float = 0.999
    max_epochs: int = 1000000  # train.py:196
    eval_every_epochs: int = 100  # inception cadence, train.py:245
    save_every_epochs: int = 200  # checkpoint cadence, train.py:275
    inception_samples: int = 50000  # train.py:183
    inception_splits: int = 10
    # classifier batch for the eval pass. 100 = the reference protocol
    # (utils/inception.py:34); per-image probabilities are batch-invariant
    # so larger batches only amortize dispatch/transfer (measured: 50k
    # samples 42 s at 100 vs 32 s at 500 on one v5e chip). 0 = keep the
    # module default / OTGAN_INCEPTION_BATCH env.
    inception_batch: int = 0
    # also compute FID at every inception eval (raw + EMA). Costs no extra
    # classifier forwards: the eval switches to the combined one-pass
    # scorer (eval/fid.combined_eval_from_sampler) — the 2048-d pool
    # features feed the FID statistics and, through the fc head, the
    # Inception score. The reference reports IS only (train.py:264-272);
    # FID is the additive companion metric (SURVEY.md section 7 step 9).
    eval_fid: bool = False
    # precomputed real-data statistics (.npz from
    # eval/fid.save_reference_statistics). "" = compute once from this
    # run's training data at the first eval and cache to
    # <save_dir>/fid_stats.npz (chief process only).
    fid_stats_path: str = ""
    # ---- densenet options (models/densenet.py:7) ----
    layers_per_block: int = 16
    filters_per_layer: int = 16
    # ---- TPU-native additions ----
    # True: real data-dependent weight-norm init (the reference's intent,
    # utils/nn.py:103-162). False: the reference's *shipped* behavior
    # (g=1, b=0; its init-pass assigns never run, SURVEY.md 3.1 step 8).
    # The toy pipeline uses plain init (notebook xavier), see engine.
    data_dependent_init: bool = True
    # examples used for the data-dependent init pass (0 = the full
    # batch_size, the reference's behavior). The init forward holds every
    # activation at once with no remat, so it OOMs before training does —
    # DenseNet's multi-res generator needs 23.7 GB at batch 1024
    # (REHEARSAL.md); init statistics over a few hundred samples are
    # equivalent. Must be divisible by the device count on a mesh.
    init_batch_size: int = 0
    # model matmul/conv compute dtype ("bfloat16" = 4x f32 MXU rate, f32
    # accumulation; params, losses, and ALL matching/Sinkhorn math stay f32)
    compute_dtype: str = "bfloat16"
    # dtype image batches cross the host->device boundary in:
    #   "uint8" (default): raw bytes, 3072 B/img — the [0,255] -> [-1,1]
    #       normalize is fused into the jitted step (engine._ingest;
    #       bit-identical math to the host path). Half the H2D of bf16,
    #       a quarter of f32 — on tunneled/remote hosts H2D is the
    #       end-to-end bottleneck, and the on-device image stacks shrink
    #       the same factor.
    #   "compute": emit batches in compute_dtype (the round-3 behavior,
    #       host-side fused u8->bf16 conversion).
    #   "float32": full-precision host conversion (reference behavior,
    #       train.py:158).
    # Non-image (toy) data is float and unaffected.
    ingest_dtype: str = "uint8"
    # overlap the NEXT G:D cycle's host batch assembly + H2D transfer with
    # the CURRENT cycle's device execution (a depth-1 placement prefetcher
    # on one worker thread, train._prefetch_placed). At paper scale the
    # epoch-boundary metrics readback otherwise serializes the transfer
    # against an idle device — the dominant end-to-end gap (DESIGN.md
    # section 7). Costs up to one extra placed image stack on device
    # (uint8: 92 MB for batch 5000's fused 6-step cycle). False = the
    # round-3 inline placement.
    host_prefetch: bool = True
    use_pallas: bool = True  # fused Sinkhorn kernel when matrices fit VMEM
    # explicit shard_map matching on multi-device meshes: row-sharded cost +
    # collectively-normalized Sinkhorn (no chip holds a full N x N matrix).
    # False = let GSPMD partition the global matcher automatically.
    sharded_matching: bool = True
    # multi-chip matcher layout: "rows" = row-sharded matrices with a
    # cross-chip logsumexp per Sinkhorn iteration (min memory, 2 small
    # collectives x n_iters); "matrices" = whole Sinkhorn instances
    # round-robined over chips (the reference's own layout,
    # utils/matching.py:49 — zero per-iteration collectives, each chip runs
    # the full single-chip kernel tiers; heavier (4, B, d) output psum).
    # "auto" (default): matrices when its per-chip residency estimate fits
    # matching_memory_budget_gb, rows otherwise — the resolved choice (and
    # the estimate) is recorded in the run's `matcher` metric.
    # docs/DESIGN.md section 4 has the trade-off + numbers; all are exact.
    matching_layout: str = "auto"
    # per-chip HBM the auto rule may spend on the matrix-parallel layout's
    # extra residency ((4,B,d) f32 accumulator + 2 gathered (B,d) feature
    # copies + whole cost matrices; engine.auto_layout_estimate). See
    # DESIGN.md section 4 for the measured calibration.
    matching_memory_budget_gb: float = 4.0
    # feature-stage gradient accumulation: split each step's batch into this
    # many microbatches — model forward/backward run per microbatch while the
    # matching stays GLOBAL over the full batch. Exact, not approximate: the
    # MED losses put stop_gradient on every matched feature (ops/losses.py),
    # so the loss is a per-sample sum features*cotangent and the backward
    # decomposes row-for-row. This runs the paper's batch-8000 config
    # (train_with_model_saving.py:16,23 — "multi-chip by construction" for
    # the reference, 8 GPUs) on ONE 16 GB chip: only the (B, d) feature /
    # cotangent tensors and the Sinkhorn matrices stay resident, activations
    # exist one microbatch at a time. 1 = off. batch_size must be divisible.
    grad_accum: int = 1
    remat: bool = False  # jax.checkpoint over model blocks
    # selective remat: comma-separated save_point names kept in HBM instead
    # of recomputed in the backward pass (e.g. "gen_g1,disc_c4,gen_g2" for
    # dcgan; "gen_u1,gen_u2,disc_d2,disc_d3" for densenet). Only meaningful
    # with --remat; "" = recompute everything (lowest memory). Each saved
    # tensor skips exactly its producing op's recompute — docs/DESIGN.md
    # section 7 ranks the candidates by FLOPs recovered per byte.
    remat_policy: str = ""
    profile_dir: str = ""  # non-empty: write jax.profiler traces here
    # persistent XLA compilation cache (CLI entry points only; library
    # callers opt in via utils.compile_cache.enable_compilation_cache).
    # Pays off hugely on remote/AOT compile services: the paper-scale
    # 5-save-remat cycle program compiles in ~4 min cold, ~1 s warm.
    # "" disables. (Default mirrors compile_cache.DEFAULT_CACHE_DIR;
    # kept literal so the dataclass has no import-order dependency —
    # test_config_cache_dir_matches_helper pins the two together.)
    compilation_cache_dir: str = "~/.cache/otgan_tpu/xla"
    log_every_steps: int = 0  # 0 = log per epoch only (reference behavior)
    # CIFAR-shaped random data instead of downloading (zero-egress smoke
    # runs / benchmarking; the reference always needs the real download)
    synthetic_data: bool = False
    synthetic_size: int = 5120
    # run whole G:D cycles (nr_gen_per_disc+1 steps) as ONE jitted program
    # (lax.scan) — fewer host round trips per step. Disable above ~global
    # batch 5120 on 16 GB chips: the fused program keeps the whole cycle's
    # input stack resident and OOMs HBM at batch 8192 (measured; individual
    # steps fit)
    fused_cycle: bool = True
    # checkpoint retention (tf.train.Saver semantics: max_to_keep +
    # keep_checkpoint_every_n_hours, train_with_model_saving.py:59);
    # max_checkpoints_to_keep=0 keeps everything
    max_checkpoints_to_keep: int = 5
    keep_checkpoint_every_n_hours: float = 5.0
    # opt-in Sinkhorn early exit: stop when the column potential moves less
    # than this (sup-norm); 0.0 = exact reference behavior (fixed count).
    # tol=1e-3 typically cuts 500 iterations to ~100-150 at <1e-4 assignment
    # error. tol>0 takes a dynamic-trip-count loop: the XLA while_loop path
    # on a single device (overriding use_pallas) and the collective
    # while_loop in the sharded matcher on meshes.
    sinkhorn_tol: float = 0.0
    # matmul precision for the matching path (cost matrices AND the matched-
    # feature matmuls; Sinkhorn iterations are matmul-free). On TPU float32
    # matmuls run on the MXU as multi-pass bf16 decompositions: "highest"
    # (default) is the full-accuracy path the invariants assume, "high" the
    # 3-pass variant at roughly 2x matmul throughput with ~1e-6-class
    # relative cost error (lam=500 amplifies it 500x in the Sinkhorn
    # logits — measured deltas in docs/DESIGN.md section 7), "default" a
    # single bf16 pass (f32 accumulate; too coarse for the matched features
    # — exposed for measurement only). Model compute is unaffected.
    matching_precision: str = "highest"
    # numerics sanitizer: raise on the first NaN produced by any jitted
    # computation (jax_debug_nans) — the "race detector" analog for SPMD math
    debug_nans: bool = False
    # checkpoint storage: "bfloat16" stores EMA + optimizer slots in bf16
    # (~half the file; params stay f32), "float32" = exact (default).
    checkpoint_slot_dtype: str = "float32"
    # write checkpoints on a background thread (device->host copy stays
    # synchronous; only compression + disk I/O are deferred)
    async_checkpoint: bool = True
    # "npz" (default): single host-side .npz, exact and dependency-free.
    # "orbax": per-process sharded writes + async commit via
    # orbax.checkpoint.CheckpointManager — the multi-host/pod path; the
    # reference Saver's retention knobs map onto orbax natively. Restore
    # and the sampling/eval CLIs accept checkpoints from either backend.
    checkpoint_backend: str = "npz"
    # ---- multi-host (pod) launch ----
    # initialize jax.distributed before any other JAX call, then run the
    # SAME SPMD program on every host: each process feeds its
    # process_index::process_count slice of the data at batch_size /
    # process_count per step, artifacts are written by process 0, and
    # checkpointing switches to the orbax backend (per-process shard
    # writes). On TPU pods bare --multihost auto-detects the coordinator;
    # manual launches (e.g. CPU) pass all three explicit values.
    multihost: bool = False
    coordinator_address: str = ""  # "" = auto-detect (TPU pods)
    num_processes: int = 0  # 0 = auto
    process_id: int = -1  # -1 = auto
    # freeze the critic after this many global steps (0 = never, the
    # reference train.py behavior). Toy notebook 2 trains with D+G updates
    # every iteration and freezes D after iteration 15000
    # (toy_example/med_gan_toy_example2.ipynb cell 1); with a frozen critic
    # the would-be critic steps become generator steps.
    disc_freeze_after_steps: int = 0

    def save(self, path: str) -> None:
        """Persist the full config as JSON (written into the run directory
        by the trainer so sampling/evaluation CLIs can rebuild the exact
        model — incl. densenet block settings — from any checkpoint)."""
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2, sort_keys=True)

    @classmethod
    def load(cls, path: str) -> "TrainConfig":
        """Load a config written by :meth:`save`. Unknown keys are ignored
        (forward compatibility across framework versions)."""
        with open(path) as f:
            data = json.load(f)
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in data.items() if k in names})

    @classmethod
    def for_run(cls, save_dir: str, **overrides) -> "TrainConfig":
        """Rebuild the config of a training run from ``save_dir/config.json``
        when present (falling back to defaults otherwise), with explicit
        ``overrides`` applied on top."""
        path = os.path.join(save_dir, "config.json")
        cfg = cls.load(path) if os.path.exists(path) else cls()
        return dataclasses.replace(cfg, save_dir=save_dir, **overrides)

    def model_opts(self) -> dict:
        nonlin = self.nonlinearity
        if self.model == "toy_mlp" and nonlin == "crelu":
            # the toy notebook's MLPs are plain relu; the global default
            # ('crelu', for the conv models) would double every fan-in
            nonlin = "relu"
        common = {
            "nonlinearity": nonlin,
            "remat": self.remat,
            "compute_dtype": self.compute_dtype,
            "remat_policy": self.remat_policy,
        }
        if self.model == "densenet":
            return {
                "layers_per_block": self.layers_per_block,
                "filters_per_layer": self.filters_per_layer,
                **common,
            }
        return common


def _add_bool_flag(p: argparse.ArgumentParser, name: str, default: bool):
    p.add_argument(f"--{name}", dest=name, action="store_true", default=default)
    p.add_argument(f"--no_{name}", dest=name, action="store_false")


def parse_args(argv: Optional[list] = None) -> TrainConfig:
    defaults = TrainConfig()
    p = argparse.ArgumentParser(description="TPU-native OT-GAN trainer")
    for f in dataclasses.fields(TrainConfig):
        if f.type == "bool" or isinstance(getattr(defaults, f.name), bool):
            _add_bool_flag(p, f.name, getattr(defaults, f.name))
        else:
            p.add_argument(
                f"--{f.name}",
                type=type(getattr(defaults, f.name)),
                default=getattr(defaults, f.name),
            )
    # reference-compat alias: --nr_gpu maps onto num_devices (train.py:23)
    p.add_argument("--nr_gpu", type=int, default=None, help="alias for --num_devices")
    # presets reproducing the two reference drivers' configurations:
    # train_py      = train.py defaults (global batch 625*8=5000, 5:1 G:D)
    # model_saving  = train_with_model_saving.py (1000*8=8000, 3:1; its
    #                 full-variable Saver is this framework's default)
    p.add_argument(
        "--preset", choices=["train_py", "model_saving"], default=None
    )
    ns = p.parse_args(argv)
    if ns.nr_gpu is not None:
        ns.num_devices = ns.nr_gpu
    del ns.nr_gpu
    raw = list(argv if argv is not None else sys.argv[1:])

    def explicit(flag: str) -> bool:
        return any(a == flag or a.startswith(flag + "=") for a in raw)

    if ns.preset == "train_py":
        if not explicit("--batch_size"):
            ns.batch_size = 5000
        if not explicit("--nr_gen_per_disc"):
            ns.nr_gen_per_disc = 5
    elif ns.preset == "model_saving":
        if not explicit("--batch_size"):
            ns.batch_size = 8000
        if not explicit("--nr_gen_per_disc"):
            ns.nr_gen_per_disc = 3
    del ns.preset
    return TrainConfig(**vars(ns))
