"""Multi-host (pod-style) launch: the SAME train CLI on 2 real OS
processes over jax.distributed, each feeding its process-local data slice
(SURVEY.md section 2.3 data parallelism, across PROCESS boundaries — the
step the 8-virtual-device in-process tests cannot cover).

Runs on CPU: each process owns 1 CPU device, so the mesh is 2 global
devices across 2 processes; collectives go through the distributed
runtime (gloo), exactly as cross-host ICI/DCN traffic would on a pod.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch(
    pid: int, port: int, save_dir: str, extra: list, pre: str = ""
) -> subprocess.Popen:
    # in-process CPU forcing (the axon sitecustomize force-registers the
    # TPU platform; env alone is not enough — CLAUDE.md)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        + pre
        + "from otgan_tpu.train import main; main("
        f"{extra + ['--process_id', str(pid)]!r})"
    )
    env = dict(
        os.environ,
        OTGAN_TOY_EPOCH_BATCHES="6",
        XLA_FLAGS="",  # no virtual device fan-out: 1 CPU device per process
    )
    return subprocess.Popen(
        [sys.executable, "-c", code],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


def test_two_process_toy_train(tmp_path):
    port = _free_port()
    save_dir = str(tmp_path / "run")
    args = [
        "--model", "toy_mlp",
        "--batch_size", "128",  # GLOBAL; 64 per process
        "--sinkhorn_lambda", "50.0",
        "--nr_sinkhorn_iter", "5",
        "--max_epochs", "2",
        "--save_every_epochs", "2",
        "--save_dir", save_dir,
        "--no_use_pallas",
        "--multihost",
        "--coordinator_address", f"127.0.0.1:{port}",
        "--num_processes", "2",
    ]
    procs = [_launch(i, port, save_dir, args) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"

    # both processes saw the 2-device global mesh and the local split
    assert "process 0/2 (local batch 64)" in outs[0]
    assert "process 1/2 (local batch 64)" in outs[1]
    # npz backend was auto-switched to orbax for the pod path
    assert "switching checkpoint_backend npz -> orbax" in outs[0]

    # chief-only artifacts: metrics written once, with finite distances
    recs = [
        json.loads(l) for l in open(os.path.join(save_dir, "metrics.jsonl"))
    ]
    epochs = [r for r in recs if "epoch" in r]
    assert len(epochs) == 2
    assert np.isfinite(epochs[-1]["dist_gen"])
    # chief-only logging: process 0 echoes metric lines, process 1 is silent
    import re

    d0 = re.findall(r"dist_gen=([0-9.]+)", outs[0])
    assert d0 and all(np.isfinite(float(d)) for d in d0)
    assert not re.findall(r"dist_gen=", outs[1])

    # orbax checkpoint committed at the epoch-1 boundary
    assert os.path.isdir(os.path.join(save_dir, "orbax", "1"))
    # toy sample dumps from the chief only
    assert os.path.exists(os.path.join(save_dir, "sample0.npy"))

    # ---- resume leg: collective orbax restore across both processes,
    # resumed into --grad_accum steps (accum changes no state shape, so a
    # checkpoint trained unaccumulated restores into microbatched steps;
    # also the only coverage of accum's global-batch reshape across a real
    # process boundary) ----
    port2 = _free_port()
    resume_args = [
        a if a != f"127.0.0.1:{port}" else f"127.0.0.1:{port2}"
        for a in args
    ] + ["--load_params", "--max_epochs", "3", "--grad_accum", "2"]
    procs = [_launch(i, port2, save_dir, resume_args) for i in range(2)]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"resume process {i} failed:\n{out[-4000:]}"
    for out in outs:
        assert "resuming at epoch 2" in out  # both restored the same step
    assert "grad_accum: 2 microbatches of 64" in outs[0]
    # the resumed (accumulated) epoch logged a finite distance
    recs = [
        json.loads(l) for l in open(os.path.join(save_dir, "metrics.jsonl"))
    ]
    epochs = [r for r in recs if "epoch" in r]
    assert len(epochs) == 3
    assert np.isfinite(epochs[-1]["dist_gen"])


@pytest.mark.slow  # ~80 s cold on the 1-core host (two fresh conv-model
# subprocesses); the fast tier keeps the 2-process launch path
# (test_two_process_toy_train) and the padded-halves matcher is
# exactness-tested single-process on the 8-device mesh
# (test_matching_sharded.py)
def test_two_process_padded_halves_matching(tmp_path):
    """The row-sharded padded-halves matcher ACROSS a real process boundary
    (VERDICT r03 next #6): a conv-model run whose global batch hits the
    padded class ((B/2) % n_dev != 0 — the shape class of the reference's
    own 5000-on-8 config, train.py:16,23 + utils/matching.py:16-19). Global
    batch 10 on the 2-process/2-device mesh: halves of 5, 5 % 2 = 1, so
    each matching call pads +1 row per half and masks it inside the
    collective Sinkhorn. Until now this path had single-process mesh
    coverage only."""
    port = _free_port()
    save_dir = str(tmp_path / "run")
    args = [
        "--model", "densenet",  # conv/image family (tiny instantiation)
        "--layers_per_block", "1",
        "--filters_per_layer", "4",
        "--synthetic_data",
        "--synthetic_size", "20",  # 10 rows/process -> 2 steps per epoch
        "--batch_size", "10",  # GLOBAL; halves of 5 pad to 6 on 2 devices
        "--matching_layout", "rows",  # pin: this test guards the padded path
        "--sinkhorn_lambda", "50.0",
        "--nr_sinkhorn_iter", "5",
        "--max_epochs", "2",
        "--eval_every_epochs", "100",
        "--save_every_epochs", "100",
        "--save_dir", save_dir,
        "--no_use_pallas",
        "--checkpoint_backend", "orbax",
        "--multihost",
        "--coordinator_address", f"127.0.0.1:{port}",
        "--num_processes", "2",
    ]
    procs = [_launch(i, port, save_dir, args) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=560)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"

    # every process dispatched the padded-halves matcher (the engine logs
    # its matcher_desc at launch on each host)
    for i, out in enumerate(outs):
        assert "padded halves" in out, f"process {i} matcher:\n{out[-2000:]}"
        assert "+1 pad rows per half" in out
    # chief-side record + finite, stable metrics (replicated SPMD metrics:
    # a cross-process divergence would deadlock or NaN the collectives)
    recs = [
        json.loads(l) for l in open(os.path.join(save_dir, "metrics.jsonl"))
    ]
    matcher = [r for r in recs if "matcher" in r]
    assert matcher and "padded halves" in matcher[0]["matcher"]
    epochs = [r for r in recs if "epoch" in r]
    assert len(epochs) == 2
    assert np.isfinite(epochs[-1]["dist_gen"])
    assert np.isfinite(epochs[-1]["entropy"])


@pytest.mark.slow  # 262 s on the 1-core host (two fresh subprocesses
# compiling the full eval stack serially, VERDICT r04 weak #4); the pod
# LAUNCH path stays fast-tier via the two tests above — this adds the
# eval protocol on top and runs in the per-round slow tier
def test_two_process_inception_eval(tmp_path):
    """_maybe_inception_eval in the pod harness (VERDICT r2 next-round #7):
    every process must participate in the jitted sampling + classification
    (SPMD over the global mesh — a chief-only eval would deadlock the
    collectives), and only process 0 logs the scores. Inception weights are
    monkeypatched to tiny random params in each subprocess (zero-egress
    env), exactly like tests/test_inception.py does in-process."""
    port = _free_port()
    save_dir = str(tmp_path / "run")
    # LAZY weight injection: init_params touches jax, which must not
    # initialize the backend before jax.distributed.initialize runs inside
    # train() — so load_params builds the random params on first call
    pre = (
        "import numpy as _np;"
        "import otgan_tpu.eval.inception as _inc;"
        "import otgan_tpu.eval.fid as _fid;"
        "from otgan_tpu.eval import inception_net as _inet;"
        "_inc._variant_cache = 'torchvision';"
        "_inc._BATCH = 2;"
        "_fid._BATCH = 2;"
        "_inc.load_params = lambda path=None: _inc.__dict__.setdefault("
        "'_lazy_p', _inet.init_params(_np.random.default_rng(0),"
        " num_classes=8));"
    )
    args = [
        "--model", "densenet",
        "--layers_per_block", "1",
        "--filters_per_layer", "4",
        "--synthetic_data",
        "--synthetic_size", "16",
        "--batch_size", "8",  # GLOBAL; 4 per process
        "--sinkhorn_lambda", "50.0",
        "--nr_sinkhorn_iter", "5",
        "--max_epochs", "2",
        "--eval_every_epochs", "2",  # fires at epoch 1
        "--inception_samples", "4",
        "--inception_splits", "2",
        "--eval_fid",  # pod FID: per-process real stats, chief-only cache
        "--save_every_epochs", "100",
        "--save_dir", save_dir,
        "--no_use_pallas",
        "--checkpoint_backend", "orbax",
        "--multihost",
        "--coordinator_address", f"127.0.0.1:{port}",
        "--num_processes", "2",
    ]
    procs = [_launch(i, port, save_dir, args, pre=pre) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=560)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"

    # chief-only score logging: raw + EMA scores in the metrics JSONL
    recs = [
        json.loads(l) for l in open(os.path.join(save_dir, "metrics.jsonl"))
    ]
    scored = [r for r in recs if "inception_score" in r]
    ema_scored = [r for r in recs if "ema_inception_score" in r]
    assert len(scored) == 1 and len(ema_scored) == 1, recs
    assert np.isfinite(scored[0]["inception_score"])
    # IS = exp(mean KL) >= 1 mathematically; float accumulation can land
    # an epsilon below with a random-weight classifier (seen: 1 - 2.1e-9)
    assert 1.0 - 1e-6 <= scored[0]["inception_score"] <= 8.0

    # --eval_fid in the pod: every process runs the combined scorer (the
    # sampling is collective), only the chief logs FID and caches the
    # real-data statistics
    fids = [r for r in recs if "fid" in r]
    ema_fids = [r for r in recs if "ema_fid" in r]
    assert len(fids) == 1 and len(ema_fids) == 1, recs
    assert np.isfinite(fids[0]["fid"]) and fids[0]["fid"] >= 0.0
    assert os.path.exists(os.path.join(save_dir, "fid_stats.npz"))
