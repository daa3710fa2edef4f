"""CPU-testable bench.py plumbing (no real compiles — the measurement
itself is TPU-side).

Two contracts worth locking: ``_bench_throughput`` must thread extra
config (grad_accum, init_batch_size, ...) into TrainConfig, and
``_time_cycles`` must init on the ``init_batch_size`` prefix — the
data-dependent init runs with no remat and OOMs at deep-family scale
long before the accumulated train step does (DESIGN.md section 7).
"""

import sys
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, "/root/repo")  # bench.py lives at the repo root
import bench  # noqa: E402

from otgan_tpu.config import TrainConfig  # noqa: E402


def test_bench_throughput_threads_config(monkeypatch):
    seen = {}

    def fake_time_cycles(eng, cfg, batch, cycles, profile_dir="", fused=True):
        seen["cfg"] = cfg
        seen["batch"] = batch
        seen["fused"] = fused
        return 1.0, cfg.nr_gen_per_disc + 1

    monkeypatch.setattr(bench, "_time_cycles", fake_time_cycles)
    img_per_sec = bench._bench_throughput(
        5000, 2, remat=True, fused=False, model="densenet",
        remat_policy="", grad_accum=40, init_batch_size=250,
    )
    cfg = seen["cfg"]
    assert cfg.model == "densenet"
    assert cfg.grad_accum == 40
    assert cfg.init_batch_size == 250
    assert cfg.remat and cfg.remat_policy == ""
    assert seen["batch"] == 5000 and seen["fused"] is False
    # 6 steps x 5000 img / 1 s / n_chips
    assert np.isfinite(img_per_sec) and img_per_sec > 0


class _FakeEngine:
    """Duck-typed engine: records the init batch, steps return instantly."""

    def __init__(self):
        self.init_rows = None

    def shard(self, x):
        return x

    def shard_steps(self, xs):
        return xs

    def init_state(self, seed, x_init):
        self.init_rows = int(x_init.shape[0])
        return "state", 7

    def _step(self, state, x):
        return state, SimpleNamespace(dist=np.float32(0.25))

    disc_step = gen_step = _step

    def cycle_step(self, state, xs):
        return state, SimpleNamespace(
            dist=np.full((xs.shape[0],), 0.25, np.float32)
        )


def test_time_cycles_inits_on_prefix():
    cfg = TrainConfig(batch_size=64, init_batch_size=8, nr_gen_per_disc=1)
    eng = _FakeEngine()
    sec, per_cycle = bench._time_cycles(eng, cfg, 64, cycles=2, fused=False)
    assert eng.init_rows == 8  # the prefix, not the full batch
    assert per_cycle == 2 and sec >= 0


def test_time_cycles_full_batch_init_by_default():
    cfg = TrainConfig(batch_size=64, nr_gen_per_disc=1)
    eng = _FakeEngine()
    sec, per_cycle = bench._time_cycles(eng, cfg, 64, cycles=1, fused=True)
    assert eng.init_rows == 64


def test_init_error_payload_carries_last_measured_record():
    """Outage-time bench output must still surface the round's measured
    numbers — as a provenance-marked record, never as a fresh value."""
    err = bench._init_error_payload(600.0)
    assert err["metric"] == "bench_error" and err["value"] == 0
    assert "outage" in err["error"]
    rec = err["last_measured"]  # artifact must exist and parse
    assert "NOT a fresh measurement" in rec["provenance"]
    assert rec["value"] > 0 and rec["unit"] == "img/s/chip"
    assert rec["paper_8000_img_per_sec"] > 0
