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


def test_bench_e2e_uses_reference_epoch_shape(monkeypatch):
    """The e2e trainer section defaults to the reference's OWN epoch
    shape — 10 steps/epoch (CIFAR-10 50000/5000, train.py:16,23) — so the
    depth-1 prefetcher is measured at steady state, not at the 2-step
    shape where it can hide only half the H2D (DESIGN.md §7 caveat).
    BENCH_E2E_STEPS overrides."""
    import json as _json
    import os as _os

    seen = {}

    def fake_train(cfg):
        seen["cfg"] = cfg
        with open(_os.path.join(cfg.save_dir, "metrics.jsonl"), "w") as f:
            for t in (9.0, 2.0, 2.0):
                f.write(_json.dumps({"epoch_time": t}) + "\n")

    import otgan_tpu.train as train_mod

    monkeypatch.setattr(train_mod, "train", fake_train)
    # keep the attribution half cheap: tiny batch, no device work beyond
    # the loader + one put on the CPU backend
    out = bench._bench_e2e_trainer(16, epochs=3)
    cfg = seen["cfg"]
    assert cfg.synthetic_size == 10 * 16  # 10 steps/epoch default
    # steady-state epochs exclude the first (compile) epoch
    assert out["e2e_epoch_sec"] == 2.0
    import jax

    n_chips = len(jax.devices())
    assert out["e2e_img_per_sec"] == round(10 * 16 / 2.0 / n_chips, 1)
    monkeypatch.setenv("BENCH_E2E_STEPS", "2")
    bench._bench_e2e_trainer(16, epochs=3)
    assert seen["cfg"].synthetic_size == 2 * 16


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


def _patch_sections(monkeypatch):
    """Stub every measured quantity so main() exercises only the emission
    protocol (the measurements themselves are TPU-side)."""
    monkeypatch.setattr(
        bench, "_bench_throughput", lambda *a, **k: 100.0
    )
    monkeypatch.setattr(
        bench, "_bench_e2e_trainer",
        lambda b, epochs=3, remat_policy=None: {"e2e_img_per_sec": 50.0},
    )
    monkeypatch.setattr(
        bench, "_kernel_parity", lambda: {"parity_vmem_768": 0.0}
    )
    monkeypatch.setattr(bench, "_bench_inception", lambda n: (1.0, 1.1))
    monkeypatch.setattr(bench, "_tol_quality", lambda *a, **k: {})


def _json_lines(capsys):
    import json

    out = capsys.readouterr().out
    lines = []
    for line in out.splitlines():
        line = line.strip()
        if line.startswith("{"):
            lines.append(json.loads(line))  # EVERY emitted line must parse
    return lines


def test_bench_emits_incremental_json_supersets(monkeypatch, capsys):
    """Timeout-proof emission (VERDICT r04 missing #1): the headline JSON
    line is printed the moment it is measured, then re-emitted as an
    enriched superset after every section — each line complete and valid,
    last-line-wins."""
    _patch_sections(monkeypatch)
    for var in ("BENCH_E2E", "BENCH_DENSENET", "BENCH_DENSENET_5000",
                "BENCH_PAPER_8000", "BENCH_TOL", "BENCH_INCEPTION",
                "BENCH_PARITY", "BENCH_PRECISION"):
        monkeypatch.setenv(var, "1")
    monkeypatch.setenv("BENCH_TIME_BUDGET", "3600")
    bench.main()
    lines = _json_lines(capsys)
    assert len(lines) >= 8  # headline + one per section + final
    first, last = lines[0], lines[-1]
    assert first["value"] == 100.0 and first["unit"] == "img/s/chip"
    assert "densenet_img_per_sec" not in first  # not yet measured
    # the final line is a superset of the first
    for k in first:
        if k not in ("bench_elapsed_sec", "compile_cache_hits",
                     "compile_cache_misses", "aot_hits", "aot_misses"):
            assert k in last, k
    # every round-3 record key the verdict requires is present
    assert last["trainer_e2e_img_per_sec_b5000"] == 50.0
    assert last["densenet_img_per_sec"] == 100.0
    assert last["densenet_5000_img_per_sec"] == 100.0
    assert last["paper_8000_img_per_sec"] == 100.0
    assert last["tol_img_per_sec"] == 100.0
    assert last["precision_high_img_per_sec"] == 100.0
    assert last["inception_eval_img_per_sec"] == 50000.0
    assert last["small_batch_img_per_sec"] == 100.0
    assert last["parity_vmem_768"] == 0.0
    assert "aot_hits" in last and "cycle_program_cached" in last
    # monotone growth: each emission is a superset of the previous one
    for prev, cur in zip(lines, lines[1:]):
        missing = [
            k for k in prev
            if k not in cur and k != "bench_elapsed_sec"
        ]
        assert missing == [], missing


def test_bench_time_budget_skips_sections_with_keys(monkeypatch, capsys):
    """An exhausted BENCH_TIME_BUDGET stops STARTING sections; each
    skipped section leaves an explicit *_skipped key and the final JSON
    still prints — the record says what was not measured."""
    _patch_sections(monkeypatch)
    for var in ("BENCH_E2E", "BENCH_DENSENET", "BENCH_INCEPTION"):
        monkeypatch.setenv(var, "1")
    monkeypatch.setenv("BENCH_PARITY", "0")
    monkeypatch.setenv("BENCH_DENSENET_5000", "0")
    monkeypatch.setenv("BENCH_PAPER_8000", "0")
    monkeypatch.setenv("BENCH_TOL", "0")
    monkeypatch.setenv("BENCH_SMALL_BATCH", "0")
    monkeypatch.setenv("BENCH_TIME_BUDGET", "0")  # exhausted immediately
    bench.main()
    lines = _json_lines(capsys)
    last = lines[-1]
    assert last["value"] == 100.0  # headline always measured
    assert "BENCH_TIME_BUDGET" in last["trainer_e2e_skipped"]
    assert "BENCH_TIME_BUDGET" in last["densenet_skipped"]
    assert "BENCH_TIME_BUDGET" in last["inception_skipped"]
    assert "densenet_img_per_sec" not in last
    assert "densenet_5000_skipped" not in last  # disabled, not skipped


def test_bench_headline_exception_emits_error_then_fallback(
    monkeypatch, capsys
):
    """A headline EXCEPTION (r05: RESOURCE_EXHAUSTED mid-outage killed the
    process with zero JSON) must emit the provenance-marked error record
    immediately, then retry degraded (unfused + 4-save); a successful
    fallback yields a real record flagged headline_fallback."""
    _patch_sections(monkeypatch)
    calls = {"n": 0}

    def flaky(batch, cycles, remat, profile_dir="", fused=True, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            assert fused  # first attempt is the configured (fused) one
            raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
        assert fused is False  # degraded retry is unfused
        assert kw.get("remat_policy") == bench.DEFAULT_REMAT_POLICY_LARGE
        return 77.0

    monkeypatch.setattr(bench, "_bench_throughput", flaky)
    for var in ("BENCH_E2E", "BENCH_DENSENET", "BENCH_DENSENET_5000",
                "BENCH_PAPER_8000", "BENCH_TOL", "BENCH_INCEPTION",
                "BENCH_PARITY"):
        monkeypatch.setenv(var, "0")
    monkeypatch.setenv("BENCH_SMALL_BATCH", "0")
    bench.main()
    lines = _json_lines(capsys)
    assert lines[0]["metric"] == "bench_error"
    assert "RESOURCE_EXHAUSTED" in lines[0]["error"]
    assert "last_measured" in lines[0]  # record survives even a crash here
    last = lines[-1]
    assert last["value"] == 77.0  # the degraded number is a REAL number
    assert last["headline_fallback"] == "unfused_4save"
    assert "RESOURCE_EXHAUSTED" in last["headline_fused_error"]


def test_bench_headline_double_failure_exits_with_error_record(
    monkeypatch, capsys
):
    """Both headline attempts raising leaves TWO parseable bench_error
    lines (last-line-wins still yields a valid record) and exits 4."""
    import pytest

    _patch_sections(monkeypatch)

    def boom(*a, **k):
        raise RuntimeError("still down")

    monkeypatch.setattr(bench, "_bench_throughput", boom)
    monkeypatch.setenv("BENCH_SMALL_BATCH", "0")
    with pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 4
    lines = _json_lines(capsys)
    assert len(lines) == 2
    assert all(ln["metric"] == "bench_error" for ln in lines)
    assert "degraded" in lines[-1]["error"] or "retry" in lines[-1]["error"]


def test_bench_section_failure_never_sinks_the_record(monkeypatch, capsys):
    """A crashing section records <name>_error and the run continues to
    the final superset."""
    _patch_sections(monkeypatch)

    def boom(*a, **k):
        raise RuntimeError("injected section failure")

    monkeypatch.setattr(bench, "_bench_e2e_trainer", boom)
    monkeypatch.setenv("BENCH_E2E", "1")
    for var in ("BENCH_DENSENET", "BENCH_DENSENET_5000", "BENCH_PAPER_8000",
                "BENCH_TOL", "BENCH_INCEPTION", "BENCH_PARITY"):
        monkeypatch.setenv(var, "0")
    monkeypatch.setenv("BENCH_SMALL_BATCH", "0")
    monkeypatch.setenv("BENCH_TIME_BUDGET", "3600")
    bench.main()
    last = _json_lines(capsys)[-1]
    assert last["value"] == 100.0
    assert "injected section failure" in last["trainer_e2e_error_b5000"]


def test_bench_outage_cascade_skips_remaining_sections(monkeypatch, capsys):
    """Two consecutive sections failing with service-level signatures
    (RESOURCE_EXHAUSTED etc. — the observed r05 post-wedge cascade) mark
    ``outage_suspected`` and SKIP the remaining sections instead of
    re-hitting the wedged execution service; the headline and the final
    superset survive."""
    calls = {"n": 0}

    def thr(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            return 100.0  # the headline measurement succeeds
        raise RuntimeError(
            "RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted)."
        )

    monkeypatch.setattr(bench, "_bench_throughput", thr)

    def e2e(b, epochs=3, remat_policy=None):
        raise RuntimeError(
            "RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted)."
        )

    monkeypatch.setattr(bench, "_bench_e2e_trainer", e2e)
    monkeypatch.setattr(
        bench, "_kernel_parity", lambda: {"parity_vmem_768": 0.0}
    )
    monkeypatch.setattr(bench, "_bench_inception", lambda n: (1.0, 1.1))
    monkeypatch.setattr(bench, "_tol_quality", lambda *a, **k: {})
    for var in ("BENCH_E2E", "BENCH_DENSENET", "BENCH_DENSENET_5000",
                "BENCH_PAPER_8000", "BENCH_TOL", "BENCH_INCEPTION"):
        monkeypatch.setenv(var, "1")
    monkeypatch.setenv("BENCH_PARITY", "0")
    monkeypatch.setenv("BENCH_SMALL_BATCH", "256")
    monkeypatch.setenv("BENCH_TIME_BUDGET", "3600")
    bench.main()
    last = _json_lines(capsys)[-1]
    assert last["value"] == 100.0  # headline preserved
    # streak: trainer_e2e (internal per-batch error channel) + small_batch
    assert "RESOURCE_EXHAUSTED" in last["trainer_e2e_error_b5000"]
    assert "RESOURCE_EXHAUSTED" in last["small_batch_error"]
    assert last["outage_suspected"] is True
    # everything after the second consecutive service failure is skipped,
    # not attempted (the stub would have recorded *_error otherwise)
    for name in ("densenet", "densenet_5000", "paper_8000", "tol",
                 "inception"):
        assert "outage suspected" in last[f"{name}_skipped"]
        assert f"{name}_error" not in last
    assert calls["n"] == 2  # headline + small_batch only
    # the peak headline upgrade is pointless against a wedged service
    assert "outage suspected" in last["headline_peak_skipped"]


def test_bench_non_service_failures_do_not_trip_outage_skip(
    monkeypatch, capsys
):
    """Generic (non-service) section failures never trigger the outage
    skip, and a success in between resets the streak."""
    _patch_sections(monkeypatch)

    def boom(b, epochs=3, remat_policy=None):
        raise RuntimeError("injected non-service failure")

    monkeypatch.setattr(bench, "_bench_e2e_trainer", boom)
    for var in ("BENCH_E2E", "BENCH_DENSENET", "BENCH_TOL"):
        monkeypatch.setenv(var, "1")
    for var in ("BENCH_DENSENET_5000", "BENCH_PAPER_8000",
                "BENCH_INCEPTION", "BENCH_PARITY"):
        monkeypatch.setenv(var, "0")
    monkeypatch.setenv("BENCH_SMALL_BATCH", "256")
    monkeypatch.setenv("BENCH_TIME_BUDGET", "3600")
    bench.main()
    last = _json_lines(capsys)[-1]
    assert "injected non-service failure" in last["trainer_e2e_error_b5000"]
    assert "outage_suspected" not in last
    # later sections ran normally
    assert last["small_batch_img_per_sec"] == 100.0
    assert last["densenet_img_per_sec"] == 100.0
    assert last["tol_img_per_sec"] == 100.0


def test_bench_safe_first_peak_last_headline(monkeypatch, capsys):
    """Safe-first/peak-last: the FIRST emitted line carries the
    under-the-ceiling safe-policy headline; the peak (5-save) program —
    which has wedged the execution service before — runs only after every
    section, as a pure record upgrade."""
    order = []

    def thr(batch, cycles, remat, profile_dir="", fused=True,
            model="dcgan", remat_policy=None, **kw):
        order.append(remat_policy)
        return 90.0 if remat_policy == bench.DEFAULT_REMAT_POLICY_LARGE \
            else 100.0

    monkeypatch.setattr(bench, "_bench_throughput", thr)
    monkeypatch.setattr(
        bench, "_bench_e2e_trainer",
        lambda b, epochs=3, remat_policy=None: {"e2e_img_per_sec": 50.0},
    )
    monkeypatch.setattr(bench, "_tol_quality", lambda *a, **k: {})
    monkeypatch.setenv("BENCH_E2E", "0")
    monkeypatch.setenv("BENCH_TOL", "1")
    for var in ("BENCH_DENSENET", "BENCH_DENSENET_5000", "BENCH_PAPER_8000",
                "BENCH_INCEPTION", "BENCH_PARITY"):
        monkeypatch.setenv(var, "0")
    monkeypatch.setenv("BENCH_SMALL_BATCH", "0")
    monkeypatch.setenv("BENCH_TIME_BUDGET", "3600")
    monkeypatch.delenv("BENCH_REMAT_POLICY", raising=False)
    bench.main()
    lines = _json_lines(capsys)
    first, last = lines[0], lines[-1]
    # safe headline first (4-save), peak upgrade last (5-save)
    assert first["value"] == 90.0
    assert first["remat_policy"] == bench.DEFAULT_REMAT_POLICY_LARGE
    assert last["value"] == 100.0
    assert last["remat_policy"] == bench.DEFAULT_REMAT_POLICY
    assert last["headline_safe_img_per_sec"] == 90.0
    assert last["headline_safe_policy"] == bench.DEFAULT_REMAT_POLICY_LARGE
    # sections (tol) ran BEFORE the peak attempt, both on the safe policy
    assert order[0] == bench.DEFAULT_REMAT_POLICY_LARGE   # headline
    assert order[-1] == bench.DEFAULT_REMAT_POLICY        # peak, last
    assert all(p == bench.DEFAULT_REMAT_POLICY_LARGE for p in order[:-1])
    assert last["tol_img_per_sec"] == 90.0


def test_bench_peak_failure_keeps_safe_headline(monkeypatch, capsys):
    """A peak attempt that raises (the wedge) costs only the upgrade: the
    safe headline and the full record survive, the failure is recorded."""

    def thr(batch, cycles, remat, profile_dir="", fused=True,
            model="dcgan", remat_policy=None, **kw):
        if remat_policy == bench.DEFAULT_REMAT_POLICY:
            raise RuntimeError(
                "RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted)."
            )
        return 90.0

    monkeypatch.setattr(bench, "_bench_throughput", thr)
    for var in ("BENCH_E2E", "BENCH_DENSENET", "BENCH_DENSENET_5000",
                "BENCH_PAPER_8000", "BENCH_TOL", "BENCH_INCEPTION",
                "BENCH_PARITY"):
        monkeypatch.setenv(var, "0")
    monkeypatch.setenv("BENCH_SMALL_BATCH", "0")
    monkeypatch.setenv("BENCH_TIME_BUDGET", "3600")
    monkeypatch.delenv("BENCH_REMAT_POLICY", raising=False)
    bench.main()
    last = _json_lines(capsys)[-1]
    assert last["value"] == 90.0  # safe headline retained
    assert last["remat_policy"] == bench.DEFAULT_REMAT_POLICY_LARGE
    assert "RESOURCE_EXHAUSTED" in last["headline_peak_error"]


def test_bench_explicit_policy_pins_headline_no_peak(monkeypatch, capsys):
    """BENCH_REMAT_POLICY pins the headline policy outright (explicit user
    choice) — no separate peak phase runs."""
    seen = []

    def thr(batch, cycles, remat, profile_dir="", fused=True,
            model="dcgan", remat_policy=None, **kw):
        seen.append(remat_policy)
        return 77.0

    monkeypatch.setattr(bench, "_bench_throughput", thr)
    for var in ("BENCH_E2E", "BENCH_DENSENET", "BENCH_DENSENET_5000",
                "BENCH_PAPER_8000", "BENCH_TOL", "BENCH_INCEPTION",
                "BENCH_PARITY"):
        monkeypatch.setenv(var, "0")
    monkeypatch.setenv("BENCH_SMALL_BATCH", "0")
    monkeypatch.setenv("BENCH_REMAT_POLICY", "")  # full recompute
    bench.main()
    last = _json_lines(capsys)[-1]
    assert last["value"] == 77.0 and last["remat_policy"] == ""
    assert seen == [""]  # one measurement, no peak phase
    assert "headline_peak_error" not in last
    assert "headline_peak_skipped" not in last
