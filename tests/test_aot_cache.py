"""AOT executable cache (``utils/aot_cache.py``, VERDICT r03 next #2 /
r04 next #2): serialized compiled step programs reload across processes/
sessions, keyed on the lowered module bytes — the jax persistent cache's
session-salted key cannot defeat it, and a key collision cannot serve a
stale program (byte-identical module = identical program by construction).

The cache is TPU-gated (``Engine.enable_aot_cache``): XLA:CPU's AOT
loader is known to deserialize executables whose outputs are
unmaterializable at readback (VERDICT r04 weak #1), so on CPU the engine
refuses the cache outright and these tests exercise the gate, the
smoke-validation degrade path (``OTGAN_AOT_FORCE=1`` bypasses the gate),
and the first-call execution guard with deterministic fault injection."""

import os

import numpy as np
import pytest

from otgan_tpu.config import TrainConfig
from otgan_tpu.data.toy import sample_8gaussians
from otgan_tpu.engine import Engine
from otgan_tpu.utils.aot_cache import AotCache


def _cfg(**kw):
    base = dict(
        model="toy_mlp",
        batch_size=64,
        sinkhorn_lambda=50.0,
        nr_sinkhorn_iter=8,
        use_pallas=False,
    )
    base.update(kw)
    return TrainConfig(**base)


def _x(seed=0):
    return np.asarray(sample_8gaussians(np.random.default_rng(seed), 64))


@pytest.fixture
def force_aot(monkeypatch):
    """Bypass the TPU backend gate so the full cache path runs on CPU."""
    monkeypatch.setenv("OTGAN_AOT_FORCE", "1")


def test_aot_cache_gated_off_on_cpu(tmp_path):
    """On a non-TPU backend the engine refuses the AOT cache (the known
    XLA:CPU poisoned-deserialize failure mode) and the plain jit path
    carries the steps untouched."""
    eng = Engine(_cfg())
    assert eng.enable_aot_cache(str(tmp_path)) is None
    assert eng.aot_cache is None
    s, _ = eng.init_state(0, eng.shard(_x()))
    _, met = eng.gen_step(s, eng.shard(_x(1)))
    assert np.isfinite(float(met.dist))
    assert os.listdir(tmp_path) == []  # nothing written


def test_aot_cache_round_trip(tmp_path, force_aot):
    """miss -> serialize on first engine; on a fresh engine the entry is
    either served (validated hit) or — on backends whose deserialized
    executables fail smoke validation, e.g. XLA:CPU — evicted and
    recompiled. BOTH outcomes must yield results identical to the plain
    jit path; the telemetry must say which happened."""
    # plain path (no cache) as the ground truth
    eng0 = Engine(_cfg())
    s0, _ = eng0.init_state(0, eng0.shard(_x()))
    s0, met0 = eng0.gen_step(s0, eng0.shard(_x(1)))

    eng1 = Engine(_cfg())
    c1 = eng1.enable_aot_cache(str(tmp_path))
    s1, _ = eng1.init_state(0, eng1.shard(_x()))
    s1, met1 = eng1.gen_step(s1, eng1.shard(_x(1)))
    assert c1.summary()["aot_misses"] == ["gen_step_toy_mlp_b64"]
    assert len(os.listdir(tmp_path)) == 1  # one serialized executable

    (entry,) = os.listdir(tmp_path)
    entry = os.path.join(tmp_path, entry)
    os.utime(entry, (1000, 1000))  # backdate: a clean hit must refresh mtime

    eng2 = Engine(_cfg())  # fresh engine = fresh jit closures
    c2 = eng2.enable_aot_cache(str(tmp_path))
    s2, _ = eng2.init_state(0, eng2.shard(_x()))
    s2, met2 = eng2.gen_step(s2, eng2.shard(_x(1)))
    summ = c2.summary()
    if summ["aot_hits"] == ["gen_step_toy_mlp_b64"]:
        # clean validated hit: LRU clock refreshed, no errors
        assert os.stat(entry).st_mtime > 1000
        assert summ["aot_errors"] == 0
    else:
        # smoke validation rejected the deserialized executable (the
        # XLA:CPU failure mode): entry evicted, recompiled, rewritten
        assert summ["aot_errors"] >= 1
        assert summ["aot_misses"] == ["gen_step_toy_mlp_b64"]

    assert float(met0.dist) == float(met1.dist) == float(met2.dist)
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(s1.gen_params),
        jax.tree_util.tree_leaves(s2.gen_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_aot_cache_key_separates_programs(tmp_path, force_aot):
    """Different configs (different lowered modules) get different cache
    entries — no cross-config reuse."""
    eng_a = Engine(_cfg())
    eng_a.enable_aot_cache(str(tmp_path))
    sa, _ = eng_a.init_state(0, eng_a.shard(_x()))
    eng_a.gen_step(sa, eng_a.shard(_x(1)))

    eng_b = Engine(_cfg(nr_sinkhorn_iter=9))  # program differs
    cb = eng_b.enable_aot_cache(str(tmp_path))
    sb, _ = eng_b.init_state(0, eng_b.shard(_x()))
    eng_b.gen_step(sb, eng_b.shard(_x(1)))
    assert cb.summary()["aot_misses"] == ["gen_step_toy_mlp_b64"]
    assert len(os.listdir(tmp_path)) == 2


def test_aot_poisoned_validation_degrades(tmp_path, force_aot, monkeypatch):
    """Deterministic fault injection: a deserialized executable that fails
    when executed is caught by SMOKE VALIDATION (before any trainer state
    is at risk), evicted, and the program recompiles — results correct,
    the failure visible in aot_errors, never recorded as a hit."""
    eng = Engine(_cfg())
    eng.enable_aot_cache(str(tmp_path))
    s, _ = eng.init_state(0, eng.shard(_x()))
    _, met_ref = eng.gen_step(s, eng.shard(_x(1)))
    (name,) = os.listdir(tmp_path)

    from jax.experimental import serialize_executable as se

    def _poisoned(payload, in_tree, out_tree):
        def fn(*a):
            raise RuntimeError("NOT_FOUND: Buffer Definition Event (injected)")

        return fn

    monkeypatch.setattr(se, "deserialize_and_load", _poisoned)
    eng2 = Engine(_cfg())
    c2 = eng2.enable_aot_cache(str(tmp_path))
    s2, _ = eng2.init_state(0, eng2.shard(_x()))
    _, met2 = eng2.gen_step(s2, eng2.shard(_x(1)))
    assert float(met2.dist) == float(met_ref.dist)
    summ = c2.summary()
    assert summ["aot_hits"] == []  # never trusted
    assert summ["aot_errors"] >= 1
    assert summ["aot_misses"] == ["gen_step_toy_mlp_b64"]  # recompiled
    # the poisoned entry was evicted, then rewritten whole by the recompile
    assert os.path.exists(os.path.join(tmp_path, name))


def test_aot_execution_guard_last_line_of_defense(
    tmp_path, force_aot, monkeypatch
):
    """With smoke validation opted out, a poisoned executable is still
    caught by the FIRST-CALL execution guard in ``AotJit.__call__``: the
    entry is evicted and — the failure happening before donation — the
    call transparently retries on the plain jit path (VERDICT r04 weak
    #1b: a poisoned serialized entry must never take a trainer down)."""
    eng = Engine(_cfg())
    eng.enable_aot_cache(str(tmp_path))
    s, _ = eng.init_state(0, eng.shard(_x()))
    _, met_ref = eng.gen_step(s, eng.shard(_x(1)))
    (name,) = os.listdir(tmp_path)

    monkeypatch.setenv("OTGAN_AOT_VALIDATE", "0")
    from jax.experimental import serialize_executable as se

    def _poisoned(payload, in_tree, out_tree):
        def fn(*a):
            raise RuntimeError("injected poisoned executable")

        return fn

    monkeypatch.setattr(se, "deserialize_and_load", _poisoned)
    eng2 = Engine(_cfg())
    c2 = eng2.enable_aot_cache(str(tmp_path))
    s2, _ = eng2.init_state(0, eng2.shard(_x()))
    s2, met2 = eng2.gen_step(s2, eng2.shard(_x(1)))  # guard catches + retries
    assert float(met2.dist) == float(met_ref.dist)
    assert c2.summary()["aot_errors"] >= 1
    assert not os.path.exists(os.path.join(tmp_path, name))  # evicted
    # subsequent calls run unguarded on the plain path
    s2, met3 = eng2.gen_step(s2, eng2.shard(_x(2)))
    assert np.isfinite(float(met3.dist))


def test_aot_cache_lru_prune(tmp_path):
    """The on-disk budget holds: oldest-mtime entries are evicted at init
    and after writes; the just-written entry is never the victim; a hit
    refreshes the LRU clock (verified through the real compile path in
    test_aot_cache_round_trip)."""
    names = ["a-1.jaxexec", "b-2.jaxexec", "c-3.jaxexec"]
    for i, name in enumerate(names):
        p = tmp_path / name
        p.write_bytes(b"x" * 1000)
        os.utime(p, (1000 + i, 1000 + i))
    # init-time prune: budget fits two entries -> the oldest goes
    AotCache(str(tmp_path), max_bytes=2500)
    assert sorted(os.listdir(tmp_path)) == ["b-2.jaxexec", "c-3.jaxexec"]

    # keep= protects the just-written entry even when it is the oldest
    c = AotCache(str(tmp_path), max_bytes=0)  # unbounded: no init prune
    c.max_bytes = 1500  # fits one entry
    c._prune(keep=str(tmp_path / "b-2.jaxexec"))
    assert os.listdir(tmp_path) == ["b-2.jaxexec"]
    assert c.errors == []

    # non-entry files are never touched
    (tmp_path / "journal.txt").write_bytes(b"y" * 100000)
    c._prune()
    assert (tmp_path / "journal.txt").exists()


def test_aot_cache_env_budget(tmp_path, monkeypatch):
    """OTGAN_AOT_CACHE_MAX_GB configures the default budget; <= 0 disables
    pruning entirely."""
    monkeypatch.setenv("OTGAN_AOT_CACHE_MAX_GB", "0")
    assert AotCache(str(tmp_path)).max_bytes == 0
    monkeypatch.setenv("OTGAN_AOT_CACHE_MAX_GB", "1.5")
    assert AotCache(str(tmp_path)).max_bytes == int(1.5e9)
    monkeypatch.delenv("OTGAN_AOT_CACHE_MAX_GB")
    assert AotCache(str(tmp_path)).max_bytes == int(20e9)


def test_aot_cache_key_folds_env(tmp_path, force_aot, monkeypatch):
    """XLA_FLAGS participates in the cache key (ADVICE r04: flags change
    codegen without changing the module bytes) — flipping a flag must
    produce a second entry, not a hit on the first."""
    eng_a = Engine(_cfg())
    eng_a.enable_aot_cache(str(tmp_path))
    sa, _ = eng_a.init_state(0, eng_a.shard(_x()))
    eng_a.gen_step(sa, eng_a.shard(_x(1)))
    assert len(os.listdir(tmp_path)) == 1

    monkeypatch.setenv(
        "XLA_FLAGS",
        os.environ.get("XLA_FLAGS", "") + " --xla_dummy_distinct_flag",
    )
    eng_b = Engine(_cfg())
    cb = eng_b.enable_aot_cache(str(tmp_path))
    sb, _ = eng_b.init_state(0, eng_b.shard(_x()))
    eng_b.gen_step(sb, eng_b.shard(_x(1)))
    assert cb.summary()["aot_misses"] == ["gen_step_toy_mlp_b64"]
    assert len(os.listdir(tmp_path)) == 2


def test_aot_corrupt_entry_recompiles(tmp_path, force_aot):
    """A truncated/corrupt cache file degrades to a recompile (and the
    entry is rewritten), never a crash."""
    eng = Engine(_cfg())
    c = eng.enable_aot_cache(str(tmp_path))
    s, _ = eng.init_state(0, eng.shard(_x()))
    eng.gen_step(s, eng.shard(_x(1)))
    (name,) = os.listdir(tmp_path)
    with open(os.path.join(tmp_path, name), "wb") as f:
        f.write(b"garbage")

    eng2 = Engine(_cfg())
    c2 = eng2.enable_aot_cache(str(tmp_path))
    s2, _ = eng2.init_state(0, eng2.shard(_x()))
    _, met = eng2.gen_step(s2, eng2.shard(_x(1)))
    assert np.isfinite(float(met.dist))
    summ = c2.summary()
    assert summ["aot_errors"] >= 1 and summ["aot_misses"]
    # entry was rewritten whole
    assert os.path.getsize(os.path.join(tmp_path, name)) > 1000


# -- first-call execution-guard eviction semantics (white-box: the guard
# is exercised directly with injected executables; r05 observed an
# outage-time RESOURCE_EXHAUSTED cascade evicting a valid paper-scale
# entry — eviction must discriminate entry poison from a broken
# environment) --

from otgan_tpu.utils.aot_cache import AotJit  # noqa: E402


def _resource_error(*a):
    raise RuntimeError(
        "RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted)."
    )


def _make(tmp_path, plain_fn):
    entry_file = tmp_path / "prog-1.jaxexec"
    entry_file.write_bytes(b"x")
    cache = AotCache(str(tmp_path), max_bytes=0)
    return entry_file, cache, AotJit(plain_fn, cache, "prog")


def test_aot_guard_keeps_entry_when_environment_broken(tmp_path):
    """RESOURCE_EXHAUSTED at first execution whose plain-jit retry ALSO
    fails is an environment outage, not entry poison: the entry is KEPT
    for the healthy-session rerun and the failure propagates."""
    entry_file, cache, j = _make(tmp_path, _resource_error)
    entry = [_resource_error, True, str(entry_file)]
    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        j._guarded_first_call(entry, (np.zeros(2),))
    assert entry_file.exists()  # NOT evicted — the environment failed
    assert cache.errors  # but the failure is visible in telemetry


def test_aot_guard_evicts_when_plain_path_proves_entry_bad(tmp_path):
    """The same first-execution failure whose plain-jit retry SUCCEEDS on
    identical host state proves the entry itself bad: evicted, and the
    retry's result is returned transparently."""
    entry_file, cache, j = _make(tmp_path, lambda *a: np.float64(7.0))
    entry = [_resource_error, True, str(entry_file)]
    out = j._guarded_first_call(entry, (np.zeros(2),))
    assert float(out) == 7.0
    assert not entry_file.exists()  # evicted: plain jit succeeded
    # subsequent calls through the entry run the plain path unguarded
    assert entry[0] is j._jitted and entry[1] is False


def test_aot_guard_donated_resource_exhausted_keeps_entry(tmp_path):
    """After donation no retry is possible; a RESOURCE_EXHAUSTED there is
    still an environment signature — keep the entry, propagate the
    original error (a structural failure after donation keeps the old
    evict-and-name-the-entry behavior, tested below)."""

    class _DonatedLeaf:
        def is_deleted(self):
            return True

    entry_file, cache, j = _make(tmp_path, lambda *a: np.float64(7.0))
    entry = [_resource_error, True, str(entry_file)]
    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        j._guarded_first_call(entry, (_DonatedLeaf(),))
    assert entry_file.exists()


def test_aot_guard_donated_structural_failure_evicts(tmp_path):
    """A structural (non-resource) failure after donation evicts the
    poisoned entry and raises the informative error naming it."""

    class _DonatedLeaf:
        def is_deleted(self):
            return True

    def _poison(*a):
        raise RuntimeError("NOT_FOUND: Buffer Definition Event (injected)")

    entry_file, cache, j = _make(tmp_path, lambda *a: np.float64(7.0))
    entry = [_poison, True, str(entry_file)]
    with pytest.raises(RuntimeError, match="poisoned executable"):
        j._guarded_first_call(entry, (_DonatedLeaf(),))
    assert not entry_file.exists()
