"""--matching_precision plumbing (ops/costs.py, ops/matching.py,
parallel/*, engine.py).

The knob trades matching-matmul accuracy for MXU throughput on TPU
(HIGHEST = full-accuracy multi-pass f32, HIGH = 3-pass bf16 decomposition,
DEFAULT = single bf16 pass). On XLA:CPU every precision lowers to the same
f32 dot, so these tests can assert EXACT equality across settings — they
prove the knob threads through every matcher tier without changing the
math, while the accuracy/speed trade itself is measured on hardware
(docs/DESIGN.md section 7). The reference has no such knob: its cuBLAS
matmuls are always plain f32 (utils/matching.py:41-43,64-75)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otgan_tpu.config import TrainConfig
from otgan_tpu.engine import Engine
from otgan_tpu.ops.costs import PRECISIONS, cosine_cost, resolve_precision
from otgan_tpu.ops.matching import match_single_batch, match_two_batch


def _features(seed, n=32, d=48):
    k = jax.random.PRNGKey(seed)
    f = jax.random.normal(k, (n, d), jnp.float32)
    return f / jnp.linalg.norm(f, axis=-1, keepdims=True)


def test_resolve_precision_values():
    assert resolve_precision(None) == jax.lax.Precision.HIGHEST
    for name, want in PRECISIONS.items():
        assert resolve_precision(name) == want
        assert resolve_precision(want) == want  # Precision passes through
    with pytest.raises(ValueError, match="matching precision"):
        resolve_precision("fast")


@pytest.mark.parametrize("precision", ["highest", "high", "default"])
def test_global_matchers_identical_across_precisions_on_cpu(precision):
    fa, fb = _features(0), _features(1)
    for match in (match_two_batch, match_single_batch):
        base = match(fa, fb, lam=50.0, n_iters=8)
        out = match(fa, fb, lam=50.0, n_iters=8, precision=precision)
        for x, y in zip(base, out):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_cost_fn_precision_kwarg_matches_default_on_cpu():
    fa, fb = _features(2), _features(3)
    base = cosine_cost(fa, fb)
    for name in PRECISIONS:
        np.testing.assert_array_equal(
            np.asarray(base), np.asarray(cosine_cost(fa, fb, precision=name))
        )


def test_default_lowering_still_pins_highest_precision():
    """Invariant guard (CLAUDE.md): with the knob unset, the cost matmul
    must still lower with HIGHEST precision — the reference-parity
    configuration every measured table and parity test assumes."""
    fa, fb = _features(6, n=8, d=8), _features(7, n=8, d=8)
    txt = jax.jit(cosine_cost).lower(fa, fb).as_text()
    assert "HIGHEST" in txt, txt
    hi = jax.jit(
        lambda a, b: cosine_cost(a, b, precision="high")
    ).lower(fa, fb).as_text()
    assert "HIGHEST" not in hi  # the knob actually changes the lowering


def _toy_cfg(**kw):
    base = dict(
        model="toy_mlp",
        batch_size=64,
        sinkhorn_lambda=50.0,
        nr_sinkhorn_iter=8,
        use_pallas=False,
    )
    base.update(kw)
    return TrainConfig(**base)


@pytest.mark.parametrize("layout", ["rows", "matrices"])
def test_engine_sharded_matchers_thread_precision(layout):
    """The 8-device engine matchers (row-sharded AND matrix-parallel) accept
    the knob and, on CPU, produce the exact default-precision outputs."""
    fa, fb = _features(4, n=64, d=16), _features(5, n=64, d=16)
    outs = {}
    for prec in ("highest", "high"):
        eng = Engine(_toy_cfg(matching_layout=layout, matching_precision=prec))
        outs[prec] = eng._matcher(eng.shard(fa), eng.shard(fb))
    for x, y in zip(outs["highest"], outs["high"]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_engine_rejects_invalid_matching_precision():
    with pytest.raises(ValueError, match="matching precision"):
        Engine(_toy_cfg(matching_precision="fast"))


def test_matching_precision_cli_flag_round_trips(tmp_path):
    from otgan_tpu.config import parse_args

    cfg = parse_args(["--matching_precision", "high"])
    assert cfg.matching_precision == "high"
    cfg.save(str(tmp_path / "config.json"))
    assert TrainConfig.load(
        str(tmp_path / "config.json")
    ).matching_precision == "high"
    assert parse_args([]).matching_precision == "highest"
