"""Parity of otgan_tpu.ops.matching vs the numpy oracle transcribed from the
reference (utils/matching.py + toy_example/matching_cpu.py semantics)."""

import numpy as np
import jax.numpy as jnp

from otgan_tpu.ops import (
    match_two_batch,
    match_single_batch,
    match_random,
    calc_distance,
)
from otgan_tpu.ops.costs import scaled_sqeuclidean_cost
from otgan_tpu.ops.matching import calc_distance_mean
from tests import reference_impl as ref


def _features(seed, n, d, normalize=True):
    rng = np.random.default_rng(seed)
    f = rng.standard_normal((n, d)).astype(np.float32)
    if normalize:
        f /= np.linalg.norm(f, axis=1, keepdims=True)
    return f


LAM, ITERS = 50.0, 60  # moderate values: oracle runs float64, we run f32


def test_two_batch_parity():
    fa = _features(10, 64, 32)
    fb = _features(11, 64, 32)
    want = ref.match_two_batch_np(fa, fb, LAM, ITERS)
    got = match_two_batch(jnp.asarray(fa), jnp.asarray(fb), LAM, ITERS)
    for g, w in zip([got.a_a, got.b_b, got.a_b, got.b_a], want[:4]):
        np.testing.assert_allclose(np.asarray(g), w, atol=2e-4)
    assert abs(float(got.entropy) - want[4]) < 1e-3


def test_single_batch_parity():
    fa = _features(12, 48, 24)
    fb = _features(13, 48, 24)
    want = ref.match_single_batch_np(fa, fb, LAM, ITERS)
    got = match_single_batch(jnp.asarray(fa), jnp.asarray(fb), LAM, ITERS)
    for g, w in zip([got.a_a, got.b_b, got.a_b, got.b_a], want[:4]):
        np.testing.assert_allclose(np.asarray(g), w, atol=2e-4)
    assert abs(float(got.entropy) - want[4]) < 1e-3


def test_random_matching_parity():
    fa = _features(14, 64, 8, normalize=False)
    fb = _features(15, 64, 8, normalize=False)
    want = ref.match_random_np(fa, fb, shard_size=8)
    got = match_random(jnp.asarray(fa), jnp.asarray(fb), shard_size=8)
    for g, w in zip([got.a_a, got.b_b, got.a_b, got.b_a], want[:4]):
        np.testing.assert_allclose(np.asarray(g), w, atol=0)
    assert float(got.entropy) == 0.0


def test_calc_distance_parity():
    fa = _features(16, 64, 32)
    fb = _features(17, 64, 32)
    want_m = ref.match_two_batch_np(fa, fb, LAM, ITERS)
    got_m = match_two_batch(jnp.asarray(fa), jnp.asarray(fb), LAM, ITERS)
    want = ref.calc_distance_np(fa, fb, want_m)
    got = calc_distance(jnp.asarray(fa), jnp.asarray(fb), got_m)
    np.testing.assert_allclose(float(got), want, atol=1e-4)


def test_toy_cost_two_batch_parity():
    """Toy pipeline: scaled squared-Euclidean cost, unnormalized 2D-ish
    features (toy_example/matching_cpu.py)."""
    fa = _features(18, 32, 16, normalize=False)
    fb = _features(19, 32, 16, normalize=False)
    want = ref.match_two_batch_np(
        fa, fb, LAM, ITERS, cost_fn=ref.toy_cost_np
    )
    got = match_two_batch(
        jnp.asarray(fa), jnp.asarray(fb), LAM, ITERS,
        cost_fn=scaled_sqeuclidean_cost,
    )
    for g, w in zip([got.a_a, got.b_b, got.a_b, got.b_a], want[:4]):
        np.testing.assert_allclose(np.asarray(g), w, atol=3e-4)
    # toy calc_distance is mean-based / 2 (matching_cpu.py:155-164)
    d = calc_distance_mean(jnp.asarray(fa), jnp.asarray(fb), got)
    d_want = (
        np.mean(fb * want[1]) + np.mean(fa * want[0]) - 2 * np.mean(fa * want[2])
    ) / 2.0
    np.testing.assert_allclose(float(d), d_want, atol=1e-5)


def test_transport_plan_fidelity_identity():
    """When a == b, the single-batch a<->b plan approaches the identity (no
    diag penalty on the cross matrix), while the within-batch plans avoid the
    diagonal (+999 penalty, utils/matching.py:109-110) so the reported
    distance is strictly negative (cross matches beat penalized self ones)."""
    f = _features(20, 32, 64)
    got = match_single_batch(jnp.asarray(f), jnp.asarray(f), 500.0, 200)
    # a_b matched features should be ~= f itself (sharp identity matching)
    np.testing.assert_allclose(np.asarray(got.a_b), f, atol=1e-2)
    d = calc_distance(jnp.asarray(f), jnp.asarray(f), got)
    # d ~= mean cosine-to-nearest-other - mean cosine-to-self (== 1) < 0
    assert float(d) < -1e-3
    assert float(d) > -2.0
