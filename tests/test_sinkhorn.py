"""Sinkhorn core unit tests (SURVEY.md section 4 item (a))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from otgan_tpu.ops.sinkhorn import (
    sinkhorn_log,
    sinkhorn_assignment,
    assignment_and_entropy,
)
from tests.reference_impl import sinkhorn_np


def _rand_features(rng, n, d):
    f = rng.standard_normal((n, d)).astype(np.float32)
    return f / np.linalg.norm(f, axis=1, keepdims=True)


def test_matches_naive_full_matrix_recursion():
    """Potential-form loop == the reference's full-matrix update recursion."""
    rng = np.random.default_rng(0)
    cost = 1.0 - _rand_features(rng, 48, 16) @ _rand_features(rng, 48, 16).T
    lam, iters = 50.0, 40
    p_ref, ent_ref = sinkhorn_np(cost, lam, iters)
    p, ent = sinkhorn_assignment(jnp.asarray(cost), lam, iters)
    np.testing.assert_allclose(np.asarray(p), p_ref, atol=1e-5)
    assert abs(float(ent) - ent_ref) < 1e-4


def test_doubly_stochastic_convergence():
    rng = np.random.default_rng(1)
    cost = 1.0 - _rand_features(rng, 64, 32) @ _rand_features(rng, 64, 32).T
    log_a, _, _ = sinkhorn_log(-100.0 * jnp.asarray(cost), 300)
    p = np.exp(np.asarray(log_a, np.float64))
    # rows are one col-update stale; convergence at lam=100 is ~1e-3-slow
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-2)
    np.testing.assert_allclose(p.sum(axis=0), 1.0, atol=1e-4)


def test_stability_reference_defaults_lam500_iters500():
    """lam=500, 500 iters (reference train.py defaults) stays finite in f32
    and sharpens toward a permutation-like assignment."""
    rng = np.random.default_rng(2)
    fa = _rand_features(rng, 128, 64)
    fb = _rand_features(rng, 128, 64)
    cost = 1.0 - fa @ fb.T
    p, ent = sinkhorn_assignment(jnp.asarray(cost), 500.0, 500)
    p = np.asarray(p)
    assert np.all(np.isfinite(p))
    assert np.isfinite(float(ent))
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-4)
    # sharp assignment: entropy well below log(N)
    assert float(ent) < 0.5 * np.log(128)


def test_batched_matches_loop():
    rng = np.random.default_rng(3)
    costs = rng.random((4, 32, 32)).astype(np.float32)
    p_b, ent_b = sinkhorn_assignment(jnp.asarray(costs), 30.0, 25)
    for i in range(4):
        p_i, ent_i = sinkhorn_assignment(jnp.asarray(costs[i]), 30.0, 25)
        np.testing.assert_allclose(np.asarray(p_b[i]), np.asarray(p_i), atol=1e-6)
        np.testing.assert_allclose(float(ent_b[i]), float(ent_i), atol=1e-6)


def test_huge_diagonal_penalty_stays_stable():
    """+999*lam diag (single-batch mode) must not overflow the log domain."""
    rng = np.random.default_rng(4)
    f = _rand_features(rng, 32, 16)
    cost = 1.0 - f @ f.T + 999.0 * np.eye(32, dtype=np.float32)
    p, _ = sinkhorn_assignment(jnp.asarray(cost), 500.0, 100)
    p = np.asarray(p)
    assert np.all(np.isfinite(p))
    assert float(np.max(np.diag(p))) < 1e-6  # self-matches suppressed


def test_rectangular_cost():
    rng = np.random.default_rng(5)
    cost = rng.random((24, 40)).astype(np.float32)
    p_ref, ent_ref = sinkhorn_np(cost, 20.0, 30)
    p, ent = sinkhorn_assignment(jnp.asarray(cost), 20.0, 30)
    np.testing.assert_allclose(np.asarray(p), p_ref, atol=1e-5)
    assert abs(float(ent) - ent_ref) < 1e-4


def test_entropy_definition():
    """Entropy == mean Shannon entropy of row-softmax of log_a."""
    rng = np.random.default_rng(6)
    log_a = jnp.asarray(rng.standard_normal((16, 16)).astype(np.float32))
    p, ent = assignment_and_entropy(log_a)
    p_np = np.asarray(p, np.float64)
    want = np.mean(-np.sum(p_np * np.log(p_np), axis=1))
    np.testing.assert_allclose(float(jnp.mean(ent)), want, atol=1e-5)


def test_early_exit_matches_fixed_iterations():
    """tol path == fixed-count path once converged, with fewer iterations."""
    from otgan_tpu.ops.sinkhorn import sinkhorn_log_tol

    rng = np.random.default_rng(7)
    fa = _rand_features(rng, 96, 48)
    fb = _rand_features(rng, 96, 48)
    x = -50.0 * jnp.asarray(1.0 - fa @ fb.T)

    log_fixed, _, _ = sinkhorn_log(x, 500)
    log_tol, iters = sinkhorn_log_tol(x, 500, tol=1e-3)
    p_fixed, e_fixed = assignment_and_entropy(log_fixed)
    p_tol, e_tol = assignment_and_entropy(log_tol)
    np.testing.assert_allclose(np.asarray(p_tol), np.asarray(p_fixed), atol=5e-4)
    np.testing.assert_allclose(float(jnp.mean(e_tol)), float(jnp.mean(e_fixed)), atol=1e-4)
    assert int(iters) < 500  # actually exited early


def test_early_exit_respects_max_iters():
    from otgan_tpu.ops.sinkhorn import sinkhorn_log_tol

    rng = np.random.default_rng(8)
    x = -500.0 * jnp.asarray(rng.random((32, 32)).astype(np.float32))
    _, iters = sinkhorn_log_tol(x, 7, tol=0.0)  # tol=0 never converges
    assert int(iters) == 7
