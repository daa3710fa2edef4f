"""Pallas fused Sinkhorn kernel vs the XLA reference path (interpreter mode
on CPU; the same kernel compiles on TPU — exercised by bench/driver runs)."""

import numpy as np
import jax.numpy as jnp

from otgan_tpu.ops.sinkhorn import sinkhorn_assignment
from otgan_tpu.ops.sinkhorn_pallas import (
    pallas_supported,
    sinkhorn_assignment_pallas,
)


def _cost(seed, n, m, d=32):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, d)).astype(np.float32)
    b = rng.standard_normal((m, d)).astype(np.float32)
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    return 1.0 - a @ b.T


def test_pallas_supported_gate():
    assert pallas_supported(128, 128)
    assert pallas_supported(768, 768)
    assert not pallas_supported(100, 128)  # sublane misalignment
    assert not pallas_supported(128, 100)  # lane misalignment
    assert not pallas_supported(1024, 1024)  # VMEM budget


def test_kernel_matches_xla_path():
    cost = jnp.asarray(_cost(0, 128, 128))
    p_ref, e_ref = sinkhorn_assignment(cost, 50.0, 60)
    p, e = sinkhorn_assignment_pallas(cost, 50.0, 60)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), atol=1e-5)
    np.testing.assert_allclose(float(e), float(e_ref), atol=1e-4)


def test_kernel_batched():
    costs = jnp.stack([jnp.asarray(_cost(i, 64, 128)) for i in range(3)])
    p, e = sinkhorn_assignment_pallas(costs, 30.0, 40)
    assert p.shape == (3, 64, 128) and e.shape == (3,)
    for i in range(3):
        p_i, e_i = sinkhorn_assignment(costs[i], 30.0, 40)
        np.testing.assert_allclose(np.asarray(p[i]), np.asarray(p_i), atol=1e-5)
        np.testing.assert_allclose(float(e[i]), float(e_i), atol=1e-4)


def test_kernel_extreme_lambda_diag_penalty():
    """lam=500 with the +999 single-batch diagonal: finite, self-match-free
    (the hardest numeric regime the reference runs, train.py:25-26)."""
    cost = jnp.asarray(_cost(1, 128, 128) + 999.0 * np.eye(128, dtype=np.float32))
    p, e = sinkhorn_assignment_pallas(cost, 500.0, 100)
    p = np.asarray(p)
    assert np.all(np.isfinite(p)) and np.isfinite(float(e))
    assert float(np.max(np.diag(p))) < 1e-6
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-4)


def test_fallback_for_unsupported_shapes():
    cost = jnp.asarray(_cost(2, 96, 100))  # lane-misaligned -> XLA fallback
    p, e = sinkhorn_assignment_pallas(cost, 20.0, 30)
    p_ref, e_ref = sinkhorn_assignment(cost, 20.0, 30)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), atol=1e-6)


def test_use_pallas_through_public_api():
    from otgan_tpu.ops import match_two_batch

    rng = np.random.default_rng(3)
    f = rng.standard_normal((256, 32)).astype(np.float32)
    f /= np.linalg.norm(f, axis=1, keepdims=True)
    g = rng.standard_normal((256, 32)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    m_p = match_two_batch(jnp.asarray(f), jnp.asarray(g), 50.0, 30, use_pallas=True)
    m_x = match_two_batch(jnp.asarray(f), jnp.asarray(g), 50.0, 30, use_pallas=False)
    np.testing.assert_allclose(
        np.asarray(m_p.a_b), np.asarray(m_x.a_b), atol=1e-5
    )
    np.testing.assert_allclose(
        float(m_p.entropy), float(m_x.entropy), atol=1e-4
    )
