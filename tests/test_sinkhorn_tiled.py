"""Streaming (HBM-tiled) Sinkhorn kernel vs the XLA path."""

import numpy as np
import jax.numpy as jnp

from otgan_tpu.ops.sinkhorn import sinkhorn_assignment
from otgan_tpu.ops.sinkhorn_pallas_tiled import (
    sinkhorn_assignment_tiled,
    tiled_supported,
)


def _cost(seed, n, m, d=32):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, d)).astype(np.float32)
    b = rng.standard_normal((m, d)).astype(np.float32)
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    return 1.0 - a @ b.T


def test_gate():
    assert tiled_supported(256, 128)
    assert not tiled_supported(100, 128)  # panel misalignment
    assert not tiled_supported(256, 100)  # lane misalignment
    # very wide m: even the smallest 128-row panel exceeds the VMEM
    # budget — must route to XLA, not dispatch an over-budget kernel
    from otgan_tpu.ops import sinkhorn_pallas_tiled as tk

    assert not tiled_supported(12800, 12800)
    assert tk._pick_panel(12800, 12800) is None


def test_tiled_matches_xla():
    cost = jnp.asarray(_cost(0, 256, 128))
    p_ref, e_ref = sinkhorn_assignment(cost, 50.0, 40)
    p, e = sinkhorn_assignment_tiled(cost, 50.0, 40)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), atol=1e-5)
    np.testing.assert_allclose(float(e), float(e_ref), atol=1e-4)


def test_tiled_batched_and_extreme_lambda():
    costs = jnp.stack(
        [jnp.asarray(_cost(i, 128, 128) + 999.0 * np.eye(128, dtype=np.float32))
         for i in range(2)]
    )
    p, e = sinkhorn_assignment_tiled(costs, 500.0, 60)
    p_ref, e_ref = sinkhorn_assignment(costs, 500.0, 60)
    assert np.all(np.isfinite(np.asarray(p)))
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(e), np.asarray(e_ref), atol=1e-4)


def test_unsupported_shape_falls_back():
    cost = jnp.asarray(_cost(3, 96, 100))
    p, e = sinkhorn_assignment_tiled(cost, 20.0, 20)
    p_ref, e_ref = sinkhorn_assignment(cost, 20.0, 20)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), atol=1e-6)


def test_resident_single_panel_matches_xla():
    """Matrices under the residency ceiling run as ONE full-height panel
    (sublane-aligned rows suffice; no 128-row panel alignment needed)."""
    from otgan_tpu.ops import sinkhorn_pallas_tiled as tk

    assert tk._pick_panel(136, 128) == 136  # resident despite 136 % 128 != 0
    assert tiled_supported(136, 128)
    cost = jnp.asarray(_cost(3, 136, 128))
    p_ref, e_ref = sinkhorn_assignment(cost, 50.0, 40)
    p, e = sinkhorn_assignment_tiled(cost, 50.0, 40)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), atol=1e-5)
    np.testing.assert_allclose(float(e), float(e_ref), atol=1e-4)


def test_streaming_multi_panel_matches_xla(monkeypatch):
    """Force the streaming schedule (resident ceiling -> 0) and check the
    online column-LSE accumulation against XLA across panels."""
    from otgan_tpu.ops import sinkhorn_pallas_tiled as tk

    monkeypatch.setattr(tk, "_RESIDENT_CELLS", 0)
    # the jitted wrapper caches by shape/static args, not by the ceiling
    # global — clear so this shape is re-traced under the patched ceiling
    tk.sinkhorn_assignment_tiled.clear_cache()
    tk._col_potential.clear_cache()
    assert tk._pick_panel(384, 128) == 128
    cost = jnp.asarray(_cost(4, 384, 128))
    p_ref, e_ref = sinkhorn_assignment(cost, 50.0, 40)
    p, e = tk.sinkhorn_assignment_tiled(cost, 50.0, 40)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), atol=1e-5)
    np.testing.assert_allclose(float(e), float(e_ref), atol=1e-4)
    tk.sinkhorn_assignment_tiled.clear_cache()
    tk._col_potential.clear_cache()


def test_padded_matches_xla_misaligned_shapes():
    """Block-padding ([[C, M], [M, 0]]) must reproduce the unpadded
    assignment exactly: cross-block mass underflows to 0 in f32. Covers
    rows-only, cols-only, and both-misaligned shapes."""
    from otgan_tpu.ops.sinkhorn_pallas_tiled import (
        padded_shape,
        sinkhorn_assignment_padded,
    )

    for n, m in [(100, 128), (128, 100), (100, 100), (250, 250)]:
        assert padded_shape(n, m) is not None
        cost = jnp.asarray(_cost(n + m, n, m))
        p_ref, e_ref = sinkhorn_assignment(cost, 50.0, 40)
        p, e = sinkhorn_assignment_padded(cost, 50.0, 40)
        assert p.shape == (n, m)
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(p_ref), atol=1e-5, err_msg=f"{n}x{m}"
        )
        np.testing.assert_allclose(float(e), float(e_ref), atol=1e-4)


def test_padded_single_batch_diagonal_and_high_lambda():
    """The hardest numeric case: +999 self-match diagonal (same magnitude
    as the pad cost) at lam=500 — separation must still be exact."""
    from otgan_tpu.ops.sinkhorn_pallas_tiled import sinkhorn_assignment_padded

    n = 120
    cost = jnp.asarray(_cost(9, n, n) + 999.0 * np.eye(n, dtype=np.float32))
    p_ref, e_ref = sinkhorn_assignment(cost, 500.0, 60)
    p, e = sinkhorn_assignment_padded(cost, 500.0, 60)
    p = np.asarray(p)
    assert np.all(np.isfinite(p))
    assert float(np.max(np.diag(p))) < 1e-6
    np.testing.assert_allclose(p, np.asarray(p_ref), atol=1e-5)
    np.testing.assert_allclose(float(e), float(e_ref), atol=1e-4)


def test_dispatcher_routes_misaligned_to_padded():
    """Public dispatch: a large misaligned matrix (the reference's own
    N=2500-style shape, scaled down) runs the padded kernel and matches
    the XLA loop; batched stacks work."""
    from otgan_tpu.ops.sinkhorn_pallas import sinkhorn_assignment_pallas

    costs = jnp.stack([jnp.asarray(_cost(i, 600, 600)) for i in range(2)])
    p_ref, e_ref = sinkhorn_assignment(costs, 50.0, 30)
    p, e = sinkhorn_assignment_pallas(costs, 50.0, 30)
    assert p.shape == (2, 600, 600)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(e), np.asarray(e_ref), atol=1e-4)
