"""1-D energy distance via per-feature monotone coupling.

Reference ``utils/nn.py:6-17``: an O(N log N) alternative to Sinkhorn that
sorts samples and data per feature column and pairs them by rank — dead code
in the reference driver, but part of the design space (it is the 1-D
optimal-transport coupling computed exactly). Implemented jax-native: sorts
run on-device, the "gradient" (rank-paired residual) is scattered back to
sample order, and the whole thing is jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def energy_distance(f_sample: jax.Array, f_data: jax.Array):
    """Per-column rank pairing. Returns ``(loss, grads)`` with
    ``grads[i, j] = f_sample[i, j] - f_data[rank_match(i), j]`` (the
    reference's injected gradient) and ``loss = mean(grads**2)``.
    """
    idx_s = jnp.argsort(f_sample, axis=0)  # (N, d) sample ranks
    sorted_s = jnp.take_along_axis(f_sample, idx_s, axis=0)
    sorted_d = jnp.sort(f_data, axis=0)
    diff_sorted = sorted_s - sorted_d
    # scatter residuals back to original sample order
    inv = jnp.argsort(idx_s, axis=0)
    grads = jnp.take_along_axis(diff_sorted, inv, axis=0)
    loss = jnp.mean(jnp.square(grads))
    return loss, grads


@jax.jit
def weight_decay(params) -> jax.Array:
    """Sum of squares over matrix-shaped (ndim >= 2) params
    (reference ``utils/nn.py:22-27``, also unused by its driver)."""
    leaves = [p for p in jax.tree.leaves(params) if jnp.ndim(p) >= 2]
    return sum(jnp.sum(jnp.square(p)) for p in leaves)
