"""Streaming (HBM-tiled) Pallas Sinkhorn for matrices larger than VMEM.

For N x N cost matrices that do not fit on-chip (the paper-scale regime:
global batch 5000-8000 => N = 2500-4000, 25-64 MB per matrix, SURVEY.md
section 5.7), each Sinkhorn iteration must stream the matrix from HBM. The
naive schedule (and the XLA fallback) does TWO passes per iteration — a row
pass for ``u`` and a column pass for ``v``. This kernel does ONE:

* grid = (n_iters, n_panels): row panels of ``-lam*C`` stream through VMEM
  (Pallas double-buffers the DMA);
* for each panel: finalize the panel's row potentials ``u`` against the
  current ``v`` (rows are complete within a panel), then immediately fold
  the panel's contribution into *online logsumexp* column accumulators
  (running max ``m`` + rescaled sum ``s``) while the panel is still in
  VMEM — the Gauss-Seidel update order of the reference recursion
  (``utils/matching.py:52-54``) is preserved exactly;
* at the start of the next iteration, ``v = -(m + log s)`` and the
  accumulators reset.

State (v, m, s: one (1, N) row each) lives in VMEM scratch, which persists
across the sequential TPU grid. Output is the final column potential ``v``;
the assignment is recovered outside as ``softmax_rows(-lam*C + v)`` (row
potentials are irrelevant to a row softmax), costing one more streamed pass.
HBM traffic: (n_iters + 2) * N^2 reads vs the two-pass schedule's
2 * n_iters * N^2 — an asymptotic 2x.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SUBLANE = 8
# row-panel height: panel bytes = PANEL * N * 4; at N=4096 this is 2 MB,
# x2 for double buffering + scratch rows — comfortably inside VMEM
_PANEL = 128


def _kernel(x_ref, v_out_ref, v_ref, m_ref, s_ref, *, lam: float):
    it = pl.program_id(0)
    j = pl.program_id(1)
    n_panels = pl.num_programs(1)
    n_iters = pl.num_programs(0)

    @pl.when(jnp.logical_and(it == 0, j == 0))
    def _init():
        v_ref[...] = jnp.zeros_like(v_ref)
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        s_ref[...] = jnp.zeros_like(s_ref)

    @pl.when(jnp.logical_and(it > 0, j == 0))
    def _finalize_prev_iteration():
        v_ref[...] = -(m_ref[...] + jnp.log(s_ref[...]))
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        s_ref[...] = jnp.zeros_like(s_ref)

    x = -lam * x_ref[...]  # (PANEL, N) logits panel
    y = x + v_ref[...]
    # row step for this panel (rows complete): u = -logsumexp_rows(y)
    rm = jnp.max(y, axis=1, keepdims=True)
    u = -(rm + jnp.log(jnp.sum(jnp.exp(y - rm), axis=1, keepdims=True)))
    # column update REPLACES the col potential: v' = -colLSE(x + u), with
    # the OLD v excluded (colLSE(x+u+v) = v + colLSE(x+u), so the reference
    # recursion cancels it) — accumulate over x + u, not y + u
    z = x + u
    # online column logsumexp accumulation
    pm = jnp.max(z, axis=0, keepdims=True)  # (1, N) panel col max
    m_old = m_ref[...]
    m_new = jnp.maximum(m_old, pm)
    # s * exp(m_old - m_new): exp(-inf - -inf) handled via where
    scale = jnp.where(
        m_old == -jnp.inf, jnp.zeros_like(m_old), jnp.exp(m_old - m_new)
    )
    s_ref[...] = s_ref[...] * scale + jnp.sum(
        jnp.exp(z - m_new), axis=0, keepdims=True
    )
    m_ref[...] = m_new

    @pl.when(jnp.logical_and(it == n_iters - 1, j == n_panels - 1))
    def _emit():
        v_out_ref[...] = -(m_ref[...] + jnp.log(s_ref[...]))


@functools.partial(jax.jit, static_argnames=("lam", "n_iters", "interpret"))
def _col_potential(cost: jax.Array, lam: float, n_iters: int, interpret: bool = False):
    n, m = cost.shape
    n_panels = n // _PANEL
    return pl.pallas_call(
        functools.partial(_kernel, lam=lam),
        grid=(n_iters, n_panels),
        in_specs=[
            pl.BlockSpec(
                (_PANEL, m), lambda it, j: (j, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, m), lambda it, j: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, m), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, m), jnp.float32),  # v
            pltpu.VMEM((1, m), jnp.float32),  # running col max
            pltpu.VMEM((1, m), jnp.float32),  # running col sum
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * n * m * n_iters,
            bytes_accessed=n * m * 4 * n_iters,
            transcendentals=2 * n * m * n_iters,
        ),
        interpret=interpret,
    )(cost.astype(jnp.float32))


def tiled_supported(n: int, m: int) -> bool:
    return (
        n % _PANEL == 0
        and m % _LANE == 0
        and n * m > 0
    )


def sinkhorn_assignment_tiled(cost: jax.Array, lam: float, n_iters: int):
    """Drop-in for ``sinkhorn_assignment`` on matrices too large for the
    VMEM-resident kernel: cost (..., N, M) -> (P, entropy)."""
    cost = jax.lax.stop_gradient(cost)
    n, m = cost.shape[-2:]
    if not tiled_supported(n, m):
        from otgan_tpu.ops.sinkhorn import sinkhorn_assignment

        return sinkhorn_assignment(cost, lam, n_iters)

    interpret = jax.default_backend() != "tpu"
    batch_shape = cost.shape[:-2]
    flat = cost.astype(jnp.float32).reshape((-1, n, m))

    def one(c2d):
        v = _col_potential(c2d, lam, n_iters, interpret=interpret)
        log_a = -lam * c2d + v  # row potential irrelevant to row softmax
        p = jax.nn.softmax(log_a, axis=-1)
        logp = jax.nn.log_softmax(log_a, axis=-1)
        ent = jnp.mean(-jnp.sum(p * logp, axis=-1))
        return p, ent

    p, ent = jax.lax.map(one, flat)
    return p.reshape(cost.shape), ent.reshape(batch_shape)
