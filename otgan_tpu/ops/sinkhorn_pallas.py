"""Pallas Sinkhorn kernel dispatch + the fused full-matrix-carry kernel.

``sinkhorn_assignment_pallas`` is the production entry: it routes to the
panel kernel (``sinkhorn_pallas_tiled``, VMEM-resident or streaming by
size) with an XLA fallback for tile-misaligned shapes — thresholds are
hardware-measured, see its docstring and docs/DESIGN.md section 3.

The rest of this module is the round-1 fused kernel, kept for parity
benchmarking (`bench.py` cross-checks it against XLA on-chip). The
reference unrolls 500 full-matrix row/col logsumexp updates into the TF
graph and round-robins 6 such chains over GPUs (``utils/matching.py:49-57``),
bouncing the N x N matrix through HBM twice per iteration. This kernel holds
``-lam * C`` in VMEM once and runs the entire iteration loop on-chip:

* grid = (batch,): one program per cost matrix (the 6 two-batch / 3
  single-batch matrices run as one batched call);
* state = dual potentials ``u`` (N,1) and ``v`` (1,M) — the invariant
  ``log_a = -lam*C + u + v`` makes each iteration two VPU passes over the
  VMEM-resident logits with no HBM traffic;
* epilogue fuses the row-softmax assignment and its mean row entropy
  (reference semantics: ``softmax(log_a)`` rows +
  ``softmax_cross_entropy_with_logits(labels=P, logits=log_a)``).

HBM traffic: one read of C, one write of P — versus the reference's
~2 * n_iters passes. Everything is float32 (lam=500 logits span ~[-5e5, 0]
with the +999 diagonal; bf16 would corrupt the assignment).

Matrices larger than VMEM fall back to the XLA path in
``otgan_tpu.ops.sinkhorn`` (same numerics); the multi-chip row-sharded
variant lives in ``otgan_tpu/parallel``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget: logits + loop carry + temps; 768x768 f32 compiles and runs
# on v5e (measured), 1024x1024 overflows VMEM at compile time
_MAX_VMEM_CELLS = 768 * 768
_LANE = 128
_SUBLANE = 8


def pallas_supported(n: int, m: int) -> bool:
    """Kernel constraints: tile-aligned (f32: 8 x 128) and VMEM-resident."""
    return (
        n % _SUBLANE == 0
        and m % _LANE == 0
        and n * m <= _MAX_VMEM_CELLS
    )


def _sinkhorn_kernel(cost_ref, p_ref, ent_ref, *, lam: float, n_iters: int):
    x = -lam * cost_ref[0]  # (N, M) logits, VMEM-resident for the whole loop

    def _lse_rows(y):  # (N, M) -> (N, 1)
        m = jnp.max(y, axis=1, keepdims=True)
        return m + jnp.log(jnp.sum(jnp.exp(y - m), axis=1, keepdims=True))

    def _lse_cols(y):  # (N, M) -> (1, M)
        m = jnp.max(y, axis=0, keepdims=True)
        return m + jnp.log(jnp.sum(jnp.exp(y - m), axis=0, keepdims=True))

    # Carry y = x + v (col potential folded into the matrix): Mosaic cannot
    # relayout a (1, M) vector as a fori_loop carry ("Non-singleton logical
    # dimension is replicated in destination..."), so the carry is the full
    # (N, M) tile. The row potential u never needs materializing in the
    # carry: the assignment is a ROW softmax (utils/matching.py:56), which
    # is invariant to per-row constants — softmax_rows(x+u+v) ==
    # softmax_rows(x+v).
    def body(_, y):
        u = -_lse_rows(y)
        dv = -_lse_cols(y + u)
        return y + dv

    log_a = jax.lax.fori_loop(0, n_iters, body, x)
    # fused row softmax + entropy (reference utils/matching.py:56-57)
    mx = jnp.max(log_a, axis=1, keepdims=True)
    e = jnp.exp(log_a - mx)
    s = jnp.sum(e, axis=1, keepdims=True)
    p = e / s
    p_ref[0] = p
    logp = (log_a - mx) - jnp.log(s)
    # ent_ref holds the whole (batch, 1) column (SMEM blocks can't be
    # split per grid step); each program writes its own row. Reductions stay
    # 2-D throughout — 1-D vectors hit Mosaic relayout bugs.
    row_ent = -jnp.sum(p * logp, axis=1, keepdims=True)  # (N, 1)
    ent_ref[pl.program_id(0), 0] = jnp.sum(row_ent) / row_ent.shape[0]


@functools.partial(jax.jit, static_argnames=("lam", "n_iters", "interpret"))
def _sinkhorn_pallas_batched(
    costs: jax.Array, lam: float, n_iters: int, interpret: bool = False
):
    b, n, m = costs.shape
    kernel = functools.partial(_sinkhorn_kernel, lam=lam, n_iters=n_iters)
    p, ent = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((1, n, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, m), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * m * n_iters,
            bytes_accessed=2 * b * n * m * 4,
            transcendentals=2 * b * n * m * n_iters,
        ),
        interpret=interpret,
    )(costs)
    return p, ent[:, 0]


def sinkhorn_assignment_pallas(cost: jax.Array, lam: float, n_iters: int):
    """Kernel dispatcher for ``sinkhorn.sinkhorn_assignment``: cost
    ``(..., N, M)`` -> (assignment ``(..., N, M)``, entropy ``(...)``).

    Routes every supported shape to the panel kernel in
    ``sinkhorn_pallas_tiled`` (VMEM-resident single panel for small/mid
    matrices, streaming panels beyond) and falls back to the XLA loop on
    tile-misaligned shapes. Measured on v5e across the production 6-stack
    (docs/DESIGN.md section 3): the panel kernel is within ~15% of the best
    path at every size and 2.5x faster than XLA vmap at paper scale
    (6 x 2560^2 x 500 iters: 4.7 s vs 12.0 s). The fused full-matrix-carry
    kernel below (``_sinkhorn_pallas_batched``) is retained for parity
    benchmarking but no longer dispatched: its carry halves the residency
    ceiling (768^2) and its double-buffered batched form overflows VMEM at
    6 x 768^2."""
    n, m = cost.shape[-2:]
    from otgan_tpu.ops.sinkhorn_pallas_tiled import (
        padded_shape,
        sinkhorn_assignment_padded,
        sinkhorn_assignment_tiled,
        tiled_supported,
    )

    if tiled_supported(n, m):
        return sinkhorn_assignment_tiled(cost, lam, n_iters)
    # tile-misaligned (e.g. the reference's own N=2500/4000): block-pad to
    # the kernel grid when the matrix is large enough for the kernel to
    # matter (below ~512^2 every path sits on the dispatch floor)
    if n * m >= 512 * 512 and padded_shape(n, m) is not None:
        return sinkhorn_assignment_padded(cost, lam, n_iters)
    from otgan_tpu.ops.sinkhorn import assignment_and_entropy, sinkhorn_log

    log_a, _, _ = sinkhorn_log(-lam * cost.astype(jnp.float32), n_iters)
    return assignment_and_entropy(log_a)
