"""Fused Pallas TPU kernel for ONE local Sinkhorn iteration on a row block.

This is the kernel behind the *kernel-capable sharded matcher*
(``otgan_tpu/parallel/matching_sharded.py``). On a mesh, each chip owns the
row blocks ``x_loc = -lam * C[rows_loc, :]`` of all stacked cost matrices and
each Sinkhorn iteration is

    u      = -rowLSE(x_loc + v)          (rows are complete on-chip)
    m, s   =  column-LSE partials of x_loc + u   (combined across chips)

The XLA lowering of that body makes several HBM passes over the block (add,
row max, row exp-sum, add, col max, col exp-sum). This kernel fuses the whole
per-chip body into ONE pass: the block is DMA'd into VMEM once per iteration
and every reduction happens on-chip. The cross-chip combine (``pmax``/``psum``
of the (..., 1, N) partials) stays outside in the ``shard_map`` loop body —
collectives cannot live inside a Pallas kernel.

Reference behavior being reproduced: the Sinkhorn recursion of
``utils/matching.py:50-54`` (openai/ot-gan), in dual-potential form. The row
potential ``u`` never leaves the kernel: the final assignment is a ROW softmax
(``utils/matching.py:56``), invariant to per-row constants, so only ``v`` is
carried between iterations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SUBLANE = 8
# VMEM budget per (1, n_loc, N) f32 block: block + fused temps + double
# buffering. 1M cells = 4 MB block; measured headroom target ~12 MB.
_MAX_CELLS = 1024 * 1024


_NEG = -1e30  # finite -inf stand-in: -1e30 + -1e30 stays far from f32 max


def pad_to_grid(n_loc: int, n: int):
    """Smallest (n_loc_pad, n_pad) on the f32 tile grid covering the block."""
    pad_rows = -n_loc % _SUBLANE
    pad_cols = -n % _LANE
    return n_loc + pad_rows, n + pad_cols


def local_step_supported(n_loc: int, n: int) -> bool:
    """VMEM residency of the (possibly padded) block. Misaligned shapes are
    block-padded onto the (8, 128) f32 tile grid with in-kernel masking, so
    alignment itself is no longer a constraint — only the VMEM ceiling."""
    n_loc_pad, n_pad = pad_to_grid(n_loc, n)
    return n_loc_pad * n_pad <= _MAX_CELLS


def _local_step_kernel(x_ref, v_ref, m_ref, s_ref, *, n_rows, n_cols):
    x = x_ref[0]  # (n_loc_pad, N_pad) logits row-block, VMEM-resident
    n_loc_pad, n_pad = x.shape
    col_ok = row_ok = None
    if n_cols != n_pad:
        col_ok = (
            jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1) < n_cols
        )
    if n_rows != n_loc_pad:
        row_ok = (
            jax.lax.broadcasted_iota(jnp.int32, (n_loc_pad, 1), 0) < n_rows
        )

    y = x + v_ref[0]  # fold in the current column potential
    if col_ok is not None:
        # padded columns must not enter the row logsumexp
        y = jnp.where(col_ok, y, _NEG)
    # row step (rows complete on-chip): u = -rowLSE(y)
    rm = jnp.max(y, axis=1, keepdims=True)
    u = -(rm + jnp.log(jnp.sum(jnp.exp(y - rm), axis=1, keepdims=True)))
    # column partials of z = x + u against the LOCAL column max; the caller
    # rescales by exp(m_loc - m_glob) after the cross-chip pmax
    z = x + u
    if col_ok is not None:
        z = jnp.where(col_ok, z, _NEG)
    if row_ok is not None:
        # padded rows carry garbage u (their row LSE saw only _NEG entries);
        # freeze them out of the column partials
        z = jnp.where(row_ok, z, _NEG)
    m = jnp.max(z, axis=0, keepdims=True)  # (1, N_pad)
    s = jnp.sum(jnp.exp(z - m), axis=0, keepdims=True)
    if col_ok is not None:
        # padded columns are all-_NEG: exp(z - m) = exp(0) = 1 per row
        # there, so zero them explicitly to honor the (m=_NEG, s=0) contract
        s = jnp.where(col_ok, s, 0.0)
    m_ref[0] = m
    s_ref[0] = s


@functools.partial(
    jax.jit, static_argnames=("interpret", "n_rows", "n_cols")
)
def fused_local_sinkhorn_step(
    x: jax.Array,
    v: jax.Array,
    interpret: bool = False,
    n_rows: int | None = None,
    n_cols: int | None = None,
):
    """One fused local Sinkhorn iteration over stacked row blocks.

    Args:
      x: ``(b, n_loc, N)`` float32 logits row blocks (``-lam * C`` rows),
        already tile-aligned (callers with misaligned blocks zero-pad onto
        the grid from :func:`pad_to_grid` first).
      v: ``(b, 1, N)`` float32 current column potentials.
      n_rows / n_cols: count of VALID leading rows / columns when ``x`` is a
        zero-padded block (``None`` = all valid). Padded rows/columns are
        masked to ``-1e30`` in-kernel: they contribute nothing to the row
        logsumexp and produce ``(m=-1e30, s=0)`` column partials — the
        caller must re-mask the combined column potential (its padded
        entries come out non-finite).

    Returns:
      ``(m, s)`` of shape ``(b, 1, N)``: per-chip column max and
      max-shifted exponential sums of ``x + u`` (u = fresh row potentials).
    """
    b, n_loc, n = x.shape
    kernel = functools.partial(
        _local_step_kernel,
        n_rows=n_loc if n_rows is None else n_rows,
        n_cols=n if n_cols is None else n_cols,
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, n_loc, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_loc * n,
            bytes_accessed=b * n_loc * n * 4,
            transcendentals=2 * b * n_loc * n,
        ),
        interpret=interpret,
    )(x, v)
