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


def local_step_supported(n_loc: int, n: int) -> bool:
    """Tile alignment (f32: 8 sublanes x 128 lanes) + VMEM residency."""
    return (
        n_loc % _SUBLANE == 0
        and n % _LANE == 0
        and n_loc * n <= _MAX_CELLS
    )


def _local_step_kernel(x_ref, v_ref, m_ref, s_ref):
    x = x_ref[0]  # (n_loc, N) logits row-block, VMEM-resident
    y = x + v_ref[0]  # fold in the current column potential
    # row step (rows complete on-chip): u = -rowLSE(y)
    rm = jnp.max(y, axis=1, keepdims=True)
    u = -(rm + jnp.log(jnp.sum(jnp.exp(y - rm), axis=1, keepdims=True)))
    # column partials of z = x + u against the LOCAL column max; the caller
    # rescales by exp(m_loc - m_glob) after the cross-chip pmax
    z = x + u
    m = jnp.max(z, axis=0, keepdims=True)  # (1, N)
    m_ref[0] = m
    s_ref[0] = jnp.sum(jnp.exp(z - m), axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_local_sinkhorn_step(
    x: jax.Array, v: jax.Array, interpret: bool = False
):
    """One fused local Sinkhorn iteration over stacked row blocks.

    Args:
      x: ``(b, n_loc, N)`` float32 logits row blocks (``-lam * C`` rows).
      v: ``(b, 1, N)`` float32 current column potentials.

    Returns:
      ``(m, s)`` of shape ``(b, 1, N)``: per-chip column max and
      max-shifted exponential sums of ``x + u`` (u = fresh row potentials).
    """
    b, n_loc, n = x.shape
    return pl.pallas_call(
        _local_step_kernel,
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
