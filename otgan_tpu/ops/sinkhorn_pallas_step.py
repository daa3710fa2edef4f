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

Two tiers share the per-iteration contract (``(x, v) -> (m, s)`` column-LSE
partials):

* **fused** (:func:`fused_local_sinkhorn_step`): whole (n_loc, N) block
  VMEM-resident — up to ``_MAX_CELLS`` padded cells;
* **streaming** (:func:`streaming_local_sinkhorn_step`): row *panels* of the
  block move through VMEM (double-buffered DMA) while (1, N) online
  column-logsumexp accumulators live in scratch — the paper-scale sharded
  regime (global batch 8000 on 8 chips => 500 x 4000 row blocks = 2M cells,
  ``train_with_model_saving.py:16,23``) that exceeds the fused ceiling. Same
  online max/rescaled-sum schedule as the single-chip panel kernel
  (``ops/sinkhorn_pallas_tiled.py``), but one kernel launch per iteration so
  the cross-chip combine can run between launches.

Pick a tier with :func:`local_step_mode`.

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


# streaming-tier panel heights, tallest first (taller panels amortize grid
# overhead, cf. the measured single-chip panel sweep in
# ops/sinkhorn_pallas_tiled.py); capped so a double-buffered panel plus the
# (1, N) v/m/s rows stays inside the ~16 MB/core VMEM budget
_PANELS = (512, 256, 128, 64, 32, 16, 8)
_PANEL_CELLS = 512 * 2560  # hardware-verified double-buffered panel budget


def streaming_panel(n_loc: int, n: int) -> int | None:
    """Tallest feasible streaming panel for row blocks of lane-padded width
    ``n``, capped at the (sublane-rounded) block height so short blocks are
    not padded to a tall panel; ``None`` when even the shortest panel blows
    the VMEM budget (astronomically wide blocks only)."""
    n_pad = n + (-n % _LANE)
    cap = n_loc + (-n_loc % _SUBLANE)
    for p in _PANELS:
        if p * n_pad <= _PANEL_CELLS and p <= cap:
            return p
    return None


def pad_to_stream_grid(n_loc: int, n: int, panel: int):
    """Smallest (n_loc_pad, n_pad) with rows a multiple of ``panel`` and
    columns lane-aligned, covering the block."""
    return n_loc + (-n_loc % panel), n + (-n % _LANE)


def local_step_mode(n_loc: int, n: int) -> str | None:
    """Dispatch tier for a per-chip (n_loc, n) row block: ``"fused"`` (whole
    block VMEM-resident), ``"stream"`` (panelled with online column-LSE
    accumulators), or ``None`` (fall back to the XLA multi-pass lowering)."""
    if local_step_supported(n_loc, n):
        return "fused"
    if streaming_panel(n_loc, n) is not None:
        return "stream"
    return None


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


def _streaming_step_kernel(
    x_ref, v_ref, m_ref, s_ref, m_acc, s_acc, *, n_rows, n_cols, panel
):
    j = pl.program_id(1)
    n_panels = pl.num_programs(1)

    @pl.when(j == 0)
    def _reset():
        m_acc[...] = jnp.full_like(m_acc, _NEG)
        s_acc[...] = jnp.zeros_like(s_acc)

    x = x_ref[0]  # (panel, N_pad) rows of this panel, VMEM-resident
    p_rows, n_pad = x.shape
    col_ok = None
    if n_cols != n_pad:
        col_ok = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1) < n_cols

    y = x + v_ref[0]
    if col_ok is not None:
        y = jnp.where(col_ok, y, _NEG)
    # row step (rows complete within a panel): u = -rowLSE(y)
    rm = jnp.max(y, axis=1, keepdims=True)
    u = -(rm + jnp.log(jnp.sum(jnp.exp(y - rm), axis=1, keepdims=True)))
    z = x + u
    if col_ok is not None:
        z = jnp.where(col_ok, z, _NEG)
    # mask padded trailing rows (they only exist in the last panel, but the
    # row index test is cheap VPU work, so apply it uniformly)
    row_idx = j * panel + jax.lax.broadcasted_iota(
        jnp.int32, (p_rows, 1), 0
    )
    z = jnp.where(row_idx < n_rows, z, _NEG)

    # online column logsumexp: running max + rescaled sum. When m_acc is
    # still _NEG its paired s_acc is 0, so the exp(0)=1 rescale there is
    # harmless; exp(_NEG - finite) underflows to exactly 0.
    pm = jnp.max(z, axis=0, keepdims=True)  # (1, N_pad)
    m_old = m_acc[...]
    m_new = jnp.maximum(m_old, pm)
    s_acc[...] = s_acc[...] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(z - m_new), axis=0, keepdims=True
    )
    m_acc[...] = m_new

    @pl.when(j == n_panels - 1)
    def _emit():
        m = m_acc[...]
        s = s_acc[...]
        if col_ok is not None:
            # padded columns saw only _NEG entries: exp(z - m) there is
            # exp(0) = 1 per row — zero them to honor the (m=_NEG, s=0)
            # contract shared with the fused kernel
            s = jnp.where(col_ok, s, 0.0)
        m_ref[0] = m
        s_ref[0] = s


@functools.partial(
    jax.jit, static_argnames=("panel", "interpret", "n_rows", "n_cols")
)
def streaming_local_sinkhorn_step(
    x: jax.Array,
    v: jax.Array,
    panel: int,
    interpret: bool = False,
    n_rows: int | None = None,
    n_cols: int | None = None,
):
    """One streamed local Sinkhorn iteration over stacked row blocks.

    Same contract as :func:`fused_local_sinkhorn_step` — ``(x, v) -> (m, s)``
    per-chip column-LSE partials — but the block streams through VMEM in
    ``panel``-row panels (Pallas double-buffers the DMA) with (1, N) online
    column accumulators in scratch, so blocks far beyond the fused VMEM
    ceiling run fused-per-panel instead of XLA multi-pass. Rows must be
    padded to a multiple of ``panel`` and columns to the lane grid
    (:func:`pad_to_stream_grid`); ``n_rows``/``n_cols`` mark the valid
    leading extent as in the fused kernel.
    """
    b, n_loc_pad, n_pad = x.shape
    if n_loc_pad % panel != 0:
        raise ValueError(
            f"rows {n_loc_pad} not a multiple of panel {panel}; pad with "
            "pad_to_stream_grid first"
        )
    n_panels = n_loc_pad // panel
    kernel = functools.partial(
        _streaming_step_kernel,
        n_rows=n_loc_pad if n_rows is None else n_rows,
        n_cols=n_pad if n_cols is None else n_cols,
        panel=panel,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, n_panels),
        in_specs=[
            pl.BlockSpec(
                (1, panel, n_pad),
                lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, n_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, n_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, n_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, n_pad), jnp.float32),  # running col max
            pltpu.VMEM((1, n_pad), jnp.float32),  # running col sum
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_loc_pad * n_pad,
            bytes_accessed=b * n_loc_pad * n_pad * 4,
            transcendentals=2 * b * n_loc_pad * n_pad,
        ),
        interpret=interpret,
    )(x, v)
