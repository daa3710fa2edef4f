"""Streaming / VMEM-resident (panel-tiled) Pallas Sinkhorn.

For N x N cost matrices beyond the fused VMEM kernel's ceiling (the
paper-scale regime: global batch 5000-8000 => N = 2500-4000, 25-64 MB per
matrix, SURVEY.md section 5.7), each Sinkhorn iteration must either stream
the matrix from HBM or keep it resident. This kernel does both with one
schedule, picked by size:

* grid = (n_iters, n_panels): row panels of ``-lam*C`` move through VMEM
  (Pallas double-buffers the DMA);
* **resident mode** (``n_panels == 1``, matrices up to ``_RESIDENT_CELLS``):
  the panel index map is constant across iterations, so Pallas keeps the
  whole matrix in VMEM for all ``n_iters`` — zero HBM traffic in the loop.
  Unlike the fused VMEM kernel (``sinkhorn_pallas.py``), the loop state is
  three (1, N) scratch rows instead of an (N, M) carry, so matrices up to
  ~2x larger fit (the round-1 1024^2 ceiling, docs/BACKLOG.md item 6);
* **streaming mode** (larger matrices): one pass per iteration — for each
  panel, finalize the panel's row potentials ``u`` against the current
  ``v`` (rows are complete within a panel), then immediately fold the
  panel's contribution into *online logsumexp* column accumulators
  (running max ``m`` + rescaled sum ``s``) while the panel is still in
  VMEM — the Gauss-Seidel update order of the reference recursion
  (``utils/matching.py:52-54``) is preserved exactly;
* at the start of the next iteration, ``v = -(m + log s)`` and the
  accumulators reset.

State (v, m, s: one (1, N) row each) lives in VMEM scratch, which persists
across the sequential TPU grid. Output is the final column potential ``v``;
the assignment is recovered outside as ``softmax_rows(-lam*C + v)`` (row
potentials are irrelevant to a row softmax), costing one more streamed pass.
Streaming HBM traffic: (n_iters + 2) * N^2 reads vs the two-pass schedule's
2 * n_iters * N^2 — an asymptotic 2x; resident traffic: 2 * N^2 total.

The ``-lam`` scaling happens OUTSIDE the kernel: XLA fuses it into the
cost-matmul epilogue (zero extra HBM traffic), and the kernel avoids
holding both the raw and the scaled matrix in VMEM at once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SUBLANE = 8
# streaming row-panel heights, largest first: taller panels amortize grid
# overhead (v5e, 6x2560^2 x500 iters: panel 512 -> 4.69 s, 256 -> 5.39 s,
# 128 -> 6.15 s vs XLA vmap 11.96 s); capped so panel x N x 4 B x 2
# (double buffering) + scratch stays inside the ~16 MB/core VMEM
_PANELS = (512, 256, 128)
_PANEL_CELLS = 512 * 2560  # hardware-verified double-buffered panel budget
# single-panel residency ceiling (cells): the whole matrix stays in VMEM
# across the iteration grid with only three (1, N) scratch rows of state
# (the round-1 VMEM kernel's full-matrix carry capped it at 768^2 and its
# double-buffered batched form OOM'd at 6x768^2). 1280x1024 f32 (5 MB)
# verified on v5e, see docs/DESIGN.md section 3
_RESIDENT_CELLS = 1280 * 1024


def _kernel(x_ref, v_out_ref, v_ref, m_ref, s_ref):
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

    x = x_ref[...]  # (PANEL, N) pre-scaled logits panel (-lam * C rows)
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


def _pick_panel(n: int, m: int):
    """Full-height (resident) panel when the matrix fits VMEM, else the
    tallest streaming panel that divides n and fits double-buffered;
    ``None`` when no panel honors the VMEM budget (very wide m) — the
    dispatcher must fall back to the XLA loop, not blow VMEM."""
    if n * m <= _RESIDENT_CELLS and n % _SUBLANE == 0:
        return n
    for p in _PANELS:
        if n % p == 0 and p * m <= _PANEL_CELLS:
            return p
    return None


@functools.partial(jax.jit, static_argnames=("n_iters", "interpret"))
def _col_potential(neg_lam_cost: jax.Array, n_iters: int, interpret: bool = False):
    n, m = neg_lam_cost.shape
    panel = _pick_panel(n, m)
    if panel is None:
        raise ValueError(
            f"no VMEM-feasible panel for {n}x{m}; gate on tiled_supported()"
        )
    n_panels = n // panel
    return pl.pallas_call(
        _kernel,
        grid=(n_iters, n_panels),
        in_specs=[
            pl.BlockSpec(
                (panel, m), lambda it, j: (j, 0), memory_space=pltpu.VMEM
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
            bytes_accessed=(n * m * 4 * n_iters if n_panels > 1 else n * m * 4),
            transcendentals=2 * n * m * n_iters,
        ),
        interpret=interpret,
    )(neg_lam_cost)


def tiled_supported(n: int, m: int) -> bool:
    if m % _LANE != 0 or n * m == 0:
        return False
    panel = _pick_panel(n, m)
    return panel is not None and n % panel == 0


@functools.partial(jax.jit, static_argnames=("lam", "n_iters"))
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
        x = -lam * c2d  # fused into the cost producer by XLA
        v = _col_potential(x, n_iters, interpret=interpret)
        log_a = x + v  # row potential irrelevant to row softmax
        p = jax.nn.softmax(log_a, axis=-1)
        logp = jax.nn.log_softmax(log_a, axis=-1)
        ent = jnp.mean(-jnp.sum(p * logp, axis=-1))
        return p, ent

    p, ent = jax.lax.map(one, flat)
    return p.reshape(cost.shape), ent.reshape(batch_shape)


# ---------------------------------------------------------------------------
# padded dispatch for tile-misaligned shapes
# ---------------------------------------------------------------------------

# pad-block cost: exp(-lam * (_PAD_COST - O(1))) underflows to exactly 0.0
# in float32 for every lambda the reference uses (>= 50), so no transport
# mass crosses between the real block and the pad block — the real block's
# assignment is EXACTLY the unpadded one (tested). Same magnitude as the
# reference's own +999 self-match penalty (utils/matching.py:109-110).
_PAD_COST = 999.0


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def padded_shape(n: int, m: int):
    """Smallest kernel-supported (n2, m2) > (n, m) with BOTH dims padded,
    or None. Padding must be two-sided: a pad row with no pad columns (or
    vice versa) has nowhere to send its unit of transport mass except the
    real block, which distorts the real assignment — the ``[[C, M],[M, 0]]``
    construction needs a non-empty pad block."""
    m2 = _round_up(m, _LANE)
    if m2 == m:
        m2 = m + _LANE
    n2 = _round_up(n, _SUBLANE)
    if n2 == n:
        n2 = n + _SUBLANE
    if n2 * m2 <= _RESIDENT_CELLS:
        return n2, m2
    n2 = _round_up(n, _PANELS[-1])
    if n2 == n:
        n2 = n + _PANELS[-1]
    if tiled_supported(n2, m2):
        return n2, m2
    return None


@functools.partial(jax.jit, static_argnames=("lam", "n_iters"))
def sinkhorn_assignment_padded(cost: jax.Array, lam: float, n_iters: int):
    """Run the panel kernel on tile-MISALIGNED costs by block-padding.

    The reference's own batch sizes (5000/8000 -> N = 2500/4000,
    ``train.py:16,23``) are lane-misaligned; without this they fall back
    to the ~5x slower XLA loop. Padding uses the standard OT construction
    ``[[C, M], [M, 0]]``: pad rows/columns couple only with each other
    (cross-block mass underflows to exactly 0.0 in f32 at every reference
    lambda), so the real block's assignment and its row entropies are
    unchanged.
    """
    cost = jax.lax.stop_gradient(cost)
    n, m = cost.shape[-2:]
    shape2 = padded_shape(n, m)
    if shape2 is None:
        from otgan_tpu.ops.sinkhorn import sinkhorn_assignment

        return sinkhorn_assignment(cost, lam, n_iters)
    n2, m2 = shape2

    interpret = jax.default_backend() != "tpu"
    batch_shape = cost.shape[:-2]
    flat = cost.astype(jnp.float32).reshape((-1, n, m))

    def one(c2d):
        cp = jnp.full((n2, m2), _PAD_COST, jnp.float32)
        cp = cp.at[:n, :m].set(c2d)
        cp = cp.at[n:, m:].set(0.0)  # pad block absorbs its own mass
        x = -lam * cp
        v = _col_potential(x, n_iters, interpret=interpret)
        log_a = (x + v)[:n, :m]  # real block; pad-col logits carry 0 mass
        p = jax.nn.softmax(log_a, axis=-1)
        logp = jax.nn.log_softmax(log_a, axis=-1)
        ent = jnp.mean(-jnp.sum(p * logp, axis=-1))
        return p, ent

    p, ent = jax.lax.map(one, flat)
    return p.reshape(batch_shape + (n, m)), ent.reshape(batch_shape)
