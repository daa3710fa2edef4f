"""Row-sharded, collectively-normalized MED matching (the flagship
multi-chip component — SURVEY.md sections 2.3, 5.7, 5.8).

The reference scales the N x N Sinkhorn by (a) row-sharding the *cost
computation* across GPUs after a feature gather (``utils/matching.py:29-39``)
and (b) round-robining the 6 *whole* matrices over GPUs for the iteration
itself (``:49``) — each GPU still materializes full N x N matrices. Here the
entire pipeline stays row-sharded end-to-end under ``shard_map``:

* each chip holds the (6, n_loc, N) row-blocks of ALL 6 cost matrices
  (n_loc = N/K): memory per chip drops K-fold vs the reference layout;
* Sinkhorn row normalization is chip-local (rows are complete);
* column normalization is a **cross-chip logsumexp**: ``pmax`` of the local
  column maxima + ``psum`` of rescaled exponential sums — 2 small (6, N)
  collectives per iteration riding ICI;
* the per-chip iteration body optionally runs as ONE fused Pallas pass
  (``ops/sinkhorn_pallas_step.py``) instead of XLA's multi-pass lowering;
* ``tol > 0`` switches the fixed ``fori_loop`` to a ``while_loop`` with a
  sup-norm early exit on the column potential — the collective-reduced ``v``
  is replicated across chips, so the stopping decision is too;
* matched features: direct matmuls are local row-blocks; transposed
  matmuls (P^T f) are local partials reduced with one ``psum_scatter``
  straight to local rows (1/K the collective bytes of an all-reduce).

Batch-half convention (two-batch): the global matcher
(`ops.matching.match_two_batch`) splits the batch at B/2; here each chip
splits its LOCAL batch in half (rows [0, b/2) are "batch 1"). The two
conventions are related by a fixed batch permutation — statistically
identical (minibatches are random), and tests verify exact equivalence
modulo that permutation. The single-batch variant has no halving, so it is
exactly equal to the global ``match_single_batch`` row-for-row.

**Uneven batches** (any even B, in particular the reference's own default
global batch 5000 = 625 x 8, ``train.py:16,23``, where ``2500 % 8 != 0``):
each half is zero-padded to ``n_dev * ceil(N/n_dev)`` rows and the halves
interleaved by pure reshapes so every chip still owns whole local halves
(:func:`_arrange_halves`). Pad rows/columns enter the Sinkhorn through the
standard OT pad construction ``[[C, 999], [999, 0]]`` — cross-block mass
underflows to exactly 0.0 in f32 at every reference lambda — so the real
block's assignment, matched features, and entropy are EXACTLY the unpadded
ones, and outputs return in global-matcher row order (no permutation).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from otgan_tpu.ops.costs import cosine_cost, resolve_precision
from otgan_tpu.ops.matching import MatchedFeatures

_PRECISION = jax.lax.Precision.HIGHEST


def _bind_precision(cost_fn: Callable, precision):
    """Resolve the ``--matching_precision`` knob for a matcher builder:
    returns ``(cost_fn, matmul_precision)``. ``None`` keeps the historical
    always-HIGHEST behavior and leaves custom 2-arg cost functions intact."""
    if precision is None:
        return cost_fn, _PRECISION
    p = resolve_precision(precision)
    return functools.partial(cost_fn, precision=p), p


def _local_step_xla(x_loc: jax.Array, v: jax.Array):
    """One local Sinkhorn iteration on row blocks (XLA lowering).

    ``x_loc``: (..., n_loc, N) logits rows; ``v``: (..., 1, N) column
    potential. Returns the per-chip column-LSE partials ``(m_loc, s_loc)``
    of ``x_loc + u`` where ``u = -rowLSE(x_loc + v)`` (reference recursion
    ``utils/matching.py:50-54`` in dual-potential form; the row potential
    never escapes — row softmax is invariant to it).
    """
    y = x_loc + v
    rm = jnp.max(y, axis=-1, keepdims=True)
    u = -(rm + jnp.log(jnp.sum(jnp.exp(y - rm), axis=-1, keepdims=True)))
    z = x_loc + u
    m_loc = jnp.max(z, axis=-2, keepdims=True)
    s_loc = jnp.sum(jnp.exp(z - m_loc), axis=-2, keepdims=True)
    return m_loc, s_loc


def _sharded_sinkhorn_rows(
    x_loc: jax.Array,
    n_iters: int,
    axis_name: str,
    tol: float = 0.0,
    use_pallas: bool = False,
) -> jax.Array:
    """Sinkhorn on row-sharded logits ``x_loc`` (b, n_loc, N).

    Returns the final row-sharded log assignment up to per-row constants
    (``x_loc + v``): downstream consumers apply a ROW softmax
    (``utils/matching.py:56``), which is invariant to the row potential, so
    only the column potential ``v`` is carried.
    """
    x_loc = jax.lax.stop_gradient(x_loc)

    b, n_loc, n = x_loc.shape
    x_run = x_loc  # what the iteration actually runs on (maybe padded)
    col_ok = None  # (1, N_pad) validity mask when column-padded
    local_step = _local_step_xla
    if use_pallas:
        from otgan_tpu.ops.sinkhorn_pallas_step import (
            fused_local_sinkhorn_step,
            local_step_mode,
            pad_to_grid,
            pad_to_stream_grid,
            streaming_local_sinkhorn_step,
            streaming_panel,
        )

        mode = local_step_mode(n_loc, n)
        interpret = jax.default_backend() != "tpu"
        if mode == "stream" and not interpret:
            # HARDWARE MEASUREMENT (v5e, round 3): one pallas_call per
            # iteration cannot pipeline DMA across calls — the streaming
            # kernel measured 118.9 s vs XLA's 0.50 s for 500 iterations
            # on the batch-8000/8 block (6, 512, 4096), ~240x SLOWER
            # (docs/DESIGN.md section 3). The single-chip panel kernel
            # wins by keeping all iterations inside ONE call; the sharded
            # step structurally cannot (collectives between iterations).
            # XLA's per-iteration lowering is bandwidth-bound optimal
            # here, so it is the TPU default for this tier; the kernel
            # stays available for study via OTGAN_FORCE_STREAM_STEP=1 and
            # remains the exact-equivalence test vehicle on CPU.
            import os

            if os.environ.get("OTGAN_FORCE_STREAM_STEP", "0") != "1":
                mode = None
        if mode is not None:
            if mode == "fused":
                n_loc_pad, n_pad = pad_to_grid(n_loc, n)
                local_step = functools.partial(
                    fused_local_sinkhorn_step,
                    interpret=interpret,
                    n_rows=n_loc,
                    n_cols=n,
                )
            else:  # streaming tier: paper-scale blocks beyond fused VMEM
                panel = streaming_panel(n_loc, n)
                n_loc_pad, n_pad = pad_to_stream_grid(n_loc, n, panel)
                local_step = functools.partial(
                    streaming_local_sinkhorn_step,
                    panel=panel,
                    interpret=interpret,
                    n_rows=n_loc,
                    n_cols=n,
                )
            if (n_loc_pad, n_pad) != (n_loc, n):
                # block-pad onto the kernel's grid; the kernel masks padded
                # rows/columns in-VMEM and the combined column potential is
                # re-masked below (its padded entries come back non-finite:
                # s_glob sums to 0 there)
                x_run = jnp.pad(
                    x_loc,
                    ((0, 0), (0, n_loc_pad - n_loc), (0, n_pad - n)),
                )
                col_ok = (jnp.arange(n_pad) < n)[None, :]

    def step(v):
        m_loc, s_loc = local_step(x_run, v)
        # cross-chip logsumexp: global max, then rescale the local sums
        m_glob = jax.lax.pmax(m_loc, axis_name)
        s_glob = jax.lax.psum(s_loc * jnp.exp(m_loc - m_glob), axis_name)
        v_new = -(m_glob + jnp.log(s_glob))
        if col_ok is not None:
            # pin padded columns to 0 so the tol check and the next row
            # logsumexp never see the non-finite combined values there
            v_new = jnp.where(col_ok, v_new, 0.0)
        return v_new

    # v comes out of pmax/psum collectives (axis-INVARIANT) so its init must
    # be plain (invariant) zeros under shard_map's varying-axis typing.
    v0 = jnp.zeros(x_run.shape[:-2] + (1, x_run.shape[-1]), jnp.float32)

    if tol > 0.0:
        # early exit on the sup-norm movement of the (replicated) column
        # potential — every chip sees the same v, so every chip stops at the
        # same iteration (no collective divergence)
        def cond(carry):
            _, delta, i = carry
            return jnp.logical_and(i < n_iters, delta >= tol)

        def body(carry):
            v_prev, _, i = carry
            v = step(v_prev)
            return (v, jnp.max(jnp.abs(v - v_prev)), i + 1)

        v, _, _ = jax.lax.while_loop(
            cond, body, (v0, jnp.asarray(jnp.inf, jnp.float32), 0)
        )
    else:
        v = jax.lax.fori_loop(0, n_iters, lambda _, v: step(v), v0)
    return x_loc + v[..., :n]


def _row_softmax_entropy(
    log_a: jax.Array,
    axis_name: str,
    row_ok: jax.Array | None = None,
    n_valid: int | None = None,
):
    """Row softmax + global mean row entropy (``utils/matching.py:56-57``).

    With ``row_ok``/``n_valid`` set (batch-padded matchers), padded rows are
    excluded so the entropy equals the global matcher's mean over the
    ``n_mats * n_valid`` real rows exactly."""
    p = jax.nn.softmax(log_a, axis=-1)
    logp = jax.nn.log_softmax(log_a, axis=-1)
    ent_rows = -jnp.sum(p * logp, axis=-1)  # (n_mats, n_loc)
    if row_ok is None:
        return p, jax.lax.pmean(jnp.mean(ent_rows), axis_name)
    n_mats = ent_rows.shape[0]
    ent_sum = jnp.sum(jnp.where(row_ok[None, :], ent_rows, 0.0))
    return p, jax.lax.psum(ent_sum, axis_name) / (n_mats * n_valid)


# Pad-block cost for batch-padded (uneven) shards: the standard OT
# construction [[C, M], [M, 0]] — pad rows/columns couple only with each
# other because exp(-lam * (_PAD_COST - O(1))) underflows to exactly 0.0 in
# float32 for every lambda the reference uses (>= 50). Same magnitude as the
# reference's own +999 self-match penalty (utils/matching.py:109-110) and the
# single-chip padded kernel (ops/sinkhorn_pallas_tiled.py).
_PAD_COST = 999.0


def _mask_pad_costs(costs: jax.Array, row_ok: jax.Array, col_ok: jax.Array):
    """Apply the [[C, M], [M, 0]] pad construction to stacked (n_mats,
    n_loc, N) cost row blocks: real-real entries keep C, real<->pad crossings
    cost ``_PAD_COST`` (no mass crosses), the pad-pad block costs 0 (pads
    absorb their own unit of transport mass)."""
    both = row_ok[:, None] & col_ok[None, :]
    neither = (~row_ok[:, None]) & (~col_ok[None, :])
    return jnp.where(both, costs, jnp.where(neither, 0.0, _PAD_COST))


def _arrange_halves(f: jax.Array, n_dev: int, n_loc: int, n_half: int):
    """Zero-pad each global batch half to ``n_dev * n_loc`` rows (pads at the
    half's tail) and interleave the halves so that, under a contiguous batch
    sharding, chip k's local block is ``[half1-slice; half2-slice]`` — the
    layout the two-batch local convention expects. Pure reshape/concat, so
    GSPMD lowers it to a bounded ICI shuffle, not a gather."""
    d = f.shape[1]
    pad = n_dev * n_loc - n_half
    z = jnp.zeros((pad, d), f.dtype)
    h1 = jnp.concatenate([f[:n_half], z]).reshape(n_dev, n_loc, d)
    h2 = jnp.concatenate([f[n_half:], z]).reshape(n_dev, n_loc, d)
    return jnp.concatenate([h1, h2], axis=1).reshape(2 * n_dev * n_loc, d)


def _unarrange_halves(out: jax.Array, n_dev: int, n_loc: int, n_half: int):
    """Inverse of :func:`_arrange_halves`: recover ``[half1; half2]`` global
    row order, dropping pad rows — outputs align row-for-row with the global
    matcher's convention (``ops.matching.match_two_batch``)."""
    d = out.shape[1]
    blocks = out.reshape(n_dev, 2, n_loc, d)
    h1 = blocks[:, 0].reshape(n_dev * n_loc, d)[:n_half]
    h2 = blocks[:, 1].reshape(n_dev * n_loc, d)[:n_half]
    return jnp.concatenate([h1, h2])


def make_sharded_two_batch_matcher(
    mesh: Mesh,
    lam: float,
    n_iters: int,
    cost_fn: Callable = cosine_cost,
    axis_name: str = "data",
    tol: float = 0.0,
    use_pallas: bool = False,
    precision: str | None = None,
):
    """Build a jitted ``(features_a, features_b) -> MatchedFeatures`` over a
    1-D mesh. Inputs are global (B, d) arrays sharded (or shardable) on the
    batch axis; outputs are batch-sharded with rows aligned to inputs.

    ANY even global batch is accepted. When ``B/2`` divides ``n_dev`` the
    zero-copy local-half convention runs (outputs related to the global
    matcher by :func:`sharded_permutation`); otherwise the halves are
    zero-padded and interleaved (:func:`_arrange_halves`) with the
    ``[[C, 999], [999, 0]]`` pad construction, and the outputs come back in
    EXACT global-matcher row order — this is how the reference's own default
    (global batch 5000 = 625 x 8, ``train.py:16,23``) runs row-sharded."""

    n_dev = mesh.devices.size
    cost_fn, mm_precision = _bind_precision(cost_fn, precision)

    def build(n_valid: int | None):
        """shard_map'd local body; ``n_valid`` = real rows per batch half
        when the halves are tail-padded (None = every row real)."""

        def local(fa_loc, fb_loc):
            b_loc = fa_loc.shape[0]
            n_loc = b_loc // 2
            fa1l, fa2l = fa_loc[:n_loc], fa_loc[n_loc:]
            fb1l, fb2l = fb_loc[:n_loc], fb_loc[n_loc:]

            # feature gather over ICI (the reference's concat-gather,
            # utils/matching.py:16-19)
            fa1 = jax.lax.all_gather(fa1l, axis_name, tiled=True)  # (N, d)
            fa2 = jax.lax.all_gather(fa2l, axis_name, tiled=True)
            fb1 = jax.lax.all_gather(fb1l, axis_name, tiled=True)
            fb2 = jax.lax.all_gather(fb2l, axis_name, tiled=True)

            # row-blocks of the 6 cost matrices (reference order,
            # utils/matching.py:41-43), stacked: (6, n_loc, N)
            costs = jnp.stack(
                [
                    cost_fn(fa1l, fa2),
                    cost_fn(fb2l, fb1),
                    cost_fn(fa1l, fb1),
                    cost_fn(fa1l, fb2),
                    cost_fn(fa2l, fb1),
                    cost_fn(fa2l, fb2),
                ]
            )
            idx = jax.lax.axis_index(axis_name)
            row_ok = None
            if n_valid is not None:
                col_ok = jnp.arange(fa1.shape[0]) < n_valid
                row_ok = idx * n_loc + jnp.arange(n_loc) < n_valid
                costs = _mask_pad_costs(costs, row_ok, col_ok)
            log_a = _sharded_sinkhorn_rows(
                -lam * costs,
                n_iters,
                axis_name,
                tol=tol,
                use_pallas=use_pallas,
            )
            p, entropy = _row_softmax_entropy(
                log_a, axis_name, row_ok=row_ok, n_valid=n_valid
            )
            p_a1a2, p_b2b1, p_a1b1, p_a1b2, p_a2b1, p_a2b2 = p

            mm = lambda a, b: jnp.matmul(a, b, precision=mm_precision)

            # direct matmuls: local rows x gathered features. Pad rows of
            # the gathered features are zeros and real rows of p put
            # exactly 0 mass on pad columns, so real output rows are exact.
            a1_a = mm(p_a1a2, fa2)  # matched for local a1 rows
            b2_b = mm(p_b2b1, fb1)  # matched for local b2 rows
            a1_b = 0.5 * (mm(p_a1b1, fb1) + mm(p_a1b2, fb2))
            a2_b = 0.5 * (mm(p_a2b1, fb1) + mm(p_a2b2, fb2))

            # transposed matmuls: per-chip partial sums -> one fused psum ->
            # slice back to local rows (replaces the reference's full-matrix
            # transpose matmuls, utils/matching.py:70-75). Pad source rows
            # carry all their mass in the pad block, contributing exactly 0
            # to real target rows.
            partials = jnp.stack(
                [
                    mm(p_a1a2.T, fa1l),  # -> a2 rows matched from a1
                    mm(p_b2b1.T, fb2l),  # -> b1 rows matched from b2
                    mm(p_a1b1.T, fa1l) + mm(p_a2b1.T, fa2l),  # -> b1 from a
                    mm(p_a1b2.T, fa1l) + mm(p_a2b2.T, fa2l),  # -> b2 from a
                ]
            )  # (4, N, d) partial over local rows
            # reduce-scatter, not psum+slice: each chip only needs its
            # (4, n_loc, d) row block, so scatter the reduction over the
            # row axis — 1/n_dev the collective bytes of an all-reduce
            # (1.3 GB f32 at the reference's N=2500/d=32768)
            loc = jax.lax.psum_scatter(
                partials, axis_name, scatter_dimension=1, tiled=True
            )  # (4, n_loc, d)
            a2_a = loc[0]
            b1_b = loc[1]
            b1_a = 0.5 * loc[2]
            b2_a = 0.5 * loc[3]

            # reassemble in local input order [batch1; batch2]
            a_a = jnp.concatenate([a1_a, a2_a])
            b_b = jnp.concatenate([b1_b, b2_b])
            a_b = jnp.concatenate([a1_b, a2_b])
            b_a = jnp.concatenate([b1_a, b2_a])
            return a_a, b_b, a_b, b_a, entropy

        return shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis_name), P(axis_name)),
            out_specs=(
                P(axis_name),
                P(axis_name),
                P(axis_name),
                P(axis_name),
                P(),
            ),
            # VMA typing ON for the XLA paths: it enforces that the tol
            # while_loop carry / stop decision stay axis-invariant (the v
            # potential comes out of pmax/psum collectives). The Pallas local
            # step cannot run under it: pallas_call does not propagate
            # varying-axis types and the interpret-mode lowering hits a JAX
            # dynamic_slice VMA mismatch ("Primitive dynamic_slice requires
            # varying manual axes to match" -- the error itself prescribes
            # check_vma=False as the workaround).
            check_vma=not use_pallas,
        )

    sharded_even = build(None)

    @jax.jit
    def matcher(features_a: jax.Array, features_b: jax.Array):
        B = features_a.shape[0]
        if B % 2 != 0:
            raise ValueError(
                f"two-batch matching needs an even global batch, got B={B} "
                "(the reference enforces this via `assert nr_gpu % 2 == 0`, "
                "train.py:34)"
            )
        n_half = B // 2
        if n_half % n_dev == 0:
            a_a, b_b, a_b, b_a, ent = sharded_even(features_a, features_b)
            return MatchedFeatures(a_a, b_b, a_b, b_a, ent)
        # uneven halves: pad + interleave, run masked, restore global order
        n_loc = -(-n_half // n_dev)
        fa = _arrange_halves(features_a, n_dev, n_loc, n_half)
        fb = _arrange_halves(features_b, n_dev, n_loc, n_half)
        a_a, b_b, a_b, b_a, ent = build(n_half)(fa, fb)
        un = lambda t: _unarrange_halves(t, n_dev, n_loc, n_half)
        return MatchedFeatures(un(a_a), un(b_b), un(a_b), un(b_a), ent)

    return matcher


def make_sharded_single_batch_matcher(
    mesh: Mesh,
    lam: float,
    n_iters: int,
    cost_fn: Callable = cosine_cost,
    axis_name: str = "data",
    tol: float = 0.0,
    use_pallas: bool = False,
    precision: str | None = None,
):
    """Row-sharded single-batch matcher (reference
    ``get_matched_features_single_batch``, ``utils/matching.py:88-136``):
    3 cost matrices (a·a, b·b, a·b) with ``+999`` on the self-match
    diagonals (``:109-110``). No batch halving, so outputs are EXACTLY the
    global ``match_single_batch`` rows (no permutation). ANY global batch is
    accepted: when ``B % n_dev != 0`` the batch is tail-padded with the
    ``[[C, 999], [999, 0]]`` construction and outputs are sliced back."""

    n_dev = mesh.devices.size
    cost_fn, mm_precision = _bind_precision(cost_fn, precision)

    def build(n_valid: int | None):
        def local(fa_loc, fb_loc):
            b_loc = fa_loc.shape[0]
            fa = jax.lax.all_gather(fa_loc, axis_name, tiled=True)  # (B, d)
            fb = jax.lax.all_gather(fb_loc, axis_name, tiled=True)
            B = fa.shape[0]
            idx = jax.lax.axis_index(axis_name)
            # local rows of the 999*I diagonal: row i here is global row
            # idx*b_loc + i (utils/matching.py:109-110)
            rows = idx * b_loc + jnp.arange(b_loc)
            eye_blk = jnp.where(
                rows[:, None] == jnp.arange(B)[None, :], 999.0, 0.0
            ).astype(jnp.float32)
            costs = jnp.stack(
                [
                    cost_fn(fa_loc, fa) + eye_blk,
                    cost_fn(fb_loc, fb) + eye_blk,
                    cost_fn(fa_loc, fb),
                ]
            )
            row_ok = None
            if n_valid is not None:
                col_ok = jnp.arange(B) < n_valid
                row_ok = rows < n_valid
                costs = _mask_pad_costs(costs, row_ok, col_ok)
            log_a = _sharded_sinkhorn_rows(
                -lam * costs,
                n_iters,
                axis_name,
                tol=tol,
                use_pallas=use_pallas,
            )
            p, entropy = _row_softmax_entropy(
                log_a, axis_name, row_ok=row_ok, n_valid=n_valid
            )
            p_aa, p_bb, p_ab = p

            mm = lambda a, b: jnp.matmul(a, b, precision=mm_precision)
            a_a = mm(p_aa, fa)
            b_b = mm(p_bb, fb)
            a_b = mm(p_ab, fb)
            # transposed matmul: local partials reduce-scattered straight to
            # local rows (1/n_dev the bytes of the former psum+slice)
            b_a = jax.lax.psum_scatter(
                mm(p_ab.T, fa_loc), axis_name, scatter_dimension=0, tiled=True
            )  # (b_loc, d)
            return a_a, b_b, a_b, b_a, entropy

        return shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis_name), P(axis_name)),
            out_specs=(
                P(axis_name),
                P(axis_name),
                P(axis_name),
                P(axis_name),
                P(),
            ),
            # VMA typing ON for the XLA paths: it enforces that the tol
            # while_loop carry / stop decision stay axis-invariant (the v
            # potential comes out of pmax/psum collectives). The Pallas local
            # step cannot run under it: pallas_call does not propagate
            # varying-axis types and the interpret-mode lowering hits a JAX
            # dynamic_slice VMA mismatch ("Primitive dynamic_slice requires
            # varying manual axes to match" -- the error itself prescribes
            # check_vma=False as the workaround).
            check_vma=not use_pallas,
        )

    sharded_even = build(None)

    @jax.jit
    def matcher(features_a: jax.Array, features_b: jax.Array):
        B, d = features_a.shape
        if B % n_dev == 0:
            a_a, b_b, a_b, b_a, ent = sharded_even(features_a, features_b)
            return MatchedFeatures(a_a, b_b, a_b, b_a, ent)
        # uneven shards: zero-pad the batch tail, run masked, slice back
        b_loc = -(-B // n_dev)
        pad = b_loc * n_dev - B
        z = jnp.zeros((pad, d), features_a.dtype)
        fa = jnp.concatenate([features_a, z])
        fb = jnp.concatenate([features_b, z])
        a_a, b_b, a_b, b_a, ent = build(B)(fa, fb)
        return MatchedFeatures(
            a_a[:B], b_b[:B], a_b[:B], b_a[:B], ent
        )

    return matcher


def sharded_permutation(batch: int, n_dev: int):
    """Global-batch permutation mapping the sharded matcher's local-half
    convention onto the global matcher's B/2 split: permuted[i] lists the
    global row index whose sharded role equals global-matcher row i."""
    b_loc = batch // n_dev
    n_loc = b_loc // 2
    first = [k * b_loc + i for k in range(n_dev) for i in range(n_loc)]
    second = [k * b_loc + n_loc + i for k in range(n_dev) for i in range(n_loc)]
    return first + second
