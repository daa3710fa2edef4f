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
  matmuls (P^T f) are local partials reduced with one ``psum`` and sliced
  back to local rows.

Batch-half convention (two-batch): the global matcher
(`ops.matching.match_two_batch`) splits the batch at B/2; here each chip
splits its LOCAL batch in half (rows [0, b/2) are "batch 1"). The two
conventions are related by a fixed batch permutation — statistically
identical (minibatches are random), and tests verify exact equivalence
modulo that permutation. The single-batch variant has no halving, so it is
exactly equal to the global ``match_single_batch`` row-for-row.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from otgan_tpu.ops.costs import cosine_cost
from otgan_tpu.ops.matching import MatchedFeatures

_PRECISION = jax.lax.Precision.HIGHEST


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
    if use_pallas:
        from otgan_tpu.ops.sinkhorn_pallas_step import (
            fused_local_sinkhorn_step,
            local_step_supported,
            pad_to_grid,
        )

        if local_step_supported(n_loc, n):
            interpret = jax.default_backend() != "tpu"
            n_loc_pad, n_pad = pad_to_grid(n_loc, n)
            if (n_loc_pad, n_pad) != (n_loc, n):
                # block-pad onto the kernel's (8, 128) f32 tile grid; the
                # kernel masks padded rows/columns in-VMEM and the combined
                # column potential is re-masked below (its padded entries
                # come back non-finite: s_glob sums to 0 there)
                x_run = jnp.pad(
                    x_loc,
                    ((0, 0), (0, n_loc_pad - n_loc), (0, n_pad - n)),
                )
                col_ok = (jnp.arange(n_pad) < n)[None, :]
            local_step = functools.partial(
                fused_local_sinkhorn_step,
                interpret=interpret,
                n_rows=n_loc,
                n_cols=n,
            )
        else:
            local_step = _local_step_xla
    else:
        local_step = _local_step_xla

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


def _row_softmax_entropy(log_a: jax.Array, axis_name: str):
    p = jax.nn.softmax(log_a, axis=-1)
    logp = jax.nn.log_softmax(log_a, axis=-1)
    ent_loc = jnp.mean(-jnp.sum(p * logp, axis=-1))  # mean over local rows
    return p, jax.lax.pmean(ent_loc, axis_name)


def make_sharded_two_batch_matcher(
    mesh: Mesh,
    lam: float,
    n_iters: int,
    cost_fn: Callable = cosine_cost,
    axis_name: str = "data",
    tol: float = 0.0,
    use_pallas: bool = False,
):
    """Build a jitted ``(features_a, features_b) -> MatchedFeatures`` over a
    1-D mesh. Inputs are global (B, d) arrays sharded (or shardable) on the
    batch axis; outputs are batch-sharded with rows aligned to inputs."""

    n_dev = mesh.devices.size

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
        log_a = _sharded_sinkhorn_rows(
            -lam * costs, n_iters, axis_name, tol=tol, use_pallas=use_pallas
        )
        p, entropy = _row_softmax_entropy(log_a, axis_name)
        p_a1a2, p_b2b1, p_a1b1, p_a1b2, p_a2b1, p_a2b2 = p

        mm = lambda a, b: jnp.matmul(a, b, precision=_PRECISION)

        # direct matmuls: local rows x gathered features
        a1_a = mm(p_a1a2, fa2)  # matched for local a1 rows
        b2_b = mm(p_b2b1, fb1)  # matched for local b2 rows
        a1_b = 0.5 * (mm(p_a1b1, fb1) + mm(p_a1b2, fb2))
        a2_b = 0.5 * (mm(p_a2b1, fb1) + mm(p_a2b2, fb2))

        # transposed matmuls: per-chip partial sums -> one fused psum ->
        # slice back to local rows (replaces the reference's full-matrix
        # transpose matmuls, utils/matching.py:70-75)
        partials = jnp.stack(
            [
                mm(p_a1a2.T, fa1l),  # -> a2 rows matched from a1
                mm(p_b2b1.T, fb2l),  # -> b1 rows matched from b2
                mm(p_a1b1.T, fa1l) + mm(p_a2b1.T, fa2l),  # -> b1 rows from a
                mm(p_a1b2.T, fa1l) + mm(p_a2b2.T, fa2l),  # -> b2 rows from a
            ]
        )  # (4, N, d) partial over local rows
        full = jax.lax.psum(partials, axis_name)
        idx = jax.lax.axis_index(axis_name)
        sl = lambda t: jax.lax.dynamic_slice_in_dim(t, idx * n_loc, n_loc, 0)
        a2_a = sl(full[0])
        b1_b = sl(full[1])
        b1_a = 0.5 * sl(full[2])
        b2_a = 0.5 * sl(full[3])

        # reassemble in local input order [batch1; batch2]
        a_a = jnp.concatenate([a1_a, a2_a])
        b_b = jnp.concatenate([b1_b, b2_b])
        a_b = jnp.concatenate([a1_b, a2_b])
        b_a = jnp.concatenate([b1_a, b2_a])
        return a_a, b_b, a_b, b_a, entropy

    sharded = shard_map(
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

    @jax.jit
    def matcher(features_a: jax.Array, features_b: jax.Array):
        B = features_a.shape[0]
        if B % (2 * n_dev) != 0:
            raise ValueError(
                f"global batch {B} must be divisible by 2*n_devices "
                f"({2 * n_dev}) for sharded two-batch matching"
            )
        a_a, b_b, a_b, b_a, ent = sharded(features_a, features_b)
        return MatchedFeatures(a_a, b_b, a_b, b_a, ent)

    return matcher


def make_sharded_single_batch_matcher(
    mesh: Mesh,
    lam: float,
    n_iters: int,
    cost_fn: Callable = cosine_cost,
    axis_name: str = "data",
    tol: float = 0.0,
    use_pallas: bool = False,
):
    """Row-sharded single-batch matcher (reference
    ``get_matched_features_single_batch``, ``utils/matching.py:88-136``):
    3 cost matrices (a·a, b·b, a·b) with ``+999`` on the self-match
    diagonals (``:109-110``). No batch halving, so outputs are EXACTLY the
    global ``match_single_batch`` rows (no permutation)."""

    n_dev = mesh.devices.size

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
        log_a = _sharded_sinkhorn_rows(
            -lam * costs, n_iters, axis_name, tol=tol, use_pallas=use_pallas
        )
        p, entropy = _row_softmax_entropy(log_a, axis_name)
        p_aa, p_bb, p_ab = p

        mm = lambda a, b: jnp.matmul(a, b, precision=_PRECISION)
        a_a = mm(p_aa, fa)
        b_b = mm(p_bb, fb)
        a_b = mm(p_ab, fb)
        # transposed matmul: local partial -> psum -> local rows
        full = jax.lax.psum(mm(p_ab.T, fa_loc), axis_name)  # (B, d)
        b_a = jax.lax.dynamic_slice_in_dim(full, idx * b_loc, b_loc, 0)
        return a_a, b_b, a_b, b_a, entropy

    sharded = shard_map(
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

    @jax.jit
    def matcher(features_a: jax.Array, features_b: jax.Array):
        B = features_a.shape[0]
        if B % n_dev != 0:
            raise ValueError(
                f"global batch {B} must be divisible by n_devices "
                f"({n_dev}) for sharded single-batch matching"
            )
        a_a, b_b, a_b, b_a, ent = sharded(features_a, features_b)
        return MatchedFeatures(a_a, b_b, a_b, b_a, ent)

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
