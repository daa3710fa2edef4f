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
  column maxima + ``psum`` of shifted exponentials — 2 small (6, N)
  collectives per iteration riding ICI;
* matched features: direct matmuls are local row-blocks; transposed
  matmuls (P^T f) are local partials reduced with one ``psum`` and sliced
  back to local rows.

Batch-half convention: the global matcher (`ops.matching.match_two_batch`)
splits the batch at B/2; here each chip splits its LOCAL batch in half
(rows [0, b/2) are "batch 1"). The two conventions are related by a fixed
batch permutation — statistically identical (minibatches are random), and
tests verify exact equivalence modulo that permutation.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from otgan_tpu.ops.costs import cosine_cost
from otgan_tpu.ops.matching import MatchedFeatures

_PRECISION = jax.lax.Precision.HIGHEST


def _sharded_sinkhorn_rows(
    x_loc: jax.Array, n_iters: int, axis_name: str
) -> jax.Array:
    """Sinkhorn on row-sharded logits ``x_loc`` (..., n_loc, N).

    Returns the final row-sharded ``log_a`` (reference recursion,
    ``utils/matching.py:50-54``). Row-softmax invariance makes the row
    potential irrelevant to the outputs, so the carry is (u_loc, v).
    """
    x_loc = jax.lax.stop_gradient(x_loc)

    def body(_, carry):
        u_loc, v = carry
        # row step: rows are complete on-chip
        y = x_loc + v
        m = jnp.max(y, axis=-1, keepdims=True)
        u_loc = -(
            m + jnp.log(jnp.sum(jnp.exp(y - m), axis=-1, keepdims=True))
        )
        # col step: distributed logsumexp over all chips' rows
        z = x_loc + u_loc
        m_loc = jnp.max(z, axis=-2, keepdims=True)
        m_glob = jax.lax.pmax(m_loc, axis_name)
        s_loc = jnp.sum(jnp.exp(z - m_glob), axis=-2, keepdims=True)
        s_glob = jax.lax.psum(s_loc, axis_name)
        v = -(m_glob + jnp.log(s_glob))
        return (u_loc, v)

    # shard_map varying-axis typing: u is per-chip (mesh-varying) so its
    # carry init derives from x_loc; v comes out of pmax/psum collectives
    # (axis-INVARIANT) so its init must be plain (invariant) zeros.
    u0 = jnp.zeros_like(x_loc[..., :1])
    v0 = jnp.zeros(x_loc.shape[:-2] + (1, x_loc.shape[-1]), jnp.float32)
    u_loc, v = jax.lax.fori_loop(0, n_iters, body, (u0, v0))
    return x_loc + u_loc + v


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
        log_a = _sharded_sinkhorn_rows(-lam * costs, n_iters, axis_name)
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


def sharded_permutation(batch: int, n_dev: int):
    """Global-batch permutation mapping the sharded matcher's local-half
    convention onto the global matcher's B/2 split: permuted[i] lists the
    global row index whose sharded role equals global-matcher row i."""
    b_loc = batch // n_dev
    n_loc = b_loc // 2
    first = [k * b_loc + i for k in range(n_dev) for i in range(n_loc)]
    second = [k * b_loc + n_loc + i for k in range(n_dev) for i in range(n_loc)]
    return first + second
