"""Optimal-transport minibatch matching (the heart of the framework).

TPU-native re-formulation of the reference's per-GPU-list matching code
(``utils/matching.py`` in openai/ot-gan). The reference passes around lists of
per-GPU feature tensors and hand-places cost rows / Sinkhorn instances on
devices; here every matcher is a pure function of *global* feature matrices
``(B, d)``. Distribution is orthogonal: under ``jit`` with batch-sharded
inputs XLA/GSPMD partitions the cost matmuls and reductions itself, and
``otgan_tpu/parallel`` provides an explicit ``shard_map`` row-sharded variant.

The three reference matching modes are reproduced exactly:

* ``match_two_batch``   — the paper's estimator: split each side into halves,
  6 cosine-cost matrices, 6 Sinkhorns, 12 matched-feature matmuls recombined
  into 4 outputs (``utils/matching.py:11-85``).
* ``match_single_batch`` — "simplified, more efficient, but slightly wrong":
  3 matrices with ``+999*I`` on the self-match diagonals
  (``utils/matching.py:88-136``).
* ``match_random``      — the ``--no_sinkhorn`` ablation: rotate the generated
  batch by one per-device shard (``utils/matching.py:3-9``).

All 6 (or 3) same-shaped cost matrices are stacked and run through ONE batched
Sinkhorn program (vmapped ``lax.fori_loop``) — on TPU this keeps the MXU/VPU
busy with one large fused computation instead of the reference's round-robin
device placement (``utils/matching.py:49``).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from otgan_tpu.ops.costs import (
    cosine_cost,
    resolve_precision,
    scaled_sqeuclidean_cost,
)
from otgan_tpu.ops.sinkhorn import sinkhorn_assignment

_PRECISION = jax.lax.Precision.HIGHEST


def _with_precision(cost_fn: Callable, precision) -> Callable:
    """Bind an explicit matmul precision into ``cost_fn``. ``None`` (the
    default everywhere) returns ``cost_fn`` unchanged so custom two-argument
    cost functions keep working and the default path stays byte-identical."""
    if precision is None:
        return cost_fn
    return functools.partial(cost_fn, precision=resolve_precision(precision))


class MatchedFeatures(NamedTuple):
    """The 4 matched-feature tensors + matching entropy.

    Order follows the reference's return
    ``(features_a_a, features_b_b, features_a_b, features_b_a, entropy)``
    where ``a`` = generated, ``b`` = data (``utils/matching.py:85``).
    """

    a_a: jax.Array  # (B, d) a-side rows matched against the other a half/batch
    b_b: jax.Array  # (B, d) b-side rows matched within b
    a_b: jax.Array  # (B, d) a rows matched to b
    b_a: jax.Array  # (B, d) b rows matched to a
    entropy: jax.Array  # scalar, mean row entropy of the soft assignments


def _mm(p: jax.Array, f: jax.Array, precision=None) -> jax.Array:
    return jnp.matmul(
        p, f, precision=_PRECISION if precision is None else precision
    )


def two_batch_costs(
    features_a: jax.Array,
    features_b: jax.Array,
    cost_fn: Callable = cosine_cost,
    precision=None,
) -> jax.Array:
    """The two-batch mode's 6 stacked cost matrices in reference order:
    a1a2, b2b1, a1b1, a1b2, a2b1, a2b2 (``utils/matching.py:41-43``).
    Exposed for diagnostics (e.g. the bench's --sinkhorn_tol quality
    probe) so callers never re-derive the half-split/order convention."""
    cost_fn = _with_precision(cost_fn, precision)
    n = features_a.shape[0] // 2
    fa1, fa2 = features_a[:n], features_a[n:]
    fb1, fb2 = features_b[:n], features_b[n:]
    return jnp.stack(
        [
            cost_fn(fa1, fa2),
            cost_fn(fb2, fb1),
            cost_fn(fa1, fb1),
            cost_fn(fa1, fb2),
            cost_fn(fa2, fb1),
            cost_fn(fa2, fb2),
        ]
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "lam", "n_iters", "cost_fn", "use_pallas", "tol", "precision"
    ),
)
def match_two_batch(
    features_a: jax.Array,
    features_b: jax.Array,
    lam: float = 500.0,
    n_iters: int = 500,
    cost_fn: Callable = cosine_cost,
    use_pallas: bool = False,
    tol: float = 0.0,
    precision: str | None = None,
) -> MatchedFeatures:
    """Two-batch MED matching (reference ``get_matched_features``).

    ``features_a``/``features_b``: (B, d) with B even; the first/second halves
    play the roles of the reference's first/second half-GPU groups
    (``utils/matching.py:16-19``; toy variant ``matching_cpu.py:7-8``).
    """
    B = features_a.shape[0]
    if B % 2 != 0:
        raise ValueError(
            f"two-batch matching needs an even global batch, got B={B} "
            "(the reference enforces this via `assert nr_gpu % 2 == 0`, "
            "train.py:34)"
        )
    n = B // 2
    fa1, fa2 = features_a[:n], features_a[n:]
    fb1, fb2 = features_b[:n], features_b[n:]

    prec = None if precision is None else resolve_precision(precision)
    costs = two_batch_costs(features_a, features_b, cost_fn, precision)
    p, ent = sinkhorn_assignment(
        costs, lam, n_iters, use_pallas=use_pallas, tol=tol
    )
    p_a1a2, p_b2b1, p_a1b1, p_a1b2, p_a2b1, p_a2b2 = p

    # 12 matched-feature matmuls (utils/matching.py:64-75), recombined into 4
    # global outputs (|| = concat along the batch axis, halves in order).
    mm = functools.partial(_mm, precision=prec)
    a_a = jnp.concatenate([mm(p_a1a2, fa2), mm(p_a1a2.T, fa1)])
    b_b = jnp.concatenate([mm(p_b2b1.T, fb2), mm(p_b2b1, fb1)])
    a_b = 0.5 * jnp.concatenate(
        [
            mm(p_a1b1, fb1) + mm(p_a1b2, fb2),
            mm(p_a2b1, fb1) + mm(p_a2b2, fb2),
        ]
    )
    b_a = 0.5 * jnp.concatenate(
        [
            mm(p_a1b1.T, fa1) + mm(p_a2b1.T, fa2),
            mm(p_a1b2.T, fa1) + mm(p_a2b2.T, fa2),
        ]
    )
    return MatchedFeatures(a_a, b_b, a_b, b_a, jnp.mean(ent))


@functools.partial(
    jax.jit,
    static_argnames=(
        "lam", "n_iters", "cost_fn", "use_pallas", "tol", "precision"
    ),
)
def match_single_batch(
    features_a: jax.Array,
    features_b: jax.Array,
    lam: float = 500.0,
    n_iters: int = 500,
    cost_fn: Callable = cosine_cost,
    use_pallas: bool = False,
    tol: float = 0.0,
    precision: str | None = None,
) -> MatchedFeatures:
    """Single-batch matching (reference ``get_matched_features_single_batch``).

    One batch per side; self-match diagonals get +999 so a sample can't be
    transported to itself (``utils/matching.py:109-110``).
    """
    B = features_a.shape[0]
    prec = None if precision is None else resolve_precision(precision)
    cf = _with_precision(cost_fn, precision)
    eye = 999.0 * jnp.eye(B, dtype=jnp.float32)
    costs = jnp.stack(
        [
            cf(features_a, features_a) + eye,
            cf(features_b, features_b) + eye,
            cf(features_a, features_b),
        ]
    )
    p, ent = sinkhorn_assignment(
        costs, lam, n_iters, use_pallas=use_pallas, tol=tol
    )
    p_aa, p_bb, p_ab = p

    a_a = _mm(p_aa, features_a, prec)
    b_b = _mm(p_bb, features_b, prec)
    a_b = _mm(p_ab, features_b, prec)
    b_a = _mm(p_ab.T, features_a, prec)
    return MatchedFeatures(a_a, b_b, a_b, b_a, jnp.mean(ent))


@functools.partial(jax.jit, static_argnames=("shard_size",))
def match_random(
    features_a: jax.Array,
    features_b: jax.Array,
    shard_size: int,
) -> MatchedFeatures:
    """``--no_sinkhorn`` ablation (reference ``get_matched_features_random``).

    The reference rotates the per-GPU list by one
    (``features_a[1:] + features_a[:1]``, ``utils/matching.py:3-9``); on a
    global batch that is a roll by one device-shard of ``shard_size`` rows.
    """
    a_a = jnp.roll(features_a, -shard_size, axis=0)
    b_b = jnp.roll(features_b, -shard_size, axis=0)
    return MatchedFeatures(
        a_a, b_b, features_b, features_a, jnp.zeros((), jnp.float32)
    )


@jax.jit
def calc_distance(
    features_a: jax.Array,
    features_b: jax.Array,
    matched: MatchedFeatures,
) -> jax.Array:
    """Reported MED transport distance (reference ``calc_distance``,
    ``utils/matching.py:139-153``): ``(<f_a,f_aa> + <f_b,f_bb> - 2<f_a,f_ab>)
    / (2 * global_batch)`` with full-tensor inner products."""
    B = features_a.shape[0]
    nd_aa = jnp.sum(features_a * matched.a_a)
    nd_bb = jnp.sum(features_b * matched.b_b)
    nd_ab = jnp.sum(features_a * matched.a_b)
    return (nd_bb + nd_aa - 2.0 * nd_ab) / (2.0 * B)


@jax.jit
def calc_distance_mean(
    features_a: jax.Array,
    features_b: jax.Array,
    matched: MatchedFeatures,
) -> jax.Array:
    """Toy-example variant (``toy_example/matching_cpu.py:155-164``):
    mean-based inner products, divided by 2."""
    nd_aa = jnp.mean(features_a * matched.a_a)
    nd_bb = jnp.mean(features_b * matched.b_b)
    nd_ab = jnp.mean(features_a * matched.a_b)
    return (nd_bb + nd_aa - 2.0 * nd_ab) / 2.0


# Re-export toy cost under the name users of the reference toy code expect.
toy_cost = scaled_sqeuclidean_cost
