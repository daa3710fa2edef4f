"""Log-domain Sinkhorn iteration, TPU-first.

Behavioral contract (matches the reference, ``utils/matching.py:50-57`` in
openai/ot-gan): starting from ``log_a = -lam * cost``, alternate

    log_a -= logsumexp(log_a, axis=1, keepdims=True)   # row normalize
    log_a -= logsumexp(log_a, axis=0, keepdims=True)   # col normalize

for ``n_iters`` iterations, then return the soft assignment
``P = softmax(log_a, axis=1)`` and the mean row entropy of ``P``
(``tf.nn.softmax_cross_entropy_with_logits(labels=P, logits=log_a)`` in the
reference == the Shannon entropy of each row of P, averaged over rows).

TPU-native design
-----------------
Instead of materializing and rewriting the full N x N matrix each iteration
(the reference unrolls 500 iterations of full-matrix updates into the graph),
we carry only the *dual potentials* ``u`` (rows) and ``v`` (cols), with the
invariant ``log_a = -lam*C + u[:, None] + v[None, :]``:

    u_i <- -logsumexp_j(-lam*C_ij + v_j)        # row step
    v_j <- -logsumexp_i(-lam*C_ij + u_i)        # col step (uses new u)

This is algebraically identical to the reference recursion, keeps the loop a
single ``lax.fori_loop`` (compiles once, no graph blow-up), touches the cost
matrix read-only (XLA keeps one buffer instead of 500), and is the form that
shards across chips (row-local u; col step = cross-chip logsumexp reduction,
see ``otgan_tpu/parallel``).

All Sinkhorn math is float32: with lam=500 the logits span ~[-1000, 0] and
bfloat16's ~3 decimal digits would corrupt the assignment.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _lse(x: jax.Array, axis: int) -> jax.Array:
    """Max-shifted logsumexp (stable for logits ~ -lam*cost, lam up to 1e3+)."""
    m = jax.lax.stop_gradient(jnp.max(x, axis=axis, keepdims=True))
    return jnp.squeeze(m, axis) + jnp.log(jnp.sum(jnp.exp(x - m), axis=axis))


@functools.partial(jax.jit, static_argnames=("n_iters",))
def sinkhorn_log(neg_lam_cost: jax.Array, n_iters: int):
    """Run Sinkhorn on pre-scaled logits ``-lam * cost``.

    Args:
      neg_lam_cost: ``(..., N, M)`` float32 logits; leading dims are batched
        (the driver batches the 6 two-batch / 3 single-batch matrices into one
        call rather than round-robining them over devices as the reference
        does at ``utils/matching.py:49``).
      n_iters: number of row+col normalization pairs (reference default 500).

    Returns:
      ``(log_a, u, v)`` where ``log_a = neg_lam_cost + u[..., :, None] +
      v[..., None, :]`` is the post-iteration log assignment.
    """
    x = neg_lam_cost.astype(jnp.float32)

    def one(x2d):
        n, m = x2d.shape
        u0 = jnp.zeros((n,), jnp.float32)
        v0 = jnp.zeros((m,), jnp.float32)

        def body(_, uv):
            _, v = uv
            u = -_lse(x2d + v[None, :], axis=1)
            v = -_lse(x2d + u[:, None], axis=0)
            return (u, v)

        u, v = jax.lax.fori_loop(0, n_iters, body, (u0, v0))
        return x2d + u[:, None] + v[None, :], u, v

    batch_shape = x.shape[:-2]
    flat = x.reshape((-1,) + x.shape[-2:])
    log_a, u, v = jax.vmap(one)(flat)
    return (
        log_a.reshape(x.shape),
        u.reshape(batch_shape + x.shape[-2:-1]),
        v.reshape(batch_shape + x.shape[-1:]),
    )


def assignment_and_entropy(log_a: jax.Array):
    """Row-softmax assignment + mean row entropy, reference semantics.

    Reference: ``assignments.append(tf.nn.softmax(log_a))`` and
    ``entropy = mean(softmax_cross_entropy_with_logits(labels=P, logits=log_a))``
    (``utils/matching.py:56-57``). Since labels == softmax(logits), the
    cross-entropy equals the per-row Shannon entropy of P.
    """
    p = jax.nn.softmax(log_a, axis=-1)
    logp = jax.nn.log_softmax(log_a, axis=-1)
    ent = -jnp.sum(p * logp, axis=-1)  # (..., N)
    return p, jnp.mean(ent, axis=-1)


@functools.partial(
    jax.jit, static_argnames=("lam", "n_iters", "use_pallas", "tol")
)
def sinkhorn_assignment(
    cost: jax.Array,
    lam: float,
    n_iters: int,
    use_pallas: bool = False,
    tol: float = 0.0,
):
    """Cost -> (assignment P, mean row entropy).

    ``cost``: ``(..., N, M)``; ``lam``: entropy regularization inverse
    temperature (reference ``--sinkhorn_lambda``, default 500); ``n_iters``:
    reference ``--nr_sinkhorn_iter``, default 500.

    ``use_pallas`` selects the fused VMEM-resident TPU kernel
    (``otgan_tpu/ops/sinkhorn_pallas.py``) when the matrix fits on-chip.

    The assignment is NON-differentiable by design: the reference detaches
    the Sinkhorn plan (backprop is seeded at the feature tensors via
    ``grad_ys``, train.py:108-130), so the cost is stop_gradient-ed here.
    This both encodes the semantics and keeps autodiff from trying to
    linearize through the 500-iteration loop / the Pallas kernel.
    """
    cost = jax.lax.stop_gradient(cost)
    if tol > 0.0:
        # opt-in early exit (n_iters becomes the cap); dynamic trip counts
        # need the XLA while_loop path, not the fixed-loop Pallas kernels
        log_a, _ = sinkhorn_log_tol(
            -lam * cost.astype(jnp.float32), n_iters, tol
        )
        return assignment_and_entropy(log_a)
    if use_pallas:
        from otgan_tpu.ops.sinkhorn_pallas import sinkhorn_assignment_pallas

        return sinkhorn_assignment_pallas(cost, lam, n_iters)
    log_a, _, _ = sinkhorn_log(-lam * cost.astype(jnp.float32), n_iters)
    return assignment_and_entropy(log_a)


@functools.partial(jax.jit, static_argnames=("max_iters", "tol"))
def sinkhorn_log_tol(neg_lam_cost: jax.Array, max_iters: int, tol: float):
    """Early-exit Sinkhorn: iterate until the column potential moves less
    than ``tol`` (sup-norm) or ``max_iters`` is reached.

    OPT-IN deviation from the reference (which always runs exactly
    ``nr_sinkhorn_iter`` pairs): at sharp convergence the potentials stop
    moving long before iteration 500, so a tolerance cuts the matching cost
    with no measurable effect on the assignment. Returns
    ``(log_a, iterations_used)``.
    """
    x = neg_lam_cost.astype(jnp.float32)

    def one(x2d):
        n, m = x2d.shape

        def cond(carry):
            _, _, delta, i = carry
            return jnp.logical_and(i < max_iters, delta >= tol)

        def body(carry):
            _, v_prev, _, i = carry
            u = -_lse(x2d + v_prev[None, :], axis=1)
            v = -_lse(x2d + u[:, None], axis=0)
            delta = jnp.max(jnp.abs(v - v_prev))
            return (u, v, delta, i + 1)

        u0 = jnp.zeros((n,), jnp.float32)
        v0 = jnp.zeros((m,), jnp.float32)
        u, v, _, iters = jax.lax.while_loop(
            cond, body, (u0, v0, jnp.asarray(jnp.inf, jnp.float32), 0)
        )
        return x2d + u[:, None] + v[None, :], iters

    batch_shape = x.shape[:-2]
    flat = x.reshape((-1,) + x.shape[-2:])
    log_a, iters = jax.lax.map(one, flat)
    return log_a.reshape(x.shape), iters.reshape(batch_shape)
