"""Pure-numpy transcription of the reference matching semantics, used as the
parity oracle for otgan_tpu.ops (SURVEY.md section 4, test strategy item (b)).

This is an independent float64 re-derivation of the behavior of
openai/ot-gan ``utils/matching.py`` and ``toy_example/matching_cpu.py``
(per-GPU tensor lists flattened to global matrices), NOT a copy: the reference
is TF1 graph code; this is the same math in numpy for testing only.
"""

from __future__ import annotations

import numpy as np


def lse(x, axis, keepdims=True):
    m = np.max(x, axis=axis, keepdims=True)
    out = m + np.log(np.sum(np.exp(x - m), axis=axis, keepdims=True))
    return out if keepdims else np.squeeze(out, axis)


def softmax(x, axis=-1):
    e = np.exp(x - np.max(x, axis=axis, keepdims=True))
    return e / np.sum(e, axis=axis, keepdims=True)


def sinkhorn_np(cost, lam, n_iters):
    """Full-matrix log-domain Sinkhorn exactly as the reference writes it."""
    log_a = -lam * np.asarray(cost, np.float64)
    for _ in range(n_iters):
        log_a = log_a - lse(log_a, axis=1)
        log_a = log_a - lse(log_a, axis=0)
    p = softmax(log_a, axis=1)
    # softmax_cross_entropy_with_logits(labels=p, logits=log_a) == row entropy
    logp = log_a - lse(log_a, axis=1)
    ent = float(np.mean(-np.sum(p * logp, axis=1)))
    return p, ent


def cosine_cost_np(a, b):
    return 1.0 - np.asarray(a, np.float64) @ np.asarray(b, np.float64).T


def toy_cost_np(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    d = a.shape[1]
    return (
        0.5 * np.mean(a**2, axis=1, keepdims=True)
        + 0.5 * np.mean(b**2, axis=1, keepdims=True).T
        - a @ b.T / d
    )


def match_two_batch_np(fa, fb, lam, n_iters, cost_fn=cosine_cost_np):
    n = fa.shape[0] // 2
    fa1, fa2 = fa[:n], fa[n:]
    fb1, fb2 = fb[:n], fb[n:]
    costs = [
        cost_fn(fa1, fa2),
        cost_fn(fb2, fb1),
        cost_fn(fa1, fb1),
        cost_fn(fa1, fb2),
        cost_fn(fa2, fb1),
        cost_fn(fa2, fb2),
    ]
    ps, ents = zip(*(sinkhorn_np(c, lam, n_iters) for c in costs))
    p_a1a2, p_b2b1, p_a1b1, p_a1b2, p_a2b1, p_a2b2 = ps

    a_a = np.concatenate([p_a1a2 @ fa2, p_a1a2.T @ fa1])
    b_b = np.concatenate([p_b2b1.T @ fb2, p_b2b1 @ fb1])
    a_b = 0.5 * np.concatenate(
        [p_a1b1 @ fb1 + p_a1b2 @ fb2, p_a2b1 @ fb1 + p_a2b2 @ fb2]
    )
    b_a = 0.5 * np.concatenate(
        [p_a1b1.T @ fa1 + p_a2b1.T @ fa2, p_a1b2.T @ fa1 + p_a2b2.T @ fa2]
    )
    return a_a, b_b, a_b, b_a, float(np.mean(ents))


def match_single_batch_np(fa, fb, lam, n_iters, cost_fn=cosine_cost_np):
    B = fa.shape[0]
    eye = 999.0 * np.eye(B)
    costs = [
        cost_fn(fa, fa) + eye,
        cost_fn(fb, fb) + eye,
        cost_fn(fa, fb),
    ]
    ps, ents = zip(*(sinkhorn_np(c, lam, n_iters) for c in costs))
    p_aa, p_bb, p_ab = ps
    return (
        p_aa @ fa,
        p_bb @ fb,
        p_ab @ fb,
        p_ab.T @ fa,
        float(np.mean(ents)),
    )


def match_random_np(fa, fb, shard_size):
    return (
        np.roll(fa, -shard_size, axis=0),
        np.roll(fb, -shard_size, axis=0),
        fb,
        fa,
        0.0,
    )


def calc_distance_np(fa, fb, matched):
    a_a, b_b, a_b = matched[0], matched[1], matched[2]
    B = fa.shape[0]
    return (
        np.sum(fb * b_b) + np.sum(fa * a_a) - 2.0 * np.sum(fa * a_b)
    ) / (2.0 * B)


def l2_normalize_rows(x):
    x = np.asarray(x, np.float64)
    return x / np.sqrt(np.sum(x**2, axis=1, keepdims=True))
