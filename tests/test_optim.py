"""Optimizer parity vs numpy transcriptions of the reference update
equations (utils/nn.py:29-87), including negative-lr ascent."""

import numpy as np
import jax.numpy as jnp

from otgan_tpu.nn.optim import (
    adam_init,
    adam_update,
    adamax_init,
    adamax_update,
    nesterov_init,
    nesterov_update,
    make_optimizer,
)
from otgan_tpu.nn.ema import ema_init, ema_update


def _np_adam(p, gs, lr, mom1=0.5, mom2=0.999):
    """utils/nn.py:50-73 in numpy: shared t from 1, eps inside sqrt."""
    t = 1.0
    v = np.zeros_like(p)
    mg = np.zeros_like(p)
    for g in gs:
        v = mom1 * v + (1 - mom1) * g
        v_hat = v / (1 - mom1**t)
        mg = mom2 * mg + (1 - mom2) * g**2
        mg_hat = mg / (1 - mom2**t)
        p = p - lr * v_hat / np.sqrt(mg_hat + 1e-8)
        t += 1
    return p


def _np_adamax(p, gs, lr, mom1=0.5, mom2=0.999):
    v = np.zeros_like(p)
    mg = np.zeros_like(p)
    for g in gs:
        v = mom1 * v + (1 - mom1) * g
        mg = np.maximum(mom2 * mg + 1e-8, np.abs(g))
        p = p - lr * v / mg
    return p


def _np_nesterov(p, gs, lr, mom1=0.9):
    v = np.zeros_like(p)
    for g in gs:
        v_new = mom1 * v - lr * g
        p = p - mom1 * v + (1 + mom1) * v_new
        v = v_new
    return p


def _run(update, init, p0, gs, lr, **kw):
    params = {"w": jnp.asarray(p0)}
    state = init(params)
    for g in gs:
        params, state = update(params, {"w": jnp.asarray(g)}, state, lr, **kw)
    return np.asarray(params["w"])


def test_adam_parity_positive_and_negative_lr():
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal((3, 4)).astype(np.float32)
    gs = [rng.standard_normal((3, 4)).astype(np.float32) for _ in range(7)]
    for lr in (3e-4, -3e-4):
        want = _np_adam(p0.astype(np.float64), gs, lr)
        got = _run(adam_update, adam_init, p0, gs, lr, mom1=0.5, mom2=0.999)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_negative_lr_matches_negated_gradient_for_adam():
    """Adam is sign-symmetric (flipping g flips v_hat, mg is unchanged), so
    ascent via -lr == descent on -g. Verify numerically so the reference's
    -lr convention (train.py:143) is known-safe to implement either way."""
    rng = np.random.default_rng(1)
    p0 = rng.standard_normal((5,)).astype(np.float32)
    gs = [rng.standard_normal((5,)).astype(np.float32) for _ in range(5)]
    neg_lr = _run(adam_update, adam_init, p0, gs, -1e-3, mom1=0.5)
    neg_g = _run(
        adam_update, adam_init, p0, [-g for g in gs], 1e-3, mom1=0.5
    )
    # identical here because Adam is sign-symmetric... verify numerically:
    # v and mg both flip consistently => Adam IS sign-symmetric, so these
    # agree; the reference chose -lr for generality with other optimizers.
    np.testing.assert_allclose(neg_lr, neg_g, rtol=1e-5, atol=1e-7)
    # nesterov is also sign-symmetric; adamax too. Keep ascent-by-lr anyway.


def test_adamax_parity():
    rng = np.random.default_rng(2)
    p0 = rng.standard_normal((6,)).astype(np.float32)
    gs = [rng.standard_normal((6,)).astype(np.float32) for _ in range(6)]
    want = _np_adamax(p0.astype(np.float64), gs, 1e-3)
    got = _run(adamax_update, adamax_init, p0, gs, 1e-3, mom1=0.5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_nesterov_parity():
    rng = np.random.default_rng(3)
    p0 = rng.standard_normal((6,)).astype(np.float32)
    gs = [rng.standard_normal((6,)).astype(np.float32) for _ in range(6)]
    want = _np_nesterov(p0.astype(np.float64), gs, 1e-2)
    got = _run(nesterov_update, nesterov_init, p0, gs, 1e-2, mom1=0.9)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_make_optimizer_switch():
    for name in ("adam", "adamax", "nesterov"):
        init, update = make_optimizer(name)
        params = {"w": jnp.ones((2,))}
        s = init(params)
        p, s = update(params, {"w": jnp.ones((2,))}, s, 0.1)
        assert p["w"].shape == (2,)
    try:
        make_optimizer("sgd")
        assert False
    except ValueError:
        pass


def test_ema():
    p = {"w": jnp.asarray([1.0, 2.0])}
    e = ema_init(p)
    np.testing.assert_allclose(np.asarray(e["w"]), [1.0, 2.0])
    p2 = {"w": jnp.asarray([3.0, 4.0])}
    e = ema_update(e, p2, decay=0.9)
    np.testing.assert_allclose(np.asarray(e["w"]), [1.2, 2.2], atol=1e-6)
