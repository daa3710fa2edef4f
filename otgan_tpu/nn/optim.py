"""Custom optimizers matching the reference update equations bit-for-bit.

The reference hand-rolls Adam / Adamax / Nesterov over explicit grad lists
(``utils/nn.py:29-87``) because the driver injects hand-built gradients and
trains the critic by *gradient ascent via a negative learning rate*
(``train.py:141-151``). Differences from textbook/optax Adam that we must
keep (SURVEY.md section 7 "adversarial ascent"):

* epsilon sits INSIDE the sqrt: ``step = v_hat / sqrt(mg_hat + 1e-8)``
  (``utils/nn.py:68``);
* one shared scalar step counter ``t`` starting at 1 (``utils/nn.py:56``);
* Adamax has NO bias correction and a ``+1e-8`` inside the max
  (``utils/nn.py:43``);
* the learning rate is a runtime tensor and may be negative — sign flows
  through the parameter update only, leaving moment dynamics identical to
  descent (this is NOT the same as negating the gradients, since mg tracks
  g^2 but v changes sign; replicate exactly).

All transforms are pure pytree functions: ``state = *_init(params)``;
``params, state = *_update(params, grads, state, lr)``.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

Pytree = Any


class AdamState(NamedTuple):
    t: jax.Array  # shared scalar step, starts at 1 (utils/nn.py:56)
    v: Pytree  # first moment
    mg: Pytree  # second moment


def adam_init(params: Pytree) -> AdamState:
    z = jax.tree.map(jnp.zeros_like, params)
    return AdamState(t=jnp.asarray(1.0, jnp.float32), v=z, mg=jax.tree.map(jnp.zeros_like, params))


def adam_update(
    params: Pytree,
    grads: Pytree,
    state: AdamState,
    lr,
    mom1: float = 0.9,
    mom2: float = 0.999,
) -> Tuple[Pytree, AdamState]:
    """Reference ``adam_updates`` (``utils/nn.py:50-73``)."""
    t = state.t
    one_m1 = 1.0 - jnp.power(mom1, t)
    one_m2 = 1.0 - jnp.power(mom2, t)

    def upd(p, g, v, mg):
        v_t = mom1 * v + (1.0 - mom1) * g
        v_hat = v_t / one_m1 if mom1 > 0 else g
        mg_t = mom2 * mg + (1.0 - mom2) * jnp.square(g)
        mg_hat = mg_t / one_m2
        p_t = p - lr * v_hat / jnp.sqrt(mg_hat + 1e-8)
        return p_t, v_t, mg_t

    out = jax.tree.map(upd, params, grads, state.v, state.mg)
    p_new = jax.tree.map(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
    v_new = jax.tree.map(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
    mg_new = jax.tree.map(lambda o: o[2], out, is_leaf=lambda x: isinstance(x, tuple))
    return p_new, AdamState(t=t + 1.0, v=v_new, mg=mg_new)


class AdamaxState(NamedTuple):
    v: Pytree
    mg: Pytree  # infinity-norm accumulator


def adamax_init(params: Pytree) -> AdamaxState:
    return AdamaxState(
        v=jax.tree.map(jnp.zeros_like, params),
        mg=jax.tree.map(jnp.zeros_like, params),
    )


def adamax_update(
    params: Pytree,
    grads: Pytree,
    state: AdamaxState,
    lr,
    mom1: float = 0.9,
    mom2: float = 0.999,
) -> Tuple[Pytree, AdamaxState]:
    """Reference ``adamax_updates`` (``utils/nn.py:29-48``): no bias
    correction, ``mg_t = max(mom2*mg + 1e-8, |g|)``."""

    def upd(p, g, v, mg):
        v_t = mom1 * v + (1.0 - mom1) * g if mom1 > 0 else g
        mg_t = jnp.maximum(mom2 * mg + 1e-8, jnp.abs(g))
        p_t = p - lr * v_t / mg_t
        return p_t, v_t, mg_t

    out = jax.tree.map(upd, params, grads, state.v, state.mg)
    p_new = jax.tree.map(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
    v_new = jax.tree.map(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
    mg_new = jax.tree.map(lambda o: o[2], out, is_leaf=lambda x: isinstance(x, tuple))
    return p_new, AdamaxState(v=v_new, mg=mg_new)


class NesterovState(NamedTuple):
    v: Pytree


def nesterov_init(params: Pytree) -> NesterovState:
    return NesterovState(v=jax.tree.map(jnp.zeros_like, params))


def nesterov_update(
    params: Pytree,
    grads: Pytree,
    state: NesterovState,
    lr,
    mom1: float = 0.9,
) -> Tuple[Pytree, NesterovState]:
    """Reference ``nesterov_updates`` (``utils/nn.py:75-87``):
    ``v' = mom1*v - lr*g``; ``p' = p - mom1*v + (1+mom1)*v'``."""

    def upd(p, g, v):
        v_new = mom1 * v - lr * g
        p_new = p - mom1 * v + (1.0 + mom1) * v_new
        return p_new, v_new

    out = jax.tree.map(upd, params, grads, state.v)
    p_new = jax.tree.map(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
    v_new = jax.tree.map(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
    return p_new, NesterovState(v=v_new)


_OPTIMIZERS = {
    "adam": (adam_init, adam_update),
    "adamax": (adamax_init, adamax_update),
    "nesterov": (nesterov_init, nesterov_update),
}


def make_optimizer(name: str):
    """Select by the reference's ``--optimizer`` flag values
    (``train.py:141-151``). Returns ``(init_fn, update_fn)``."""
    if name not in _OPTIMIZERS:
        raise ValueError(
            f"unsupported optimizer {name!r}; choose from {sorted(_OPTIMIZERS)}"
        )
    return _OPTIMIZERS[name]
