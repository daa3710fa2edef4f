"""Exponential moving average of parameters as a pytree transform.

Replaces ``tf.train.ExponentialMovingAverage(decay=0.999)`` over the
generator params (``train.py:63-64``) and the EMA variable substitution in
layers (``utils/nn.py:89-93``): sampling with averaged weights is simply
``model.apply(ema_params, ...)``.

TF semantics kept: the shadow initializes to the variable's initial value and
updates ``shadow = decay*shadow + (1-decay)*value`` on each *generator* step
only (the EMA op runs in the generator fetch, ``train.py:223``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Pytree = Any


def ema_init(params: Pytree) -> Pytree:
    """Shadow starts as a COPY of the params (TF EMA initial value). A real
    copy matters: aliasing the same buffers would break jit donation
    (`donate the same buffer twice`) when params and shadow live in one
    train-state pytree."""
    return jax.tree.map(jnp.copy, params)


def ema_update(ema: Pytree, params: Pytree, decay: float = 0.999) -> Pytree:
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p, ema, params)
