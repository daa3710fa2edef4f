"""Transport cost functions.

Two cost families appear in the reference:

* **cosine cost** ``1 - f_a @ f_b.T`` for the CIFAR pipeline, valid because the
  critic L2-normalizes its feature rows (``utils/matching.py:31-39``,
  ``models/dcgan.py:19``);
* **scaled squared-Euclidean cost**
  ``0.5*mean(a^2, -1)[:, None] + 0.5*mean(b^2, -1)[None, :] - a @ b.T / d``
  for the 2D toy pipeline (``toy_example/matching_cpu.py:17-45``), i.e.
  ``||a - b||^2 / (2 d)``.

Cost matmuls are the MXU-heavy part of matching; they run in float32 (HIGHEST
precision by default) because lam=500 amplifies cost error 500x in the
Sinkhorn logits. On TPU a float32 matmul executes on the MXU as a multi-pass
bfloat16 decomposition: ``HIGHEST`` is the full-accuracy path, ``HIGH`` the
3-pass variant at roughly twice the matmul throughput with ~1e-6-class
relative error, ``DEFAULT`` a single bf16 pass (f32 accumulate). The
``--matching_precision`` knob (config.py) threads through every matching
matmul — cost AND matched-feature — as an opt-in speed/accuracy trade;
the default is byte-identical to the previous always-HIGHEST behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PRECISION = jax.lax.Precision.HIGHEST

PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def resolve_precision(precision) -> jax.lax.Precision:
    """Map a ``--matching_precision`` value (str | Precision | None) onto a
    ``jax.lax.Precision``. ``None`` means the module default (HIGHEST)."""
    if precision is None:
        return _PRECISION
    if isinstance(precision, jax.lax.Precision):
        return precision
    try:
        return PRECISIONS[precision]
    except KeyError:
        raise ValueError(
            f"matching precision must be one of {sorted(PRECISIONS)}, "
            f"got {precision!r}"
        ) from None


def cosine_cost(f_a: jax.Array, f_b: jax.Array, precision=None) -> jax.Array:
    """``1 - f_a @ f_b.T`` for row-L2-normalized features. (N,d),(M,d)->(N,M)."""
    return 1.0 - jnp.matmul(
        f_a.astype(jnp.float32),
        f_b.astype(jnp.float32).T,
        precision=resolve_precision(precision),
    )


def scaled_sqeuclidean_cost(
    f_a: jax.Array, f_b: jax.Array, precision=None
) -> jax.Array:
    """Toy-example cost: ``||a-b||^2 / (2 d)`` expanded as in the reference."""
    a = f_a.astype(jnp.float32)
    b = f_b.astype(jnp.float32)
    d = a.shape[-1]
    asq = 0.5 * jnp.mean(jnp.square(a), axis=-1, keepdims=True)  # (N,1)
    bsq = 0.5 * jnp.mean(jnp.square(b), axis=-1, keepdims=True).T  # (1,M)
    return asq + bsq - jnp.matmul(
        a, b.T, precision=resolve_precision(precision)
    ) / d
