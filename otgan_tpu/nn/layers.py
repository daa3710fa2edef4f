"""Functional layer library: weight normalization + data-dependent init.

TPU-native re-design of the reference's TF1 layer library
(``utils/nn.py:89-338`` in openai/ot-gan). Key behavioral contracts kept:

* **weight normalization** (Salimans & Kingma 2016): parameters are
  ``(V, g, b)`` with effective weight ``W = g * V / ||V||`` where the norm is
  over all axes except the last (``utils/nn.py:128-131,173-181``);
* **data-dependent init**: on the init pass, ``g = init_scale / std(pre)`` and
  ``b = -mean(pre) * g`` computed from a real batch, so every unit starts with
  mean 0 / std ``init_scale`` activations (``utils/nn.py:108-162``). Note the
  reference *ships* this inert (the init subgraph is never run, see SURVEY.md
  section 3.1 step 8); here it actually executes, as one jitted pass;
* **pre-activation applied inside the op** — None / relu / elu / crelu / celu,
  where the "c" variants concatenate ``[x, -x]`` per input tensor
  (``utils/nn.py:190-206``);
* **list inputs** to conv/pool for DenseNet-style skip aggregation: the list
  is pre-activated element-wise and concatenated on the channel axis before
  the conv (``utils/nn.py:234-241``);
* fused nearest-neighbor 2x **upsample** before conv (``utils/nn.py:236``),
  stride, and dilation.

Design notes (TPU-first):

* Everything is a pure function of a param pytree. "Templates"/variable
  scopes become a ``Scope`` that names parameters with the same
  ``layer_name_N`` counters the reference uses (``utils/nn.py:95-100``), so
  checkpoints are self-describing.
* There is no EMA plumbing inside layers: sampling with EMA weights is just
  ``apply(ema_params, ...)`` on the same pure function (replaces
  ``get_var_maybe_avg``, ``utils/nn.py:89-93``).
* The reference's disabled gradient-checkpointing scaffold
  (``utils/nn.py:186-309``) maps to ``jax.checkpoint``: wrap any block with
  ``jax.checkpoint`` to recompute activations in the backward pass — XLA
  handles it; no custom machinery needed. ``make_module(..., remat=True)``
  applies it to the whole module.
* NHWC layout; XLA picks TPU-optimal internal layouts for convs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

Array = jax.Array
ArrayOrList = Union[Array, List[Array]]


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------


def apply_pre_activation(
    x: ArrayOrList, pre_activation: Optional[str], axis: int = -1
) -> Array:
    """Reference ``apply_pre_activation`` (``utils/nn.py:190-206``): apply the
    nonlinearity to (a list of) inputs and concat on ``axis``. The 'c'
    variants interleave ``[xi, -xi]`` per list element."""
    if isinstance(x, tuple):
        x = list(x)
    elif not isinstance(x, list):
        x = [x]
    if pre_activation is None:
        return x[0] if len(x) == 1 else jnp.concatenate(x, axis)
    if pre_activation == "celu":
        cat = jnp.concatenate([s for xi in x for s in (xi, -xi)], axis)
        return jax.nn.elu(cat)
    if pre_activation == "crelu":
        cat = jnp.concatenate([s for xi in x for s in (xi, -xi)], axis)
        return jax.nn.relu(cat)
    if pre_activation == "elu":
        return jax.nn.elu(x[0] if len(x) == 1 else jnp.concatenate(x, axis))
    if pre_activation == "relu":
        return jax.nn.relu(x[0] if len(x) == 1 else jnp.concatenate(x, axis))
    raise ValueError(f"unsupported pre-activation: {pre_activation!r}")


def glu(x: Array, axis: int = -1) -> Array:
    """Gated linear unit ``x * sigmoid(gate)`` with x/gate = split in half
    (generator trick at ``models/dcgan.py:34-36``)."""
    h, gate = jnp.split(x, 2, axis=axis)
    return h * jax.nn.sigmoid(gate)


def l2_normalize_rows(x: Array, eps: float = 0.0) -> Array:
    """Row L2 normalization, as the critic feature head
    (``models/dcgan.py:19``: divide by sqrt(sum of squares), no epsilon)."""
    denom = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True) + eps)
    return x / denom


def nn_upsample(x: Array, factor: int = 2) -> Array:
    """Nearest-neighbor upsample (NHWC) via reshape+broadcast — fuses in XLA,
    replacing ``tf.image.resize_nearest_neighbor`` (``models/dcgan.py:38``)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :], (n, h, factor, w, factor, c)
    )
    return x.reshape(n, h * factor, w * factor, c)


# ---------------------------------------------------------------------------
# parameter scope
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Scope:
    """Names, creates (init) or fetches (apply) parameters.

    ``mode='init'``: layers draw V ~ N(0, 0.05) from ``rng`` (reference
    initializer, ``utils/nn.py:124``) and, when the layer sees data, compute
    data-dependent ``g``/``b``; params are collected into ``params``.
    ``mode='apply'``: layers read from ``params``.
    """

    mode: str  # 'init' | 'apply'
    params: Dict[str, Any]
    rng: Optional[Array] = None
    counters: Dict[str, int] = dataclasses.field(default_factory=dict)
    # data_init=True: compute g,b from batch statistics (the reference's
    # *intended* init, utils/nn.py:108-162). data_init=False: g=1, b=0,
    # V ~ N(0, 0.05) — the reference's *shipped* behavior (its init-pass
    # assign ops never execute, SURVEY.md section 3.1 step 8); without
    # weight norm V gets He/Glorot scale sqrt(2/fan_in) instead.
    data_init: bool = True
    # matmul/conv compute dtype: params and weight-norm math stay float32;
    # activations and MXU ops run in this dtype (bfloat16 = 4x f32 MXU rate
    # on TPU, f32 accumulation via preferred_element_type). The OT matching
    # core is always float32 regardless (lam=500 amplifies feature error).
    compute_dtype: Any = jnp.float32

    def next_name(self, base: str) -> str:
        # reference get_name (utils/nn.py:95-100)
        i = self.counters.get(base, 0)
        self.counters[base] = i + 1
        return f"{base}_{i}"

    def fold_rng(self) -> Array:
        assert self.rng is not None, "init mode needs an rng"
        self.rng, sub = jax.random.split(self.rng)
        return sub


def _l2norm_last(v: Array) -> Array:
    """Normalize over all axes except the last (per-output-unit direction)."""
    axes = tuple(range(v.ndim - 1))
    return v / jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))


def _wn_params(
    scope: Scope,
    name: str,
    v_shape: Sequence[int],
    num_units: int,
    f: Callable[[Array], Array],
    init_scale: float,
    weight_norm: bool,
    use_b: bool,
    use_g: bool,
):
    """Create/fetch (V, g, b) and return the layer output of ``f`` applied
    with the effective weight, reproducing ``get_params``
    (``utils/nn.py:103-183``) with the data-dependent path actually live."""
    if scope.mode == "init":
        if scope.data_init or weight_norm:
            v = 0.05 * jax.random.normal(scope.fold_rng(), tuple(v_shape))
        else:
            # plain init without weight norm: He/Glorot scale (the toy
            # notebook's xavier_init: std = sqrt(2 / fan_in))
            fan_in = int(np.prod(v_shape[:-1]))
            v = jnp.sqrt(2.0 / fan_in) * jax.random.normal(
                scope.fold_rng(), tuple(v_shape)
            )
        if not scope.data_init:
            p: Dict[str, Array] = {"V": v}
            if use_g:
                p["g"] = jnp.ones((num_units,), v.dtype)
            if use_b:
                p["b"] = jnp.zeros((num_units,), v.dtype)
            scope.params[name] = p
            w = _l2norm_last(v) if weight_norm else v
            if use_g:
                w = w * p["g"]
            out = f(w)
            if use_b:
                out = out + p["b"]
            return out
        w_dir = _l2norm_last(v) if weight_norm else v
        pre = f(w_dir)  # pre-activation output with unit-norm directions
        p: Dict[str, Array] = {"V": v}
        if use_g or (not weight_norm):
            norm_axes = tuple(range(pre.ndim - 1))
            m = jnp.mean(pre, axis=norm_axes)
            s = jnp.std(pre, axis=norm_axes)
            init_g = init_scale / (s + 1e-10)
        if use_g:
            p["g"] = init_g
            out = pre * init_g
        elif not weight_norm:
            # fold the scale straight into V (utils/nn.py:150-151)
            p["V"] = v * init_g
            out = pre * init_g
        else:
            out = pre
        if use_b:
            p["b"] = -jnp.mean(out, axis=tuple(range(out.ndim - 1)))
            out = out + p["b"]
        scope.params[name] = p
        return out
    else:
        p = scope.params[name]
        w = _l2norm_last(p["V"]) if weight_norm else p["V"]
        if use_g and "g" in p:
            w = w * p["g"]
        out = f(w)
        if use_b and "b" in p:
            out = out + p["b"]
        return out


# ---------------------------------------------------------------------------
# layers
# ---------------------------------------------------------------------------


def dense(
    scope: Scope,
    x: ArrayOrList,
    num_units: int,
    pre_activation: Optional[str] = "celu",
    init_scale: float = 1.0,
    weight_norm: bool = True,
    use_b: bool = True,
    use_g: bool = True,
) -> Array:
    """Weight-normalized dense layer (reference ``dense``,
    ``utils/nn.py:314-325``). Pre-activation is applied to the input first
    ('c' variants double the fan-in, ``utils/nn.py:120-121``)."""
    name = scope.next_name("dense")
    xin = apply_pre_activation(x, pre_activation, axis=-1)
    v_shape = (xin.shape[-1], num_units)
    cd = scope.compute_dtype
    return _wn_params(
        scope,
        name,
        v_shape,
        num_units,
        lambda w: jnp.matmul(xin.astype(cd), w.astype(cd)).astype(
            jnp.float32  # upcast after: keeps fwd/bwd conv dtypes uniform
        ),
        init_scale,
        weight_norm,
        use_b,
        use_g,
    )


def conv2d(
    scope: Scope,
    x: ArrayOrList,
    num_filters: int,
    filter_size: Sequence[int] = (3, 3),
    stride: Sequence[int] = (1, 1),
    pad: str = "SAME",
    dilate: int = 1,
    upsample: bool = False,
    pre_activation: Optional[str] = "celu",
    init_scale: float = 1.0,
    weight_norm: bool = True,
    use_b: bool = True,
    use_g: bool = True,
) -> Array:
    """Weight-normalized conv layer (reference ``conv2d``,
    ``utils/nn.py:327-338``), NHWC / HWIO.

    Accepts a list of tensors (DenseNet skip aggregation): with ``upsample``
    the list is concatenated and NN-upsampled 2x *before* the pre-activation
    (``utils/nn.py:234-241``); dilation maps to ``rhs_dilation`` (the
    reference's ``atrous_conv2d``)."""
    name = scope.next_name("conv2d")
    if upsample:
        cat = (
            jnp.concatenate(list(x), axis=-1)
            if isinstance(x, (list, tuple))
            else x
        )
        xin = apply_pre_activation(nn_upsample(cat), pre_activation, axis=-1)
    else:
        xin = apply_pre_activation(x, pre_activation, axis=-1)

    v_shape = tuple(filter_size) + (xin.shape[-1], num_filters)
    dn = jax.lax.conv_dimension_numbers(
        xin.shape, v_shape, ("NHWC", "HWIO", "NHWC")
    )

    cd = scope.compute_dtype

    def f(w):
        # uniform-dtype conv (TPU accumulates f32 internally for bf16),
        # upcast after — mixed in/out dtypes break the conv VJP rule
        out = jax.lax.conv_general_dilated(
            xin.astype(cd),
            w.astype(cd),
            window_strides=tuple(stride),
            padding=pad,
            rhs_dilation=(dilate, dilate),
            dimension_numbers=dn,
        )
        return out.astype(jnp.float32)

    return _wn_params(
        scope,
        name,
        v_shape,
        num_filters,
        f,
        init_scale,
        weight_norm,
        use_b,
        use_g,
    )


def global_avg_pool(
    x: ArrayOrList, pre_activation: Optional[str] = "celu"
) -> Array:
    """Parameterless global average pool over H,W with pre-activation
    (reference ``global_avg_pool``, ``utils/nn.py:287-309``)."""
    xin = apply_pre_activation(x, pre_activation, axis=-1)
    return jnp.mean(xin, axis=(1, 2))


# ---------------------------------------------------------------------------
# module wrapper
# ---------------------------------------------------------------------------


class Module:
    """Bundle of (init, apply) around a spec function ``spec(scope, *a, **k)``.

    ``init(rng, *args, **kwargs) -> (params, out)`` runs the spec with real
    data-dependent initialization (jit-able). ``apply(params, *args, **kwargs)
    -> out`` is the pure forward. EMA sampling == ``apply(ema_params, ...)``.
    """

    def __init__(self, spec: Callable, remat: bool = False,
                 compute_dtype: Any = jnp.float32,
                 remat_policy: str = ""):
        self._spec = spec
        self._remat = remat
        self._remat_policy = remat_policy
        self._compute_dtype = jnp.dtype(compute_dtype)

    def init(self, rng: Array, *args, data_dependent: bool = True, **kwargs):
        scope = Scope(
            mode="init", params={}, rng=rng, data_init=data_dependent,
            compute_dtype=self._compute_dtype,
        )
        out = self._spec(scope, *args, **kwargs)
        return scope.params, out

    def apply(self, params: Dict[str, Any], *args, **kwargs):
        def run(params, *a):
            scope = Scope(
                mode="apply", params=params,
                compute_dtype=self._compute_dtype,
            )
            return self._spec(scope, *a, **kwargs)

        if self._remat:
            # non-array args (e.g. the generator's static batch_size int)
            # must stay static under jax.checkpoint — tracing them breaks
            # shape construction inside the spec
            static = tuple(
                i + 1
                for i, a in enumerate(args)
                if not isinstance(a, (jax.Array, np.ndarray))
            )
            kw = {}
            names = [
                n.strip() for n in self._remat_policy.split(",") if n.strip()
            ]
            if names:
                # selective remat: intermediates tagged with save_point(x, n)
                # for n in `names` are kept in HBM and NOT recomputed in the
                # backward pass. Each saved tensor skips exactly its
                # producing op's recompute FLOPs — pick small, expensive
                # activations (docs/DESIGN.md section 7). Unknown names are
                # inert, so one policy string can cover both G and D.
                kw["policy"] = jax.checkpoint_policies.save_only_these_names(
                    *names
                )
            return jax.checkpoint(run, static_argnums=static, **kw)(
                params, *args
            )
        return run(params, *args)


def make_module(
    spec: Callable,
    remat: bool = False,
    compute_dtype: Any = jnp.float32,
    remat_policy: str = "",
) -> Module:
    return Module(
        spec, remat=remat, compute_dtype=compute_dtype,
        remat_policy=remat_policy,
    )


def save_point(x: Array, name: str) -> Array:
    """Tag ``x`` as a named rematerialization save point.

    Identity unless the enclosing :class:`Module` runs with ``remat=True``
    and a ``remat_policy`` that lists ``name`` — then ``x`` is stored during
    the forward pass and the backward pass does not recompute it. This is
    the selective counterpart of the reference's (disabled) whole-function
    recompute scaffold (``utils/nn.py:186-309``)."""
    return checkpoint_name(x, name)


def save_point_half(x: Array, name: str, axis: int = -1) -> Array:
    """Half-granularity save point: tag only the FIRST half of ``x`` along
    ``axis`` as ``name`` (backward-phase-3 experiment, docs/DESIGN.md
    section 7). Under a policy listing ``name``, the forward stores half
    the bytes of a full ``save_point`` and the backward recomputes only the
    untagged half — useful when the full activation does not fit HBM
    (e.g. disc_c2 at paper scale). Whether the recompute actually narrows
    to the missing half depends on XLA slicing the producing op; measure,
    don't assume. Identity when no policy lists ``name``."""
    n = x.shape[axis] // 2
    lo = jax.lax.slice_in_dim(x, 0, n, axis=axis)
    hi = jax.lax.slice_in_dim(x, n, x.shape[axis], axis=axis)
    return jnp.concatenate([checkpoint_name(lo, name), hi], axis=axis)
