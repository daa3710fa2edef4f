"""Orbax checkpoint backend — the distributed/multi-host path.

The default ``utils/checkpoint.py`` backend writes a single host-side
``.npz``: exact, dependency-free, and right for one host. On a pod slice it
has two costs: every chip's shards funnel through one host process, and the
write blocks that host. Orbax's ``CheckpointManager`` removes both — each
process writes its own shards (sharded ``jax.Array`` leaves are saved
without ever being gathered) and commits are async with a barrier on the
next save.

Retention maps 1:1 onto the reference's ``tf.train.Saver`` semantics
(``train_with_model_saving.py:59``): ``max_to_keep`` and
``keep_checkpoint_every_n_hours`` -> ``CheckpointManagerOptions.max_to_keep``
/ ``keep_time_interval``.

Surface: ``save_checkpoint`` / ``restore_checkpoint`` /
``wait_for_pending_saves``, dispatched by ``cfg.checkpoint_backend`` in the
trainer; latest-step discovery goes through the unified
``utils.checkpoint.latest_checkpoint`` (which scans both backends). Layout:
``<save_dir>/orbax/<step>/`` (one directory per step, orbax-managed).

NOTE: the state's sharding is restored from the live ``template`` pytree
(``ocp.args.StandardRestore``), so a checkpoint written on one mesh restores
onto another mesh/topology transparently — orbax reshards on read.
"""

from __future__ import annotations

import atexit
import datetime
import os
from typing import Any, Optional

import jax

Pytree = Any
_SUBDIR = "orbax"

# Writer managers are CACHED per (run dir, options): CheckpointManager.close()
# blocks on the in-flight async commit, so a fresh manager per save would
# serialize the writes it is supposed to overlap with training. Orbax's
# async save copies device->host synchronously before returning (donation-
# safe for the engine's donated train steps) and persists in background.
_writers: dict = {}


def wait_for_pending_saves() -> None:
    """Block until every cached writer's async commit has finished."""
    for mgr in _writers.values():
        mgr.wait_until_finished()


@atexit.register
def _close_writers() -> None:
    for mgr in _writers.values():
        mgr.close()
    _writers.clear()


def _manager(
    save_dir: str,
    max_to_keep: Optional[int] = None,
    keep_every_hours: Optional[float] = None,
    async_write: bool = True,
):
    import orbax.checkpoint as ocp

    options = ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep if max_to_keep else None,
        keep_time_interval=(
            datetime.timedelta(hours=keep_every_hours)
            if keep_every_hours
            else None
        ),
        enable_async_checkpointing=async_write,
    )
    return ocp.CheckpointManager(
        os.path.abspath(os.path.join(save_dir, _SUBDIR)), options=options
    )


def save_checkpoint(
    save_dir: str,
    state: Pytree,
    step: int,
    max_to_keep: int = 0,
    keep_every_hours: float = 0.0,
    async_write: bool = True,
    slot_dtype: str = "float32",
) -> str:
    """Save ``state`` at ``step``; retention is applied by orbax itself
    (unlike the npz backend there is no separate prune call). Returns the
    step directory path.

    ``slot_dtype="bfloat16"`` stores EMA/optimizer-slot leaves in bf16
    (same field set as the npz backend); restore upcasts into the f32
    template transparently (orbax casts saved leaves to the template
    dtype)."""
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from otgan_tpu.utils.checkpoint import _slot_mask

    key = (
        os.path.abspath(save_dir),
        max_to_keep,
        keep_every_hours,
        async_write,
    )
    mgr = _writers.get(key)
    if mgr is None:
        mgr = _writers[key] = _manager(
            save_dir, max_to_keep, keep_every_hours, async_write
        )
    # NamedTuple/custom pytrees -> plain containers for the handler;
    # restore rebuilds the original structure from the template
    flat = jax.tree.leaves(state)
    if slot_dtype == "bfloat16":
        flat = [
            leaf.astype(jnp.bfloat16)
            if is_slot and getattr(leaf, "dtype", None) == jnp.float32
            else leaf
            for leaf, is_slot in zip(flat, _slot_mask(state))
        ]
    mgr.save(step, args=ocp.args.StandardSave({"leaves": flat}))
    if not async_write:
        mgr.wait_until_finished()
    return os.path.join(save_dir, _SUBDIR, str(step))


def restore_checkpoint(
    save_dir: str, template: Pytree, step: Optional[int] = None
) -> Pytree:
    """Restore into ``template``'s structure/shardings; ``step=None`` means
    the latest committed step."""
    import orbax.checkpoint as ocp

    wait_for_pending_saves()  # never read around this process's own write
    # read-only manager: no async-commit machinery to spin up/tear down
    mgr = _manager(save_dir, async_write=False)
    try:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no orbax checkpoint under {save_dir}/{_SUBDIR}"
            )
        t_leaves, treedef = jax.tree.flatten(template)
        out = mgr.restore(
            step, args=ocp.args.StandardRestore({"leaves": t_leaves})
        )
    finally:
        mgr.close()
    return jax.tree.unflatten(treedef, out["leaves"])
