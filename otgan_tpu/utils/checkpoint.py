"""Full-train-state checkpointing.

The reference saves only trainable variables every 200 epochs
(``tf.train.Saver(all_params)``, ``train.py:59-60,275-276``) and silently
loses EMA shadows and Adam slots on resume (SURVEY.md section 5.4). Here the
checkpoint is the ENTIRE train-state pytree — params, EMA params, optimizer
state, step counter, RNG key — so resume is bit-exact.

Format: one ``.npz`` of flattened leaves (template-based restore, the
flax/orbax "restore into target" idiom) — no pickled code, portable,
append-only per step like ``med_gan_params-<epoch>``.

Size/latency options (round-1 backlog item 5):
* ``slot_dtype="bfloat16"`` stores the EMA shadow and both optimizer-slot
  subtrees in bfloat16 (as uint16 views — numpy serializes those natively),
  roughly halving the ~1 GB DCGAN full-state file. bf16 keeps float32's
  exponent range, so tiny Adam second moments (~1e-8) survive where float16
  would flush them; params themselves stay float32 (default OFF: the exact
  reference-resume path).
* ``async_write=True`` moves compression + disk I/O to a background thread.
  The device->host transfer stays on the caller thread (the engine's jitted
  steps DONATE the state buffers, so they must be copied out before the
  next step runs); only the file write is deferred. ``wait_for_pending_saves``
  joins the writer (called automatically before prune/next save/train exit).
"""

from __future__ import annotations

import glob
import os
import re
import threading
from typing import Any, Optional

import jax
import ml_dtypes
import numpy as np

Pytree = Any
_PREFIX = "otgan_state"
_BF16_SUFFIX = "__bf16"
# TrainState fields stored in reduced precision under slot_dtype="bfloat16"
_SLOT_FIELDS = ("gen_ema", "gen_opt", "disc_opt")

_pending_save: Optional[threading.Thread] = None
_pending_error: Optional[BaseException] = None


def wait_for_pending_saves() -> None:
    """Join any in-flight background checkpoint write — BOTH backends: the
    npz writer thread and (when the module is loaded) orbax's async
    commits. Callers get one process-wide "all checkpoint writes durable"
    barrier regardless of backend. A failure inside the writer thread
    (disk full, unwritable dir) is re-raised HERE, so "the barrier
    returned" really means "the checkpoint is on disk"."""
    global _pending_save, _pending_error
    if _pending_save is not None:
        _pending_save.join()
        _pending_save = None
    if _pending_error is not None:
        err, _pending_error = _pending_error, None
        raise RuntimeError("background checkpoint write failed") from err
    import sys

    orbax_mod = sys.modules.get("otgan_tpu.utils.checkpoint_orbax")
    if orbax_mod is not None:
        orbax_mod.wait_for_pending_saves()


def _slot_mask(state: Pytree) -> list:
    """Per-flat-leaf booleans: True where the leaf belongs to an EMA /
    optimizer-slot field (compressible)."""
    fields = getattr(state, "_fields", None)
    if fields is None:
        return [False] * len(jax.tree.leaves(state))
    mask = []
    for name in fields:
        n = len(jax.tree.leaves(getattr(state, name)))
        mask.extend([name in _SLOT_FIELDS] * n)
    return mask


def save_checkpoint(
    save_dir: str,
    state: Pytree,
    step: int,
    slot_dtype: str = "float32",
    async_write: bool = False,
    max_to_keep: int = 0,
    keep_every_hours: float = 5.0,
) -> str:
    """Write ``otgan_state-<step>.npz``; returns the (final) path.

    ``max_to_keep > 0`` applies the Saver-style retention policy after the
    write — inside the writer thread when ``async_write`` is on, so pruning
    never stalls the training loop (a caller-side ``prune_checkpoints``
    right after an async save would join the writer and serialize the
    whole write back onto the caller)."""
    os.makedirs(save_dir, exist_ok=True)
    wait_for_pending_saves()
    # device->host copy happens HERE, synchronously: the train steps donate
    # the state buffers, so deferring the copy would read freed memory
    host = [np.asarray(leaf) for leaf in jax.tree.leaves(state)]
    mask = _slot_mask(state)
    arrays = {}
    for i, (arr, is_slot) in enumerate(zip(host, mask)):
        if (
            slot_dtype == "bfloat16"
            and is_slot
            and arr.dtype == np.float32
        ):
            arrays[f"leaf_{i}{_BF16_SUFFIX}"] = arr.astype(
                ml_dtypes.bfloat16
            ).view(np.uint16)
        else:
            arrays[f"leaf_{i}"] = arr
    path = os.path.join(save_dir, f"{_PREFIX}-{step}.npz")
    tmp = path + ".tmp.npz"

    def write():
        np.savez(tmp, **arrays)
        os.replace(tmp, path)
        if max_to_keep:
            _prune_committed(save_dir, max_to_keep, keep_every_hours)

    if async_write:
        global _pending_save

        def guarded_write():
            global _pending_error
            try:
                write()
            except BaseException as e:  # surfaced at the next barrier
                _pending_error = e

        _pending_save = threading.Thread(target=guarded_write, daemon=False)
        _pending_save.start()
    else:
        write()
    return path


def restore_checkpoint(path: str, template: Pytree) -> Pytree:
    """Restore into a pytree shaped like ``template`` (dtypes/shapes checked);
    transparently decodes bfloat16-compressed slot leaves. A directory path
    is dispatched to the orbax backend (``<save_dir>/orbax/<step>/``), so
    every consumer (trainer resume, sampling/eval CLIs) accepts checkpoints
    from either backend."""
    wait_for_pending_saves()  # never read around an in-flight async write
    if os.path.isdir(path):
        step_dir = os.path.normpath(path)
        parent = os.path.dirname(step_dir)
        if not (
            os.path.basename(step_dir).isdigit()
            and os.path.basename(parent) == "orbax"
        ):
            raise ValueError(
                f"not a checkpoint path: {path} (directories must be orbax "
                "step dirs of the form <save_dir>/orbax/<step>)"
            )
        from otgan_tpu.utils import checkpoint_orbax

        return checkpoint_orbax.restore_checkpoint(
            os.path.dirname(parent),
            template,
            step=int(os.path.basename(step_dir)),
        )
    with np.load(path) as data:
        leaves = []
        for i in range(len(data.files)):
            if f"leaf_{i}" in data:
                leaves.append(data[f"leaf_{i}"])
            elif f"leaf_{i}{_BF16_SUFFIX}" in data:
                leaves.append(
                    data[f"leaf_{i}{_BF16_SUFFIX}"].view(ml_dtypes.bfloat16)
                )
            else:
                break
    t_leaves, treedef = jax.tree.flatten(template)
    if len(leaves) != len(t_leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template has {len(t_leaves)}"
        )
    out = []
    for got, want in zip(leaves, t_leaves):
        want = np.asarray(want)
        if got.shape != want.shape:
            raise ValueError(
                f"leaf shape mismatch: checkpoint {got.shape} vs template {want.shape}"
            )
        out.append(got.astype(want.dtype))
    return jax.tree.unflatten(treedef, out)


def latest_checkpoint(save_dir: str) -> Optional[str]:
    """Highest-step checkpoint path, or None (replaces the reference's
    filename-suffix parsing at ``train.py:190-193``). Considers both
    backends: ``otgan_state-<step>.npz`` files and committed orbax step
    directories under ``<save_dir>/orbax/``; the highest step wins."""
    # an async commit from THIS process may still be renaming its step
    # directory/file — wait so the newest step is visible
    wait_for_pending_saves()
    best, best_step = None, -1
    for p in glob.glob(os.path.join(save_dir, f"{_PREFIX}-*.npz")):
        m = re.search(rf"{_PREFIX}-(\d+)\.npz$", p)
        if m and int(m.group(1)) > best_step:
            best, best_step = p, int(m.group(1))
    for p in glob.glob(os.path.join(save_dir, "orbax", "*")):
        base = os.path.basename(p)
        # in-progress orbax saves live in tmp-suffixed dirs; committed
        # steps are bare integers
        if os.path.isdir(p) and base.isdigit() and int(base) > best_step:
            best, best_step = p, int(base)
    return best


def checkpoint_step(path: str) -> int:
    base = os.path.basename(os.path.normpath(path))
    if os.path.isdir(path) and base.isdigit():
        # a digit-named directory is only a checkpoint when it is an orbax
        # step dir (<save_dir>/orbax/<step>) — the same structure check
        # restore_checkpoint enforces; a stray digit-named directory passed
        # as --model_name must error, not parse to a bogus resume step
        parent = os.path.basename(os.path.dirname(os.path.normpath(path)))
        if parent != "orbax":
            raise ValueError(
                f"not a checkpoint path: {path} (digit-named directories "
                "are checkpoints only under <save_dir>/orbax/)"
            )
        return int(base)
    m = re.search(rf"{_PREFIX}-(\d+)\.npz$", path)
    if not m:
        raise ValueError(f"not a checkpoint path: {path}")
    return int(m.group(1))


def prune_checkpoints(
    save_dir: str,
    max_to_keep: int = 5,
    keep_every_hours: float = 5.0,
) -> list:
    """Retention policy matching ``tf.train.Saver(max_to_keep=5,
    keep_checkpoint_every_n_hours=...)`` used by the reference's saving
    variant (``train_with_model_saving.py:59``): keep the newest
    ``max_to_keep`` checkpoints, plus one long-term checkpoint per
    ``keep_every_hours`` window (by file mtime). Returns deleted paths."""
    wait_for_pending_saves()  # never prune around an in-flight write
    return _prune_committed(save_dir, max_to_keep, keep_every_hours)


def _prune_committed(
    save_dir: str, max_to_keep: int, keep_every_hours: float
) -> list:
    """Retention body without the pending-save barrier (the async writer
    thread calls this after its own write — joining itself would deadlock)."""
    deleted = []
    # drop stale atomic-write temp files (a crash mid-save leaves
    # otgan_state-<N>.npz.tmp.npz, which the bare glob would match)
    for p in glob.glob(os.path.join(save_dir, f"{_PREFIX}-*.tmp.npz")):
        os.remove(p)
        deleted.append(p)
    paths = [
        p
        for p in glob.glob(os.path.join(save_dir, f"{_PREFIX}-*.npz"))
        if re.search(rf"{_PREFIX}-(\d+)\.npz$", p)
    ]
    if len(paths) <= max_to_keep:
        return deleted
    # "newest" means highest STEP (matching latest_checkpoint/resume
    # order); mtimes rank only the long-term hour anchors, since copies/
    # restores can flatten them
    by_step = sorted(paths, key=checkpoint_step)
    keep = set(by_step[-max_to_keep:])
    window = keep_every_hours * 3600.0
    last_kept = None
    for mtime, p in sorted((os.path.getmtime(p), p) for p in by_step):
        if last_kept is None or mtime - last_kept >= window:
            keep.add(p)
            last_kept = mtime
    for p in by_step:
        if p not in keep:
            os.remove(p)
            deleted.append(p)
    return deleted
