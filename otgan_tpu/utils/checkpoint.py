"""Full-train-state checkpointing.

The reference saves only trainable variables every 200 epochs
(``tf.train.Saver(all_params)``, ``train.py:59-60,275-276``) and silently
loses EMA shadows and Adam slots on resume (SURVEY.md section 5.4). Here the
checkpoint is the ENTIRE train-state pytree — params, EMA params, optimizer
state, step counter, RNG key — so resume is bit-exact.

Format: one ``.npz`` of flattened leaves (template-based restore, the
flax/orbax "restore into target" idiom) — no pickled code, portable,
append-only per step like ``med_gan_params-<epoch>``.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Optional

import jax
import numpy as np

Pytree = Any
_PREFIX = "otgan_state"


def save_checkpoint(save_dir: str, state: Pytree, step: int) -> str:
    """Write ``otgan_state-<step>.npz``; returns the path."""
    os.makedirs(save_dir, exist_ok=True)
    leaves = jax.tree.leaves(state)
    path = os.path.join(save_dir, f"{_PREFIX}-{step}.npz")
    tmp = path + ".tmp.npz"
    np.savez(
        tmp, **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    )
    os.replace(tmp, path)
    return path


def restore_checkpoint(path: str, template: Pytree) -> Pytree:
    """Restore into a pytree shaped like ``template`` (dtypes/shapes checked)."""
    with np.load(path) as data:
        leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
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
    filename-suffix parsing at ``train.py:190-193``)."""
    paths = glob.glob(os.path.join(save_dir, f"{_PREFIX}-*.npz"))
    best, best_step = None, -1
    for p in paths:
        m = re.search(rf"{_PREFIX}-(\d+)\.npz$", p)
        if m and int(m.group(1)) > best_step:
            best, best_step = p, int(m.group(1))
    return best


def checkpoint_step(path: str) -> int:
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
