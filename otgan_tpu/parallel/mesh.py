"""Device mesh helpers: the SPMD replacement for the reference's per-GPU
tower loop (``train.py:67-85``) and hand-placed cross-device edges.

One 1-D mesh axis ``'data'``: batches are sharded across it, parameters are
replicated, gradients are psum-reduced by XLA. The reference's
``assert nr_gpu % 2 == 0`` (``train.py:34``) is NOT needed here — the
two-batch split is a global-batch halving, independent of device count.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    num_devices: int = 0, devices: Optional[Sequence] = None
) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices
    (0 = all)."""
    devs = list(devices) if devices is not None else jax.devices()
    if num_devices:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def shard_batch(mesh: Mesh, x: Any):
    """Place a host batch sharded along the data axis (leading dim)."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.device_put(x, sharding)


def replicate(mesh: Mesh, tree: Any):
    """Replicate a pytree (params / opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
