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


def shard_batch(mesh: Mesh, x: Any, axis: int = 0):
    """Place a host batch sharded along the data axis (dim ``axis``).

    Single process: a plain ``device_put``. Multi-process (pod launch,
    ``jax.distributed.initialize``): ``x`` is this PROCESS'S LOCAL slice of
    the batch — the global array is assembled from every process's slice
    without any cross-host copy of the data itself
    (``jax.make_array_from_process_local_data``). Global batch =
    local batch x process_count; processes feed disjoint slices (the
    trainer slices the dataset ``process_index::process_count``)."""
    spec = [None] * np.ndim(x)
    spec[axis] = DATA_AXIS
    sharding = NamedSharding(mesh, P(*spec))
    if jax.process_count() > 1:
        x = np.asarray(x)
        global_shape = list(x.shape)
        global_shape[axis] = x.shape[axis] * jax.process_count()
        return jax.make_array_from_process_local_data(
            sharding, x, tuple(global_shape)
        )
    return jax.device_put(x, sharding)


def replicate(mesh: Mesh, tree: Any):
    """Replicate a pytree (params / opt state) across the mesh.

    Multi-process: inputs are jit-outputs or identical host values on every
    process, so a jitted identity with replicated out_shardings performs
    the (collective-free) replication; plain ``device_put`` cannot target
    non-addressable devices."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.jit(lambda t: t, out_shardings=sharding)(tree)
    return jax.device_put(tree, sharding)
