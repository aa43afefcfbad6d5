"""Device mesh + sharding for data-parallel training.

The reference's only parallelism is single-host torch DataParallel
(core.py:537-538, SURVEY.md §2.4).  The TPU-native equivalent: a
`jax.sharding.Mesh` over all local (or distributed) devices with the batch
dimension sharded on the 'data' axis; parameters are replicated and XLA
inserts psum gradient reductions over ICI automatically from the sharding
constraints in train/step.py.  Multi-host initialization goes through
`jax.distributed` over DCN.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("data",))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(array, mesh: Mesh, batch_axis: Optional[int] = None):
    """Place a host array with its batch axis sharded over 'data'.

    Default follows the repo's batch convention (train/step.py
    `_constrain_batch`): sequential batches are time-major (T, B, D) with
    batch on axis 1; frame batches (N, D) shard axis 0.  Pass batch_axis
    explicitly for other layouts."""
    if batch_axis is None:
        batch_axis = 1 if array.ndim == 3 else 0
    spec = [None] * array.ndim
    spec[batch_axis] = "data"
    return jax.device_put(array, NamedSharding(mesh, P(*spec)))


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host (DCN) initialization; no-op when single-process."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


# ---------------------------------------------------------------------------
# multi-process (multi-host) SPMD placement: after jax.distributed
# initialization each process only *addresses* its local devices, so global
# arrays are assembled from per-host shards instead of device_put
# ---------------------------------------------------------------------------


def global_batch_from_host_shards(array, mesh: Mesh,
                                  batch_axis: Optional[int] = None):
    """Each host passes ITS shard of the batch (rows it loaded); returns the
    global jax.Array sharded over the mesh 'data' axis.  Default batch
    axis follows the same repo convention as `shard_batch`: axis 1 for
    time-major (T, B, D) tensors, axis 0 otherwise."""
    from jax.experimental import multihost_utils

    if batch_axis is None:
        batch_axis = 1 if array.ndim == 3 else 0
    spec = [None] * array.ndim
    spec[batch_axis] = "data"
    return multihost_utils.host_local_array_to_global_array(
        np.asarray(array), mesh, P(*spec)
    )


def replicate_global(tree, mesh: Mesh):
    """Replicate a pytree over a (possibly multi-process) mesh.  Every host
    must pass the same values — guaranteed by seeded init (the framework's
    determinism contract, SURVEY.md §5.2)."""
    from jax.experimental import multihost_utils

    return jax.tree_util.tree_map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            np.asarray(x), mesh, P()
        ),
        tree,
    )


def scalar_from_global(x) -> float:
    """Read a replicated global scalar on this host."""
    return float(jax.device_get(x.addressable_data(0)))
