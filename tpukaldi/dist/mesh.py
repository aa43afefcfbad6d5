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


def shard_batch(array, mesh: Mesh, batch_axis: int = 0):
    """Place a host array with its batch axis sharded over 'data'."""
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
