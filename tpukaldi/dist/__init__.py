from .mesh import (  # noqa: F401
    data_parallel_mesh,
    global_batch_from_host_shards,
    init_distributed,
    replicate,
    replicate_global,
    scalar_from_global,
    shard_batch,
)
