from .mesh import (  # noqa: F401
    data_parallel_mesh,
    init_distributed,
    replicate,
    shard_batch,
)
