from .mesh import (
    data_parallel_mesh,
    local_batch_size,
    replicate,
    shard_batch,
    with_data_sharding,
)

__all__ = [
    "data_parallel_mesh",
    "local_batch_size",
    "replicate",
    "shard_batch",
    "with_data_sharding",
]
