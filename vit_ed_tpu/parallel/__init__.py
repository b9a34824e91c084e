from .mesh import (
    batch_sharding,
    create_mesh,
    local_batch_size,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "create_mesh",
    "local_batch_size",
    "replicated_sharding",
    "shard_batch",
]
