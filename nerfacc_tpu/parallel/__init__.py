from .sharding import (
    make_mesh,
    replicate,
    shard_batch,
    data_parallel,
    psum_grads,
    update_grid_distributed,
)

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "data_parallel",
    "psum_grads",
    "update_grid_distributed",
]
