from .sharding import (
    make_mesh,
    replicate,
    shard_batch,
    data_parallel,
    psum_grads,
    update_grid_distributed,
)
from .multihost import (
    init_distributed,
    make_host_mesh,
    batch_axes,
    shard_host_batch,
    psum_hierarchical,
)

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "data_parallel",
    "psum_grads",
    "update_grid_distributed",
    "init_distributed",
    "make_host_mesh",
    "batch_axes",
    "shard_host_batch",
    "psum_hierarchical",
]
