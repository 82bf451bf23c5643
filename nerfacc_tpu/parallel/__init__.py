from .sharding import (
    make_mesh,
    replicate,
    shard_batch,
    data_parallel,
    psum_grads,
)

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "data_parallel",
    "psum_grads",
]
