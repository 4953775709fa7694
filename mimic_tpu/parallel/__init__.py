from .mesh import (
    batch_shardings,
    make_mesh,
    param_shardings,
    replicate,
    replicated,
    shard_batch,
    shard_params,
)

__all__ = [
    "batch_shardings",
    "make_mesh",
    "param_shardings",
    "replicate",
    "replicated",
    "shard_batch",
    "shard_params",
]
