from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    create_mesh,
    init_distributed,
    log_mesh,
    param_shardings,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "create_mesh",
    "init_distributed",
    "log_mesh",
    "param_shardings",
    "replicated",
    "shard_batch",
]
