from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    build_mesh,
    mesh_from_cfg,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "build_mesh",
    "mesh_from_cfg",
    "replicated",
    "shard_batch",
]
