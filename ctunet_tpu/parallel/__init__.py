from .mesh import (
    DATA_AXIS,
    SPATIAL_AXIS,
    batch_sharding,
    make_mesh,
    replicate_tree,
    replicated,
    volume_sharding,
)

__all__ = [
    "DATA_AXIS",
    "SPATIAL_AXIS",
    "batch_sharding",
    "make_mesh",
    "replicate_tree",
    "replicated",
    "volume_sharding",
]
