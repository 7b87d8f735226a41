from . import multihost
from .mesh import (
    batch_sharding,
    make_mesh,
    point_sharding,
    shard_pointclouds,
)
from .ring import ring_chamfer_distance, ring_knn_gather, ring_knn_points

__all__ = [
    "make_mesh",
    "batch_sharding",
    "point_sharding",
    "shard_pointclouds",
    "ring_knn_points",
    "ring_knn_gather",
    "ring_chamfer_distance",
    "multihost",
]
