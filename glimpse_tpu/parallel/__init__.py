"""Device-mesh parallelism: sharding the points/tracks axis over TPU chips."""
from .mesh import get_mesh, points_sharding, replicated_sharding, shard_batch

__all__ = ["get_mesh", "points_sharding", "replicated_sharding", "shard_batch"]
