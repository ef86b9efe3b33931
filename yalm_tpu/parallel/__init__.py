from .mesh import MeshConfig, make_mesh
from .sharding import cache_pspecs, shard_cache, shard_weights, weight_pspecs

__all__ = ["MeshConfig", "make_mesh", "weight_pspecs", "cache_pspecs",
           "shard_weights", "shard_cache"]
