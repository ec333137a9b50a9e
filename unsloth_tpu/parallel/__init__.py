from .mesh import (MESH_AXES, ShardingRules, batch_sharding, create_mesh,
                   single_device_mesh)

__all__ = ["MESH_AXES", "ShardingRules", "batch_sharding", "create_mesh",
           "single_device_mesh"]
