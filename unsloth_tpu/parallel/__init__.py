from .mesh import (MESH_AXES, ShardingRules, batch_sharding, create_mesh,
                   single_device_mesh)
from .pipeline import (create_pp_mesh, enable_pipeline, pipeline_loss_fn,
                       place_pipeline_tree)

__all__ = ["MESH_AXES", "ShardingRules", "batch_sharding", "create_mesh",
           "single_device_mesh", "create_pp_mesh", "enable_pipeline",
           "pipeline_loss_fn", "place_pipeline_tree"]
