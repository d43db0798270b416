from .mesh import make_mesh, MeshAxes
from .sharding import (batch_sharding, param_sharding_rules, replicate_tree,
                       shard_params, shard_batch, shard_pipeline)

__all__ = ['make_mesh', 'MeshAxes', 'batch_sharding',
           'param_sharding_rules', 'replicate_tree', 'shard_params',
           'shard_batch', 'shard_pipeline']
