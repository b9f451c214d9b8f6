from .mesh import (DATA_AXIS, MODEL_AXIS, make_mesh, batch_sharding,
                   replicated, shard_batch, param_sharding_rules)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "make_mesh", "batch_sharding",
           "replicated", "shard_batch", "param_sharding_rules"]
