from .mesh import (DATA_AXIS, MODEL_AXIS, make_mesh, batch_sharding,
                   replicated, shard_batch, param_sharding_rules)
from .multihost import (host_shard_indices, initialize_distributed,
                        is_main_process)
from .seq_parallel import (sp_flash_cross_attention,
                           sp_flash_cross_attention_fwd_lse,
                           sp_flash_cross_attention_kv_fused,
                           sp_flash_cross_attention_precomputed)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "make_mesh", "batch_sharding",
           "replicated", "shard_batch", "param_sharding_rules",
           "host_shard_indices", "initialize_distributed",
           "is_main_process", "sp_flash_cross_attention",
           "sp_flash_cross_attention_fwd_lse",
           "sp_flash_cross_attention_kv_fused",
           "sp_flash_cross_attention_precomputed"]
