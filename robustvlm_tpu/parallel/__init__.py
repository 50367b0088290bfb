from robustvlm_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_sharding_rules,
    shard_params,
)

__all__ = ["make_mesh", "batch_sharding", "param_sharding_rules", "shard_params"]
