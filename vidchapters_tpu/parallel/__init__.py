from vidchapters_tpu.parallel.sharding import (
    batch_sharding,
    infer_param_specs,
    shard_params,
)

__all__ = ["batch_sharding", "infer_param_specs", "shard_params"]
