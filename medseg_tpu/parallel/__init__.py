from medseg_tpu.parallel.sharding import (  # noqa: F401
    data_parallel_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    pad_to_multiple,
    require_divisible_batch,
)
