from medseg_tpu.parallel.sharding import (  # noqa: F401
    data_parallel_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    pad_to_multiple,
    require_divisible_batch,
)
from medseg_tpu.parallel.dist import (  # noqa: F401
    global_data_parallel_mesh,
    initialize_from_env,
    shard_process_local,
)
