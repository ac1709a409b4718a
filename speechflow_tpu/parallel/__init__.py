from speechflow_tpu.parallel.mesh import make_mesh, shard_batch, replicate_state, data_sharding
from speechflow_tpu.parallel.distributed import (init_distributed, is_distributed,
    global_batch, broadcast_bytes, process_index, process_count)

__all__ = ["make_mesh", "shard_batch", "replicate_state", "data_sharding",
           "init_distributed", "is_distributed", "global_batch", "broadcast_bytes",
           "process_index", "process_count"]
