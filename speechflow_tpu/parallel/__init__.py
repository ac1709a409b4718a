from speechflow_tpu.parallel.mesh import make_mesh, shard_batch, replicate_state, data_sharding

__all__ = ["make_mesh", "shard_batch", "replicate_state", "data_sharding"]
