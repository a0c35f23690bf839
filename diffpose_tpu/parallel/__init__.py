from diffpose_tpu.parallel.mesh import distributed_init, make_mesh
from diffpose_tpu.parallel.sharding import (
    data_sharding,
    replicated,
    shard_batch,
    make_sharded_train_step,
    make_sharded_eval_step,
)

__all__ = [
    "distributed_init",
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "make_sharded_train_step",
    "make_sharded_eval_step",
]
