from masters_thesis_tpu.parallel.mesh import make_mesh
from masters_thesis_tpu.parallel.sharding import (
    batch_sharding,
    make_sharded_train_step,
    param_pspec,
    shard_params,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "make_sharded_train_step",
    "param_pspec",
    "shard_params",
]
