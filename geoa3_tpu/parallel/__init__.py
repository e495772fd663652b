"""Device-mesh / sharding layer."""

from geoa3_tpu.parallel.mesh import (
    make_mesh,
    shard_attack_batch,
    shard_batch,
    replicate,
    make_sharded_attack_fn,
    make_sharded_train_step,
)

__all__ = [
    "make_mesh",
    "shard_attack_batch",
    "shard_batch",
    "replicate",
    "make_sharded_attack_fn",
    "make_sharded_train_step",
]
