"""Multi-chip execution: mesh setup, data-parallel sharded training with
global NT-Xent negatives, cross-replica BatchNorm, device-resident sharded
batch caches, and edge-partitioned aggregation. The reference is strictly
single-device (SURVEY §2.5); everything here is net-new TPU design."""

from molclr_tpu.parallel.dp import (
    build_dp_multi_step_resident,
    build_dp_pretrain_step,
    make_mesh,
    shard_batch_cache,
    stack_batches,
)
from molclr_tpu.parallel.partition import (
    build_partitioned_pretrain_step,
    localize_shard,
    shard_graph_batch,
)

__all__ = [
    "build_dp_multi_step_resident",
    "build_dp_pretrain_step",
    "build_partitioned_pretrain_step",
    "localize_shard",
    "make_mesh",
    "shard_batch_cache",
    "shard_graph_batch",
    "stack_batches",
]
