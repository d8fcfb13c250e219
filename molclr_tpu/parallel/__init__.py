"""Multi-chip execution: mesh setup, data-parallel sharded training with
global NT-Xent negatives, cross-replica BatchNorm, device-resident sharded
batch caches, and edge-partitioned aggregation. The reference is strictly
single-device (SURVEY §2.5); everything here is net-new TPU design."""

from molclr_tpu.parallel.dp import (
    build_dp_multi_step_resident,
    build_dp_multi_step_units,
    build_dp_pretrain_step,
    make_mesh,
    shard_batch_cache,
    shard_unit_stack,
    stack_batches,
)
from molclr_tpu.parallel.multihost import (
    assemble_rows,
    corpus_shard_range,
    global_mesh,
    init_distributed,
    replicate_to_mesh,
    shard_batch_cache_global,
)
from molclr_tpu.parallel.partition import (
    build_partitioned_pretrain_step,
    localize_shard,
    shard_graph_batch,
)

__all__ = [
    "build_dp_multi_step_resident",
    "build_dp_multi_step_units",
    "shard_unit_stack",
    "build_dp_pretrain_step",
    "assemble_rows",
    "build_partitioned_pretrain_step",
    "corpus_shard_range",
    "global_mesh",
    "init_distributed",
    "localize_shard",
    "make_mesh",
    "replicate_to_mesh",
    "shard_batch_cache",
    "shard_batch_cache_global",
    "shard_graph_batch",
    "stack_batches",
]
