"""Multi-chip execution: mesh setup, data-parallel sharded training with
global NT-Xent negatives, cross-replica BatchNorm, and (coming) edge-
partitioned aggregation. The reference is strictly single-device
(SURVEY §2.5); everything here is net-new TPU design."""

from molclr_tpu.parallel.dp import (
    make_mesh,
    stack_batches,
    build_dp_pretrain_step,
)

__all__ = ["make_mesh", "stack_batches", "build_dp_pretrain_step"]
