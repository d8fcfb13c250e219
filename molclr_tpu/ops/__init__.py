"""TPU aggregation primitives.

Replaces the torch-scatter / torch-sparse / PyG MessagePassing native stack
(ref models/gcn_molclr.py:9-17, README.md:38) with XLA/Pallas-friendly ops:
masked segment reductions, ELL gather-aggregate neighborhood sums (no
scatter), and segment softmax for attention pooling.
"""

from molclr_tpu.ops.segment import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_softmax,
    graph_pool,
)
from molclr_tpu.ops.ell import ell_aggregate, coo_aggregate

__all__ = [
    "segment_sum", "segment_mean", "segment_max", "segment_softmax",
    "graph_pool", "ell_aggregate", "coo_aggregate",
]
