"""Neighborhood aggregation: ELL gather-aggregate (TPU-native) and a COO
segment-sum reference path.

This pair replaces PyG's MessagePassing.propagate / torch-scatter scatter-add
(ref models/ginet_molclr.py:41-47). The ELL path is the hot path: K static
row-gathers + masked sum, no scatter, so XLA emits vectorized dynamic-gathers
and fuses the elementwise message math; the COO path exists for parity tests
and as the fallback for degree-overflow graphs.

Message semantics (both paths) follow GINEConv/GCNConv exactly:
    message(e) = x[src(e)] + edge_emb(e)        (ref ginet_molclr.py:43-44,
                                                 gcn_molclr.py:86-88)
    aggregate  = sum over in-edges + self-loop  (ref ginet_molclr.py:31-37)
"""

from __future__ import annotations

import jax.numpy as jnp

from molclr_tpu.ops.segment import segment_sum


def ell_aggregate(h, nbr, nbr_mask, edge_emb=None):
    """sum_k mask[n,k] * (h[nbr[n,k]] + edge_emb[n,k]).

    h         [N, D]
    nbr       [N, K] int32 (slot 0 = self-loop by the packing contract)
    nbr_mask  [N, K] bool
    edge_emb  [N, K, D] or None
    returns   [N, D]
    """
    msg = jnp.take(h, nbr, axis=0)          # [N, K, D]
    if edge_emb is not None:
        msg = msg + edge_emb
    msg = jnp.where(nbr_mask[..., None], msg, 0)
    return msg.sum(axis=1)


def coo_aggregate(h, src, dst, edge_mask, num_nodes, edge_emb=None,
                  self_loop_emb=None, node_mask=None):
    """Reference path over COO edges (+ explicit self-loop term).

    edge_emb       [E, D] per-directed-edge embedding or None
    self_loop_emb  [D] or [N, D]: the type-4 self-loop edge embedding that the
                   reference appends per layer (ginet_molclr.py:34-37);
                   added for every real node.
    """
    msg = jnp.take(h, src, axis=0)
    if edge_emb is not None:
        msg = msg + edge_emb
    out = segment_sum(msg, dst, num_nodes, edge_mask)
    self_term = h
    if self_loop_emb is not None:
        self_term = self_term + self_loop_emb
    if node_mask is not None:
        self_term = jnp.where(node_mask[:, None], self_term, 0)
    return out + self_term
