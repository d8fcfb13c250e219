"""Masked segment reductions and graph pooling.

TPU-native replacement for torch_scatter.scatter_add (ref
models/gcn_molclr.py:33) and PyG global_{add,mean,max}_pool (ref
models/ginet_molclr.py:7,113). All functions take explicit masks so padded
nodes/edges contribute nothing — the padding contract of data/graphs.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e30


def segment_sum(data, segment_ids, num_segments, mask=None,
                indices_are_sorted=False):
    if mask is not None:
        data = jnp.where(_expand(mask, data), data, 0)
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_mean(data, segment_ids, num_segments, mask=None, counts=None,
                 indices_are_sorted=False):
    """Mean over segment members. `counts` overrides the denominator (e.g.
    graph_n_nodes); otherwise counts are derived from the mask/ids."""
    s = segment_sum(data, segment_ids, num_segments, mask,
                    indices_are_sorted)
    if counts is None:
        ones = jnp.ones(data.shape[0], dtype=data.dtype)
        counts = segment_sum(ones, segment_ids, num_segments, mask,
                             indices_are_sorted)
    counts = jnp.maximum(counts, 1).astype(s.dtype)
    return s / _expand_to(counts, s)


def segment_max(data, segment_ids, num_segments, mask=None,
                indices_are_sorted=False):
    if mask is not None:
        data = jnp.where(_expand(mask, data), data, _NEG)
    out = jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    # Empty segments come back as -inf/-NEG; zero them like PyG does for
    # graphs with no nodes.
    return jnp.where(out <= _NEG / 2, 0.0, out)


def segment_softmax(logits, segment_ids, num_segments, mask=None,
                    indices_are_sorted=False):
    """Numerically-stable softmax within segments — the core of the
    GlobalAttention motif pool (ref models/ginet_finetune_mp.py:107)."""
    if mask is not None:
        logits = jnp.where(_expand(mask, logits), logits, _NEG)
    seg_max = jax.ops.segment_max(
        logits, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    seg_max = jnp.where(seg_max <= _NEG / 2, 0.0, seg_max)
    shifted = logits - seg_max[segment_ids]
    ex = jnp.exp(shifted)
    if mask is not None:
        ex = jnp.where(_expand(mask, ex), ex, 0.0)
    denom = jax.ops.segment_sum(
        ex, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    return ex / jnp.maximum(denom, 1e-16)[segment_ids]


def graph_pool(h, node_graph, node_mask, num_graphs, graph_n_nodes=None,
               method: str = "mean"):
    """Node->graph readout.

    sum/mean are computed as a masked one-hot matmul A.T @ h ([G,N] x [N,D])
    rather than a segment scatter: on TPU the matmul rides the MXU and its
    adjoint is another matmul (the scatter lowering and its transposed
    gather are both slower). mean matches PyG global_mean_pool: denominator
    = number of real atoms per graph (ref models/ginet_molclr.py:113)."""
    if method in ("add", "mean"):
        a = jax.nn.one_hot(node_graph, num_graphs, dtype=h.dtype)
        a = a * node_mask.astype(h.dtype)[:, None]        # [N, G]
        out = jax.lax.dot_general(
            a, h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if method == "mean":
            if graph_n_nodes is None:
                counts = a.sum(axis=0).astype(jnp.float32)
            else:
                counts = graph_n_nodes.astype(jnp.float32)
            out = out / jnp.maximum(counts, 1.0)[:, None]
        return out.astype(h.dtype)
    if method == "max":
        return segment_max(h, node_graph, num_graphs, node_mask,
                           indices_are_sorted=True)
    raise ValueError(f"unknown pool method {method!r}")


def _expand(mask, data):
    return mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))


def _expand_to(v, s):
    return v.reshape(v.shape + (1,) * (s.ndim - v.ndim))
