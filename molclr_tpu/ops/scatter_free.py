"""Scatter-free, relayout-free custom VJPs for the GNN hot path.

Two TPU pathologies are designed around here:

1. XLA's transpose of a gather is a scatter-add, and TPU scatter lowering is
   slow — catastrophically so for tiny embedding tables where 10^5 updates
   collide on 5 rows. Measured on v5e: default autodiff backward of the
   5-layer GIN step ~45 ms vs ~4 ms forward.
2. Materializing the [N, K, D] neighbor tensor forces physical relayouts
   (profiled at ~350 us each on v5e). Aggregation is therefore computed as
   K accumulated [N, D] row-gathers plus one-hot-count matmuls for the edge
   embeddings — no 3-D intermediate exists at any point.

Backward passes exploit that molecular graph batches are UNDIRECTED: the
masked ELL adjacency (incl. the slot-0 self-loop) is symmetric — j appears
in nbr[n] iff n appears in nbr[j] with the same mask (and the same
dis[n]*dis[j] normalization). The adjoint of "gather neighbors and sum" is
therefore the SAME gather applied to the cotangent; embedding-table
gradients reduce to count-matrix matmuls on the MXU. No scatter appears in
either direction.

The symmetry precondition is guaranteed by data/graphs.py packing (every
bond emits both directed slots; bond deletion kills both via the shared
undirected bond id; self-loops are trivially symmetric).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------- embedding lookup ----------

@jax.custom_vjp
def embed_lookup(table, idx):
    """table[idx] with a scatter-free backward. idx may be any shape."""
    return jnp.take(table, idx, axis=0)


def _embed_fwd(table, idx):
    wit = jnp.zeros((0,) + table.shape[1:], table.dtype)
    return jnp.take(table, idx, axis=0), (idx, table.shape[0], wit)


def _embed_bwd(res, g):
    idx, num, wit = res
    flat_idx = idx.reshape(-1)
    flat_g = g.reshape(-1, g.shape[-1])
    onehot = jax.nn.one_hot(flat_idx, num, dtype=flat_g.dtype)  # [M, num]
    dtable = jax.lax.dot_general(
        onehot, flat_g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return dtable.astype(wit.dtype), None


embed_lookup.defvjp(_embed_fwd, _embed_bwd)


# ---------- shared helpers ----------

def _weighted_gather_sum(h, nbr, w):
    """sum_k w[:, k] * h[nbr[:, k]] as K accumulated [N, D] row-gathers.

    No [N, K, D] intermediate is ever formed (it forces relayouts on TPU).
    Benchmarked alternatives on v5e: a single flat [K*N] gather with
    column-major slicing is ~1.5x SLOWER than K accumulated gathers."""
    k_slots = nbr.shape[1]
    acc = None
    for k in range(k_slots):
        term = jnp.take(h, nbr[:, k], axis=0) \
            * w[:, k : k + 1].astype(h.dtype)
        acc = term if acc is None else acc + term
    return acc


def _counts(idx, w, num):
    """cnt[n, t] = sum_k onehot(idx[n,k], t) * w[n,k] -> [N, num],
    accumulated per slot to avoid the [N, K, num] intermediate."""
    k_slots = idx.shape[1]
    acc = None
    for k in range(k_slots):
        term = jax.nn.one_hot(idx[:, k], num, dtype=w.dtype) \
            * w[:, k : k + 1]
        acc = term if acc is None else acc + term
    return acc


def _matmul(a, b, out_dtype):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_dtype)


# ---------- GINE aggregation ----------

def _gine_fwd_impl(h, t_type, t_dir, nbr, bt, bd, mask):
    w = mask.astype(h.dtype)
    out = _weighted_gather_sum(h, nbr, w)
    cnt_t = _counts(bt, w, t_type.shape[0])               # [N, T]
    cnt_d = _counts(bd, w, t_dir.shape[0])                # [N, R]
    out = out + _matmul(cnt_t, t_type.astype(h.dtype), h.dtype)
    out = out + _matmul(cnt_d, t_dir.astype(h.dtype), h.dtype)
    return out


@jax.custom_vjp
def gine_aggregate(h, t_type, t_dir, nbr, bt, bd, mask):
    """sum_k mask[n,k] * (h[nbr[n,k]] + t_type[bt[n,k]] + t_dir[bd[n,k]]).

    h [N,D]; t_type [T,D]; t_dir [R,D]; nbr/bt/bd/mask [N,K].
    Requires the symmetric-adjacency packing contract (see module doc)."""
    return _gine_fwd_impl(h, t_type, t_dir, nbr, bt, bd, mask)


def _gine_fwd(h, t_type, t_dir, nbr, bt, bd, mask):
    out = _gine_fwd_impl(h, t_type, t_dir, nbr, bt, bd, mask)
    wits = (jnp.zeros((), h.dtype), jnp.zeros((), t_type.dtype),
            jnp.zeros((), t_dir.dtype))
    return out, (nbr, bt, bd, mask, t_type.shape[0], t_dir.shape[0], wits)


def _gine_bwd(res, g):
    nbr, bt, bd, mask, n_type, n_dir, wits = res
    h_dtype, tt_dtype, td_dtype = (w.dtype for w in wits)
    w = mask.astype(g.dtype)
    # dh: symmetric-adjacency gather of the cotangent
    dh = _weighted_gather_sum(g, nbr, w).astype(h_dtype)
    # d tables: cnt.T @ g on the MXU
    gf = g.astype(jnp.float32)
    wf = mask.astype(jnp.float32)
    cnt_t = _counts(bt, wf, n_type)
    cnt_d = _counts(bd, wf, n_dir)
    dt = jax.lax.dot_general(cnt_t, gf, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dd = jax.lax.dot_general(cnt_d, gf, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return (dh, dt.astype(tt_dtype), dd.astype(td_dtype),
            None, None, None, None)


gine_aggregate.defvjp(_gine_fwd, _gine_bwd)


# ---------- GCN aggregation (scalar edge embeddings) ----------

def _gcn_weights(mask, norm, dtype):
    w = mask.astype(dtype)
    if norm is not None:
        w = w * norm.astype(dtype)
    return w


def _gcn_fwd_impl(x, t_type, t_dir, nbr, bt, bd, mask, norm):
    w = _gcn_weights(mask, norm, x.dtype)
    out = _weighted_gather_sum(x, nbr, w)
    # scalar edge contribution: (cnt_t @ t_type + cnt_d @ t_dir) -> [N, 1]
    cnt_t = _counts(bt, w, t_type.shape[0])
    cnt_d = _counts(bd, w, t_dir.shape[0])
    e = (_matmul(cnt_t, t_type.astype(x.dtype), x.dtype)
         + _matmul(cnt_d, t_dir.astype(x.dtype), x.dtype))  # [N, 1]
    return out + e


@jax.custom_vjp
def gcn_aggregate(x, t_type, t_dir, nbr, bt, bd, mask, norm):
    """sum_k mask * norm * (x[nbr] + scalar_edge_emb). norm [N,K] or None
    must be symmetric in (node, neighbor) — true for dis[n]*dis[j]."""
    return _gcn_fwd_impl(x, t_type, t_dir, nbr, bt, bd, mask, norm)


def _gcn_fwd(x, t_type, t_dir, nbr, bt, bd, mask, norm):
    out = _gcn_fwd_impl(x, t_type, t_dir, nbr, bt, bd, mask, norm)
    wits = (jnp.zeros((), x.dtype), jnp.zeros((), t_type.dtype),
            jnp.zeros((), t_dir.dtype))
    return out, (nbr, bt, bd, mask, norm, t_type.shape[0], t_dir.shape[0],
                 wits)


def _gcn_bwd(res, g):
    nbr, bt, bd, mask, norm, n_type, n_dir, wits = res
    x_dtype, tt_dt, td_dt = (w.dtype for w in wits)
    w = _gcn_weights(mask, norm, g.dtype)
    dx = _weighted_gather_sum(g, nbr, w).astype(x_dtype)
    # scalar edge grads: dt[t] = sum_n cnt_t[n, t] * sum_d g[n, d]
    wf = _gcn_weights(mask, norm, jnp.float32)
    gsum = g.astype(jnp.float32).sum(axis=-1)             # [N]
    cnt_t = _counts(bt, wf, n_type)                       # [N, T]
    cnt_d = _counts(bd, wf, n_dir)
    dt = (cnt_t * gsum[:, None]).sum(axis=0)[:, None]     # [T, 1]
    dd = (cnt_d * gsum[:, None]).sum(axis=0)[:, None]     # [R, 1]
    return (dx, dt.astype(tt_dt), dd.astype(td_dt),
            None, None, None, None, None)


gcn_aggregate.defvjp(_gcn_fwd, _gcn_bwd)
