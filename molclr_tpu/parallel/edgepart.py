"""Edge/node-partitioned aggregation across a device mesh.

The graph analog of sequence parallelism (SURVEY §2.5 item 2, §5.7): when
one packed graph batch is too large for a chip, its node set is partitioned
across devices in contiguous row shards; each device owns its rows' ELL
in-edge lists (global neighbor ids). Remote neighbor features are resolved
by an `all_gather` over the mesh axis (correct, simple, rides ICI; for
molecular graphs h is a few MB, so the gather is cheap relative to compute).
A halo-optimized variant — exchanging only boundary nodes via ppermute with
compute/communication overlap — slots in behind the same interface later.

The scatter-free symmetric-adjacency backward survives sharding with one
extra collective: shard s owns ELL row j for each of its nodes j, and by
graph symmetry dh[j] = sum_k mask[j,k] * g[nbr[j,k]] — a LOCAL gather over
shard-owned rows, provided the cotangent g is first all-gathered. So both
directions are (all_gather + local gathers); no scatter anywhere.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from molclr_tpu.ops.scatter_free import (
    _counts,
    _weighted_gather_sum,
)


def shard_ell_rows(batch, n_shards: int):
    """Split a packed GraphBatch's node-wise ELL arrays into n_shards
    contiguous row shards (node count must divide evenly — choose PadSpec
    accordingly). Returns a dict of arrays with a leading shard axis; nbr
    indices remain GLOBAL."""
    n = batch.num_nodes
    if n % n_shards:
        raise ValueError(f"{n} nodes not divisible by {n_shards} shards")

    def split(x):
        return np.asarray(x).reshape((n_shards, n // n_shards)
                                     + x.shape[1:])

    return {
        "nbr": split(batch.nbr),
        "nbr_bond_type": split(batch.nbr_bond_type),
        "nbr_bond_dir": split(batch.nbr_bond_dir),
        "nbr_mask": split(batch.nbr_mask),
        "node_mask": split(batch.node_mask),
    }


def _gathered(h_local, axis):
    h_all = jax.lax.all_gather(h_local, axis)          # [S, n_local, D]
    return h_all.reshape(-1, h_local.shape[-1])        # [N_global, D]


@partial(jax.custom_vjp, nondiff_argnums=(7,))
def gine_aggregate_sharded(h_local, t_type, t_dir, nbr, bt, bd, mask, axis):
    """Sharded GINE aggregation: h_local [n_local, D] per shard, ELL arrays
    [n_local, K] with global neighbor ids. Call inside shard_map."""
    w = mask.astype(h_local.dtype)
    out = _weighted_gather_sum(_gathered(h_local, axis), nbr, w)
    cnt_t = _counts(bt, w, t_type.shape[0])
    cnt_d = _counts(bd, w, t_dir.shape[0])
    out = out + cnt_t @ t_type.astype(h_local.dtype)
    out = out + cnt_d @ t_dir.astype(h_local.dtype)
    return out


def _shard_fwd(h_local, t_type, t_dir, nbr, bt, bd, mask, axis):
    out = gine_aggregate_sharded(h_local, t_type, t_dir, nbr, bt, bd, mask,
                                 axis)
    wits = (jnp.zeros((), h_local.dtype), jnp.zeros((), t_type.dtype),
            jnp.zeros((), t_dir.dtype))
    return out, (nbr, bt, bd, mask, t_type.shape[0], t_dir.shape[0], wits)


def _shard_bwd(axis, res, g):
    nbr, bt, bd, mask, n_type, n_dir, wits = res
    h_dtype, tt_dtype, td_dtype = (w.dtype for w in wits)
    w = mask.astype(g.dtype)
    # dh for MY rows: local gather of the all-gathered cotangent (symmetry)
    dh = _weighted_gather_sum(_gathered(g, axis), nbr, w).astype(h_dtype)
    gf = g.astype(jnp.float32)
    wf = mask.astype(jnp.float32)
    cnt_t = _counts(bt, wf, n_type)
    cnt_d = _counts(bd, wf, n_dir)
    # Local partial table grads only: the shard_map transpose of a
    # replicated (P()) input psums the per-shard cotangents itself — an
    # explicit psum here would double-count by the shard count.
    dt = jax.lax.dot_general(cnt_t, gf, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dd = jax.lax.dot_general(cnt_d, gf, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return (dh, dt.astype(tt_dtype), dd.astype(td_dtype),
            None, None, None, None)


gine_aggregate_sharded.defvjp(_shard_fwd, _shard_bwd)


def build_sharded_layer(mesh, axis: str = "shard", grad: bool = False):
    """Jitted sharded aggregation over `mesh`: inputs carry a leading shard
    axis; returns the aggregated features (and, with grad=True, a function
    returning (out, dh) for testing the backward)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def local(h, t_type, t_dir, nbr, bt, bd, mask):
        sq = lambda x: x.reshape((-1,) + x.shape[2:])   # drop shard dim of 1
        out = gine_aggregate_sharded(
            sq(h), t_type, t_dir, sq(nbr), sq(bt), sq(bd), sq(mask), axis)
        return out[None]

    a = P(axis)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(a, P(), P(), a, a, a, a),
        out_specs=a,
        check_vma=False)
    return jax.jit(fn)
