"""Edge/node-partitioned aggregation across a device mesh.

The graph analog of sequence parallelism (SURVEY §2.5 item 2, §5.7): when
one packed graph batch is too large for a chip, its node set is partitioned
across devices in contiguous row shards; each device owns its rows' ELL
in-edge lists (global neighbor ids). Three communication strategies, in
decreasing ICI cost:

1. `gine_aggregate_sharded` — all_gather the full feature matrix per layer
   (correct and simple; h is a few MB for molecular batches).
2. `gine_aggregate_halo` — exchange only H boundary rows with the two
   neighboring shards via ppermute. Contiguous packing bounds every
   neighbor of row j to |nbr - j| < max molecule size, so H = max molecule
   rows suffices; ICI traffic drops from O(N) to O(H) per shard, and XLA
   overlaps the two ppermutes with the local edge-embedding matmuls.
3. `local_tile_aggregate` — ZERO communication: when the batch is packed
   tile-aligned (PadSpec.tile) and each shard's row count is a tile
   multiple, no molecule crosses a shard boundary, every neighbor is
   shard-local, and aggregation is the tile-dense block-diagonal matmul of
   ops/tile_dense.py run independently per shard. This is the production
   configuration: the packing contract *eliminates* the halo instead of
   optimizing it; the only collectives left in the training step are the
   BatchNorm psums and the NT-Xent projection all_gather.

The scatter-free symmetric-adjacency backward survives sharding in all
three: by graph symmetry dh[j] = sum_k mask[j,k] * g[nbr[j,k]] — the SAME
(gathered/halo-extended/local) gather applied to the cotangent. No scatter
anywhere.
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


# ---------- halo-exchange variant (ppermute, O(H) ICI traffic) ----------

def _halo_extend(x, halo: int, axis):
    """[n_local, D] -> [halo + n_local + halo, D]: receive the left
    neighbor's last rows and the right neighbor's first rows. Ring
    wrap-around rows are garbage but unreachable: contiguous packing keeps
    every molecule inside one shard's [start - halo, end + halo) window."""
    s = jax.lax.axis_size(axis)   # static under shard_map
    fwd = [(i, (i + 1) % s) for i in range(s)]
    bwd = [(i, (i - 1) % s) for i in range(s)]
    from_left = jax.lax.ppermute(x[-halo:], axis, perm=fwd)
    from_right = jax.lax.ppermute(x[:halo], axis, perm=bwd)
    return jnp.concatenate([from_left, x, from_right], axis=0)


def _halo_gather_sum(g_ext, nbr_local, w):
    return _weighted_gather_sum(g_ext, nbr_local, w)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def gine_aggregate_halo(h_local, t_type, t_dir, nbr, bt, bd, mask, axis,
                        halo):
    """Halo-exchange GINE aggregation inside shard_map.

    h_local [n_local, D]; nbr [n_local, K] GLOBAL neighbor ids; halo =
    static row count >= max molecule size (a PadSpec.tile works). The
    backward halo-extends the cotangent — valid because the adjacency is
    symmetric and every (j, nbr) pair lies within one halo window."""
    w = mask.astype(h_local.dtype)
    n_local = h_local.shape[0]
    start = jax.lax.axis_index(axis) * n_local
    # masked slots carry nbr=0, which is out of the halo window on shards
    # > 0 and would hit jnp.take's NaN fill — route them to index 0
    nbr_local = jnp.where(mask, nbr - start + halo, 0)
    out = _halo_gather_sum(_halo_extend(h_local, halo, axis), nbr_local, w)
    cnt_t = _counts(bt, w, t_type.shape[0])
    cnt_d = _counts(bd, w, t_dir.shape[0])
    out = out + cnt_t @ t_type.astype(h_local.dtype)
    out = out + cnt_d @ t_dir.astype(h_local.dtype)
    return out


def _halo_fwd(h_local, t_type, t_dir, nbr, bt, bd, mask, axis, halo):
    out = gine_aggregate_halo(h_local, t_type, t_dir, nbr, bt, bd, mask,
                              axis, halo)
    wits = (jnp.zeros((), h_local.dtype), jnp.zeros((), t_type.dtype),
            jnp.zeros((), t_dir.dtype))
    return out, (nbr, bt, bd, mask, t_type.shape[0], t_dir.shape[0], wits)


def _halo_bwd(axis, halo, res, g):
    nbr, bt, bd, mask, n_type, n_dir, wits = res
    h_dtype, tt_dtype, td_dtype = (w.dtype for w in wits)
    w = mask.astype(g.dtype)
    n_local = g.shape[0]
    start = jax.lax.axis_index(axis) * n_local
    nbr_local = jnp.where(mask, nbr - start + halo, 0)
    dh = _halo_gather_sum(_halo_extend(g, halo, axis), nbr_local,
                          w).astype(h_dtype)
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


gine_aggregate_halo.defvjp(_halo_fwd, _halo_bwd)


# ---------- tile-aligned variant (zero communication) ----------

def local_tile_aggregate(h_local, t_type, t_dir, nbr, bt, bd, mask, axis,
                         tile: int):
    """Collective-free sharded GINE aggregation: requires tile-aligned
    packing with n_local % tile == 0 so all neighbors are shard-local.
    Neighbor ids are globally numbered; tile locality makes the offset
    cancel inside build_tile_adjacency after subtracting the shard start."""
    from molclr_tpu.ops.tile_dense import build_tile_adjacency, tile_matmul

    n_local = h_local.shape[0]
    start = jax.lax.axis_index(axis) * n_local
    nbr_local = jnp.where(mask, nbr - start, 0)
    adj = build_tile_adjacency(nbr_local, mask, tile, dtype=h_local.dtype)
    w = mask.astype(h_local.dtype)
    out = tile_matmul(adj, h_local)
    cnt_t = _counts(bt, jax.lax.stop_gradient(w), t_type.shape[0])
    cnt_d = _counts(bd, jax.lax.stop_gradient(w), t_dir.shape[0])
    out = out + cnt_t @ t_type.astype(h_local.dtype)
    out = out + cnt_d @ t_dir.astype(h_local.dtype)
    return out


def build_sharded_layer(mesh, axis: str = "shard", grad: bool = False,
                        variant: str = "gather", halo: int = 0,
                        tile: int = 0):
    """Jitted sharded aggregation over `mesh`: inputs carry a leading shard
    axis; returns the aggregated features (and, with grad=True, a function
    returning (out, dh) for testing the backward).

    variant: 'gather' (all_gather, any packing), 'halo' (ppermute boundary
    exchange; halo >= max molecule rows), 'tile' (collective-free;
    tile-aligned packing with per-shard rows a tile multiple)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def local(h, t_type, t_dir, nbr, bt, bd, mask):
        sq = lambda x: x.reshape((-1,) + x.shape[2:])   # drop shard dim of 1
        args = (sq(h), t_type, t_dir, sq(nbr), sq(bt), sq(bd), sq(mask))
        if variant == "gather":
            out = gine_aggregate_sharded(*args, axis)
        elif variant == "halo":
            out = gine_aggregate_halo(*args, axis, halo)
        elif variant == "tile":
            out = local_tile_aggregate(*args, axis, tile)
        else:
            raise ValueError(f"unknown variant {variant!r}")
        return out[None]

    a = P(axis)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(a, P(), P(), a, a, a, a),
        out_specs=a,
        check_vma=False)
    return jax.jit(fn)
