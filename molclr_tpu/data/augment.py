"""On-device stochastic graph augmentations (jit-compatible).

The reference recomputes augmentations on the CPU inside DataLoader workers,
re-running RDKit + Python loops per molecule per epoch (dataset/dataset.py:
111-147, dataset_subgraph.py:96-177, dataset_mix.py:86-217). Here molecules
are featurized ONCE and augmentation is pure array math on the padded batch,
fused into the jitted train step:

  node      per graph mask max(1, floor(0.25 N)) atoms to [118, 0] and delete
            floor(0.25 M) bonds (both directions at once)
            (dataset/dataset.py:111-147)
  subgraph  wave-BFS from a random start until floor(0.25 N) atoms removed
            (masked) and their bonds dropped (dataset_subgraph.py:70-88;
            percent pinned at :122)
  mix       subgraph removal at U(0, 0.2) fraction, then top-up atom masking
            to floor(0.25 N) total and bond deletion down to ceil(0.75 M)
            surviving bonds (dataset_mix.py:175-215); callers should
            featurize with add_hs=True for parity (dataset_mix.py:88)

Documented divergence: within-wave BFS removal order and random sampling use
a JAX PRNG rather than Python's `random`, so draws differ stream-wise but
match in distribution; the two views' BFS start atoms are drawn distinct via
`paired_augment`, as in the reference (dataset_subgraph.py:109).

Sampling-without-replacement is implemented as ranking uniform keys within
each graph's contiguous segment, sort-free on the hot paths: tile-aligned
node buffers use a per-tile compare-and-count (_segment_ranks_tile, 15x
faster than a lexsort on v5e) and bond buffers a windowed compare-and-count
(_segment_ranks_window, bound by spec.max_graph_bonds); untiled/unbounded
batches fall back to one lexsort over the flat buffer. All variants
vectorize on TPU with no host round-trip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from molclr_tpu.data.featurize import MASK_ATOM_TYPE

# np (not jnp) scalar: a module-level jnp constant would boot the
# XLA backend at import time, breaking jax.distributed.initialize
# (which must run before any backend touch)
_INF_TIME = np.int32(0x3FFFFF)


def _segment_ranks(key, seg, valid, seg_counts):
    """Rank of each valid element among its segment's valid elements,
    ordered by `key`. Elements of segment g are contiguous in the flat
    buffer; padding may sit anywhere (sorted last via ~valid)."""
    n = key.shape[0]
    order = jnp.lexsort((key, seg, jnp.logical_not(valid)))
    start = jnp.cumsum(seg_counts) - seg_counts
    pos = jnp.arange(n, dtype=jnp.int32) - start[seg[order]]
    rank = jnp.zeros(n, jnp.int32).at[order].set(pos)
    return rank


def _segment_ranks_tile(key, seg, valid, tile: int):
    """Sort-free segment ranking for TILE-ALIGNED node buffers: since every
    segment lives inside one tile, rank_i = #{j in same segment :
    (key_j, j) < (key_i, i)} is a per-tile [tile, tile] compare-and-count —
    no sort, no scatter. Measured 15x faster than the lexsort path on v5e
    (10 us vs 150 us at N=5632). Identical output to _segment_ranks
    (stable position tie-break via the composite key)."""
    n = key.shape[0]
    t = n // tile
    # explicit (key, position) lexicographic compare — no composite shift,
    # so any int32 key range is safe (subgraph-removal keys reach ~2^25)
    k2 = jnp.where(valid, key, jnp.int32(0x7FFFFFFF)).reshape(t, tile)
    seg2 = jnp.where(valid, seg, -1).reshape(t, tile)
    idx2 = jnp.broadcast_to(
        jnp.arange(tile, dtype=jnp.int32)[None, :], (t, tile))
    same = seg2[:, :, None] == seg2[:, None, :]
    kj, ki = k2[:, None, :], k2[:, :, None]
    less = (kj < ki) | ((kj == ki)
                        & (idx2[:, None, :] < idx2[:, :, None]))
    return jnp.sum(same & less, axis=2, dtype=jnp.int32).reshape(n)


def _segment_ranks_window(key, seg, valid, seg_counts, window: int):
    """Sort-free segment ranking for CONTIGUOUS-segment buffers (bonds).

    Segments are contiguous and at most `window` long (PadSpec.
    max_graph_bonds, enforced by pack_batch), so any two same-segment
    elements sit within `window - 1` positions of each other. Reshape the
    buffer into blocks of `window`; every element's segment-mates then lie
    in its own block or the two adjacent ones, and
    rank_i = #{j in 3-block band : seg_j == seg_i, valid_j,
               (key_j, j) < (key_i, i)}
    is a [B, W, 3W] compare-and-count built from reshapes and static
    shifts only — no sort, no scatter, and crucially NO gather (a [n, W]
    arbitrary row gather of scalars profiled ~40x slower than this on
    v5e). Matches _segment_ranks on valid rows (stable position
    tie-break). seg_counts is unused (kept for signature parity)."""
    del seg_counts
    n = key.shape[0]
    w = max(int(window), 1)
    pad = (-n) % w
    big = jnp.int32(0x7FFFFFFF)
    if pad:
        key = jnp.concatenate([key, jnp.full(pad, big, key.dtype)])
        seg = jnp.concatenate([seg, jnp.full(pad, -1, seg.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros(pad, bool)])
    b = (n + pad) // w
    kb = key.reshape(b, w)
    sb = seg.reshape(b, w)
    vb = valid.reshape(b, w)
    ib = jnp.arange(n + pad, dtype=jnp.int32).reshape(b, w)

    def band(x, fill):
        prev = jnp.concatenate([jnp.full((1, w), fill, x.dtype), x[:-1]])
        nxt = jnp.concatenate([x[1:], jnp.full((1, w), fill, x.dtype)])
        return jnp.concatenate([prev, x, nxt], axis=1)       # [B, 3W]

    kw, sw = band(kb, big), band(sb, jnp.int32(-1))
    vw, iw = band(vb, False), band(ib, jnp.int32(-1))
    same = sw[:, None, :] == sb[:, :, None]                  # [B, W, 3W]
    less = (kw[:, None, :] < kb[:, :, None]) | (
        (kw[:, None, :] == kb[:, :, None])
        & (iw[:, None, :] < ib[:, :, None]))
    cnt = jnp.sum(same & vw[:, None, :] & less, axis=2, dtype=jnp.int32)
    return cnt.reshape(-1)[:n]


def _bond_ranks(batch, key, bond_window: int):
    """Segment ranks over the bond buffer: windowed compare-and-count when
    the per-molecule bond bound is known (spec.max_graph_bonds), else one
    lexsort over the flat buffer."""
    if bond_window:
        return _segment_ranks_window(key, batch.bond_graph, batch.bond_mask,
                                     batch.graph_n_bonds, bond_window)
    return _segment_ranks(key, batch.bond_graph, batch.bond_mask,
                          batch.graph_n_bonds)


def _node_ranks(batch, key, tile: int):
    """Segment ranks over the node buffer, using the tile fast path when
    the batch is tile-aligned (bond buffers are NOT tile-aligned and must
    keep the lexsort path)."""
    if tile:
        return _segment_ranks_tile(key, batch.node_graph, batch.node_mask,
                                   tile)
    return _segment_ranks(key, batch.node_graph, batch.node_mask,
                          batch.graph_n_nodes)


def _rand_keys(rng, n):
    return jax.random.randint(rng, (n,), 0, 1 << 20, dtype=jnp.int32)


def _hash_salts(rng):
    """Two int32 salts for _mix_keys, drawn once per stochastic draw."""
    return jax.random.randint(rng, (2,), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)


def _mix_keys(salts, ids):
    """Uniform int32 keys in [0, 1<<20) as a pure ELEMENTWISE hash of the
    ids (murmur3-finalizer avalanche, salted per draw).

    The point: the same bond's key is computable at EVERY consumer site —
    the contiguous bond buffer (ranking) and the [N, K] ELL slots
    (nbr_bond ids) — without gathering from a bond-indexed table.
    Arbitrary gathers from >~1k-entry tables run ~100x slower than
    elementwise ops on this TPU (runs/profile_aug.py: the two
    _apply_bond_drop takes were 0.30 of the 0.60 ms augmentation cost;
    graph-table [G=512] gathers measure free)."""
    x = ids.astype(jnp.uint32) ^ salts[0].astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16) ^ salts[1].astype(jnp.uint32)
    return (x >> 12).astype(jnp.int32)          # [0, 1<<20)


def _bond_threshold(batch, key_b, rank_b, k_b):
    """Per-graph lexicographic drop threshold (hc, bc): bond b of graph g
    is dropped iff (key(b), b) <= (hc[g], bc[g]).

    Equivalent to rank_b < k_b[graph] — the threshold is the (k_b-1)-ranked
    bond's (key, id) pair, selected per graph with a one-hot matmul (no
    scatters); graphs with k_b == 0 get (-1, -1), below every real key."""
    g = batch.num_graphs
    sel = batch.bond_mask & (rank_b == k_b[batch.bond_graph] - 1)
    oh = jax.nn.one_hot(batch.bond_graph, g, dtype=jnp.float32)   # [B, G]
    selv = sel.astype(jnp.float32)
    b_ids = jnp.arange(batch.num_bonds, dtype=jnp.float32)
    vals = jnp.stack([selv * key_b.astype(jnp.float32),
                      selv * b_ids], axis=1)                      # [B, 2]
    thr = jax.lax.dot_general(oh, vals, (((0,), (0,)), ((), ())))  # [G, 2]
    have = k_b > 0
    hc = jnp.where(have, thr[:, 0].astype(jnp.int32), -1)
    bc = jnp.where(have, thr[:, 1].astype(jnp.int32), -1)
    return hc, bc


def _nbr_mask_lex_drop(batch, salts, hc, bc):
    """Gather-free ELL update for a lex-threshold bond drop: recompute each
    slot's bond key elementwise from nbr_bond and compare against the
    node's graph threshold (graph-table gathers are free)."""
    keys = _mix_keys(salts, batch.nbr_bond)                 # [N, K]
    is_bond = batch.nbr_bond < batch.num_bonds              # excl. sentinel
    hcn = jnp.take(hc, batch.node_graph)[:, None]
    bcn = jnp.take(bc, batch.node_graph)[:, None]
    drop = is_bond & ((keys < hcn)
                      | ((keys == hcn) & (batch.nbr_bond <= bcn)))
    return batch.nbr_mask & jnp.logical_not(drop)


def _mask_atoms(batch, flag):
    atom_type = jnp.where(flag, MASK_ATOM_TYPE, batch.atom_type)
    chirality = jnp.where(flag, 0, batch.chirality)
    return atom_type, chirality


def _apply_bond_drop(batch, drop_bond):
    """Kill both directed rows and both ELL slots of dropped bonds.

    The drop table is gathered as int32, not bool: TPU gathers from pred
    arrays use a packed bit layout that profiled ~100x slower than int32
    gathers (the two bool-gather fusions dominated the whole train step)."""
    keep = jnp.concatenate(
        [jnp.logical_not(drop_bond), jnp.ones(1, bool)]  # sentinel id
    ).astype(jnp.int32)
    edge_mask = batch.edge_mask & (jnp.take(keep, batch.edge_bond) > 0)
    nbr_mask = batch.nbr_mask & (jnp.take(keep, batch.nbr_bond) > 0)
    return edge_mask, nbr_mask


def _bond_endpoints(batch):
    """Undirected bond endpoints from the even directed rows."""
    return batch.src[0::2], batch.dst[0::2]


def _flag_at_ids_tile(flag, ids, valid, tile: int):
    """flag[ids] for arbitrary node-id vectors on a tile-aligned batch
    WITHOUT an arbitrary gather: row-gather the id's [tile] block (the
    block table has N/tile ~ 22 rows — small-table gathers are free, like
    the [G=512] graph-table gathers) and one-hot compare the local
    offset. Invalid rows are routed to id 0 first (jnp.take's
    out-of-bounds mode here is NaN-fill, not clip). bf16 is EXACT here:
    products are {0,1} and row sums are <= tile=256 = 2^8, within bf16's
    8 explicit mantissa bits."""
    ids = jnp.where(valid, ids, 0)
    t = flag.shape[0] // tile
    fb = jnp.take(flag.reshape(t, tile).astype(jnp.bfloat16),
                  ids // tile, axis=0)                       # [B, tile]
    oh = jax.nn.one_hot(ids % tile, tile, dtype=jnp.bfloat16)
    return (oh * fb).sum(axis=1, dtype=jnp.float32) > 0.5


def _flag_at_nbr_tile(flag, nbr, tile: int):
    """flag[nbr] for a tile-aligned batch WITHOUT an arbitrary gather.

    Every neighbor is in the node's own tile (packing contract), so the
    lookup is a per-slot one-hot compare against the node's [tile] block
    of `flag` — the build_tile_adjacency accumulation pattern. Arbitrary
    [N, K] gathers from the node table measure ~5x slower than these
    compare-reduces on v5e (runs/profile_aug.py). Out-of-tile ids (padded
    slots carry global 0) one-hot to all-zero rows -> False."""
    n, k_slots = nbr.shape
    t = n // tile
    base = (jnp.arange(n, dtype=jnp.int32) // tile) * tile
    local = nbr - base[:, None]
    # bf16 is exact: {0,1} products, row sums <= tile=256 = 2^8
    fb = jnp.broadcast_to(
        flag.reshape(t, 1, tile).astype(jnp.bfloat16),
        (t, tile, tile)).reshape(n, tile)
    cols = []
    for k in range(k_slots):
        oh = jax.nn.one_hot(local[:, k], tile, dtype=jnp.bfloat16)
        cols.append((oh * fb).sum(axis=1, dtype=jnp.float32))
    return jnp.stack(cols, axis=1) > 0.5           # [N, K] bool


def node_augment(batch, rng, node_frac: float = 0.25,
                 bond_frac: float = 0.25, tile: int = 0,
                 bond_window: int = 0):
    """Atom masking + bond deletion (ref dataset/dataset.py:111-147)."""
    rng_n, rng_b = jax.random.split(rng)
    g = batch.num_graphs

    rank_n = _node_ranks(batch, _rand_keys(rng_n, batch.num_nodes), tile)
    k_n = jnp.where(
        batch.graph_mask,
        jnp.maximum(1, jnp.floor(node_frac * batch.graph_n_nodes)
                    .astype(jnp.int32)),
        0)
    mask_flag = batch.node_mask & (rank_n < k_n[batch.node_graph])
    atom_type, chirality = _mask_atoms(batch, mask_flag)

    # bond keys are an elementwise hash of the bond id (_mix_keys) so the
    # ELL view updates WITHOUT the [N, K]-from-bond-table gather that
    # dominated augmentation cost (runs/profile_aug.py)
    salts = _hash_salts(rng_b)
    key_b = _mix_keys(salts, jnp.arange(batch.num_bonds, dtype=jnp.int32))
    rank_b = _bond_ranks(batch, key_b, bond_window)
    k_b = jnp.floor(bond_frac * batch.graph_n_bonds).astype(jnp.int32)
    drop_bond = batch.bond_mask & (rank_b < k_b[batch.bond_graph])
    # COO view: legacy keep-table gather (dead code under the tile-dense /
    # fused consumers, which only read the ELL view)
    edge_mask, _ = _apply_bond_drop(batch, drop_bond)
    hc, bc = _bond_threshold(batch, key_b, rank_b, k_b)
    nbr_mask = _nbr_mask_lex_drop(batch, salts, hc, bc)
    return batch.replace(atom_type=atom_type, chirality=chirality,
                         edge_mask=edge_mask, nbr_mask=nbr_mask)


def _adj_power_stack(adj, stride: int):
    """[A^1 .. A^stride] stacked along rows: [T, stride*tile, tile].

    Built by log-doubling: with powers 1..p in hand, one stacked matmul
    [A^1..A^m] @ A^p (m = min(p, stride - p)) yields A^(p+1)..A^(p+m), so
    the build is ceil(log2(stride)) sequential matmuls. Each power is
    boolean-clamped to {0, 1} — entries of raw A^8 reach degree^8 and the
    sweep only needs reachability, not walk counts (self-loops in slot 0
    make A^m reach == 'within m waves')."""
    powers = [adj]
    t = adj.shape[-1]
    while len(powers) < stride:
        p = len(powers)
        m = min(p, stride - p)
        stack = jnp.concatenate(powers[:m], axis=1) if m > 1 else powers[0]
        new = jax.lax.dot_general(
            stack, powers[-1], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        new = (new > 0).astype(adj.dtype)
        for i in range(m):
            powers.append(new[:, i * t: (i + 1) * t, :])
    return jnp.concatenate(powers, axis=1)


def _bfs_times(batch, start_flag, max_waves: int, tile: int = 0,
               stride: int = 1, adj_cache=None):
    """Wave index at which each node is first reached from its graph's start
    atom over the (current) ELL adjacency. Unreached nodes get _INF_TIME.

    tile > 0 (tile-aligned batches) runs the frontier expansion as batched
    [T, tile, tile] @ [T, tile, V] matmuls over the block-diagonal
    adjacency instead of per-wave [N, K] gathers — the 32 sequential
    gather waves were ~13 ms on v5e at B=512 vs ~0.5 ms for the matmul
    form. start_flag may be [N] or [N, V]: V independent start sets share
    one wave sweep (the paired views' BFS runs batch into the same
    matmuls).

    stride = S > 1 (tile path only) adds LOG-DOUBLING: precompute the
    boolean power stack [A^1..A^S] (ceil(log2 S) sequential matmuls), then
    advance S waves per iteration with ONE [T, S*tile, tile] @ [T, tile,
    V] matmul — exact wave times recovered from the monotone hit counts
    (reach-within-m is nested in m, so the first hitting power is
    S - sum(hits)). Sequential matmul depth drops from max_waves to
    ceil(log2 S) + ceil(max_waves / S) (32 -> 7 at S=8); output is
    bit-identical to stride=1 (pinned by tests/test_augment.py).

    adj_cache = (adj, pstack_or_None) skips rebuilding the tile adjacency
    and its power stack — they depend only on the PRE-drop batch, so when
    one base batch serves many precomputed steps (bench / shared-batch
    dispatches) the build amortizes across all K steps and both views
    (VERDICT r4 weak #3). The pstack entry must have been built with the
    same stride (precompute_deltas_for guarantees this)."""
    if tile:
        from molclr_tpu.ops.tile_dense import build_tile_adjacency

        adj = (adj_cache[0] if adj_cache is not None
               else build_tile_adjacency(batch.nbr, batch.nbr_mask, tile,
                                         dtype=jnp.bfloat16))
        n = batch.num_nodes
        squeeze = start_flag.ndim == 1
        sf = start_flag[:, None] if squeeze else start_flag
        v = sf.shape[1]
        node_mask = batch.node_mask[:, None]
        t0 = jnp.where(sf, 0, _INF_TIME)

        stride = max(1, min(int(stride), max_waves))
        if stride > 1:
            pstack = (adj_cache[1]
                      if adj_cache is not None and adj_cache[1] is not None
                      else _adj_power_stack(adj, stride))
            n_iter = -(-max_waves // stride)

            def body(k, carry):
                t, f = carry
                fb = f.astype(jnp.bfloat16).reshape(-1, tile, v)
                hits = jax.lax.dot_general(
                    pstack, fb, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                hit = (hits > 0).reshape(-1, stride, tile, v)
                cnt = hit.sum(axis=1).reshape(n, v)      # monotone in m
                m_first = stride - cnt                    # 0-based
                t_cand = k * stride + m_first + 1
                newly = (cnt > 0) & (t == _INF_TIME)
                t = jnp.where(newly, t_cand, t)
                f_new = node_mask & hit[:, stride - 1].reshape(n, v)
                return t, f_new

            t, _ = jax.lax.fori_loop(
                0, n_iter, body, (t0, sf & node_mask))
            # iterations may overshoot max_waves when stride does not
            # divide it; clamp to the legacy horizon exactly
            t = jnp.where(t > max_waves, _INF_TIME, t)
            return t[:, 0] if squeeze else t

        def body(k, carry):
            t, f = carry
            fb = f.astype(jnp.bfloat16).reshape(-1, tile, v)
            nxt = jax.lax.dot_general(
                adj, fb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).reshape(n, v)
            f_new = node_mask & (nxt > 0)
            t = jnp.where(f_new & (t == _INF_TIME), k + 1, t)
            return t, f_new

        t, _ = jax.lax.fori_loop(
            0, max_waves, body, (t0, sf & node_mask))
        return t[:, 0] if squeeze else t

    t0 = jnp.where(start_flag, 0, _INF_TIME)

    def body(_, t):
        nbr_t = jnp.where(batch.nbr_mask, t[batch.nbr], _INF_TIME)
        best = jnp.minimum(nbr_t.min(axis=1) + 1, _INF_TIME)
        return jnp.minimum(t, jnp.where(batch.node_mask, best, _INF_TIME))

    return jax.lax.fori_loop(0, max_waves, body, t0)


def _subgraph_removal(batch, rng_s, rng_t, k_sub, max_waves: int,
                      start_rank_slot, tile: int = 0,
                      bfs_stride: int = 1, adj_cache=None):
    """Removed-node flags for wave-BFS removal of k_sub[g] atoms per graph.
    start_rank_slot selects which random-ranked node seeds the BFS; paired
    views share rng_s and use slots 0/1 so their start atoms are distinct
    (ref dataset_subgraph.py:109)."""
    start_rank = _node_ranks(batch, _rand_keys(rng_s, batch.num_nodes),
                             tile)
    start_flag = batch.node_mask & (start_rank == start_rank_slot)
    t = _bfs_times(batch, start_flag, max_waves, tile, bfs_stride,
                   adj_cache)
    # wave-ordered removal with random tie-break inside the final wave.
    # t is clipped to max_waves+1 before scaling: unreached nodes
    # (t=_INF_TIME) would otherwise overflow int32 and sort FIRST,
    # silently disabling removal on disconnected molecules (salts).
    # The clip value itself is capped at 2046 so (max_waves+1) << 20
    # stays below 2^31 even for explicit cfg.max_waves / corpus-derived
    # horizons beyond 2046 — waves past that are indistinguishable
    # anyway (the key only orders REACHED nodes, and t > max_waves was
    # already folded to _INF_TIME by _bfs_times).
    key = jnp.minimum(t, min(max_waves, 2045) + 1) * (1 << 20) \
        + _rand_keys(rng_t, batch.num_nodes)
    rank = _node_ranks(batch, key, tile)
    reached = t < _INF_TIME
    return (batch.node_mask & reached
            & (rank < k_sub[batch.node_graph]))


def _subgraph_removal_pair(batch, rng_s, rng_ts, k_subs, max_waves: int,
                           tile: int = 0, bfs_stride: int = 1,
                           adj_cache=None):
    """Removed-node flags for BOTH paired views at once. Identical to two
    _subgraph_removal calls with start_rank_slot 0/1 sharing rng_s — the
    views' BFS runs over the same (pre-drop) adjacency, so on tiled
    batches their frontiers stack into one [T, tile, 2] matmul sweep,
    halving the sequential wave count. rng_ts / k_subs are the per-view
    tie-break rngs and removal budgets."""
    start_rank = _node_ranks(batch, _rand_keys(rng_s, batch.num_nodes),
                             tile)
    starts = jnp.stack([batch.node_mask & (start_rank == 0),
                        batch.node_mask & (start_rank == 1)], axis=1)
    if tile:
        t_pair = _bfs_times(batch, starts, max_waves, tile, bfs_stride,
                            adj_cache)
    else:
        t_pair = jnp.stack(
            [_bfs_times(batch, starts[:, v], max_waves, tile)
             for v in range(2)], axis=1)
    out = []
    for v in range(2):
        t = t_pair[:, v]
        key = jnp.minimum(t, max_waves + 1) * (1 << 20) + _rand_keys(
            rng_ts[v], batch.num_nodes)
        rank = _node_ranks(batch, key, tile)
        out.append(batch.node_mask & (t < _INF_TIME)
                   & (rank < k_subs[v][batch.node_graph]))
    return out[0], out[1]


def _finish_subgraph(batch, removed, tile: int = 0):
    """Mask removed atoms and drop bonds touching them (the per-view tail
    of subgraph removal, ref dataset_subgraph.py:137-172).

    On tiled batches the ELL view updates gather-free: a slot drops iff
    either endpoint is removed, evaluated in slot space via
    _flag_at_nbr_tile (same predicate as the bond-space drop, so the COO
    and ELL views agree exactly). The COO chain keeps the legacy keep-
    table gathers — dead code under the tile-dense/fused consumers."""
    atom_type, chirality = _mask_atoms(batch, removed)
    bsrc, bdst = _bond_endpoints(batch)
    rem = removed.astype(jnp.int32)  # int32 gathers (see _apply_bond_drop)
    drop_bond = batch.bond_mask & (
        (jnp.take(rem, bsrc) | jnp.take(rem, bdst)) > 0)
    edge_mask, nbr_legacy = _apply_bond_drop(batch, drop_bond)
    if tile:
        is_bond = batch.nbr_bond < batch.num_bonds
        drop_slot = is_bond & (
            removed[:, None] | _flag_at_nbr_tile(removed, batch.nbr, tile))
        nbr_mask = batch.nbr_mask & jnp.logical_not(drop_slot)
    else:
        nbr_mask = nbr_legacy
    return batch.replace(atom_type=atom_type, chirality=chirality,
                         edge_mask=edge_mask, nbr_mask=nbr_mask)


@partial(jax.jit, static_argnames=("frac", "max_waves", "start_rank_slot",
                                   "tile", "bfs_stride"))
def subgraph_augment(batch, rng, frac: float = 0.25, max_waves: int = 32,
                     start_rank_slot: int = 0, start_rng=None,
                     tile: int = 0, bfs_stride: int = 1, adj_cache=None):
    """BFS subgraph removal (ref dataset_subgraph.py:70-88,96-177)."""
    rng_s, rng_t = jax.random.split(rng)
    if start_rng is not None:
        rng_s = start_rng
    k_sub = jnp.floor(frac * batch.graph_n_nodes).astype(jnp.int32)
    removed = _subgraph_removal(batch, rng_s, rng_t, k_sub, max_waves,
                                start_rank_slot, tile, bfs_stride,
                                adj_cache)
    return _finish_subgraph(batch, removed, tile)


@partial(jax.jit, static_argnames=("frac", "max_waves", "tile",
                                   "bfs_stride"))
def paired_subgraph_augment(batch, rng_i, rng_j, rng_start,
                            frac: float = 0.25, max_waves: int = 32,
                            tile: int = 0, bfs_stride: int = 1,
                            adj_cache=None):
    """Both subgraph views in one program: the two BFS sweeps share the
    pre-drop adjacency and batch into [T, tile, 2] matmuls. Bit-identical
    to two subgraph_augment calls with start_rank_slot 0/1."""
    rng_ts = [jax.random.split(r)[1] for r in (rng_i, rng_j)]
    k_sub = jnp.floor(frac * batch.graph_n_nodes).astype(jnp.int32)
    rem_i, rem_j = _subgraph_removal_pair(batch, rng_start, rng_ts,
                                          (k_sub, k_sub), max_waves, tile,
                                          bfs_stride, adj_cache)
    return (_finish_subgraph(batch, rem_i, tile),
            _finish_subgraph(batch, rem_j, tile))


def _finish_mix(batch, removed, rng_n, rng_b, node_frac: float,
                bond_keep: float, tile: int, bond_window: int):
    """Top-up masking/deletion after subgraph removal (the per-view tail
    of the mix augmentation, ref dataset_mix.py:175-215)."""
    g = batch.num_graphs
    n_removed = jax.ops.segment_sum(removed.astype(jnp.int32),
                                    batch.node_graph, num_segments=g)

    # top-up atom masking among survivors (ref dataset_mix.py:179,183)
    k_total = jnp.floor(node_frac * batch.graph_n_nodes).astype(jnp.int32)
    k_extra = jnp.maximum(0, k_total - n_removed)
    survivors = batch.node_mask & jnp.logical_not(removed)
    key = jnp.where(removed, -1, _rand_keys(rng_n, batch.num_nodes))
    # removed nodes rank first (key -1), so survivors' ranks start at
    # n_removed; extra-masked = survivor ranks in [n_removed, n_removed+k_extra)
    rank = _node_ranks(batch, key, tile)
    topup = survivors & (rank < (n_removed + k_extra)[batch.node_graph])
    masked = removed | topup
    atom_type, chirality = _mask_atoms(batch, masked)

    # bond deletion down to ceil(bond_keep * M) survivors
    # (ref dataset_mix.py:180,184: num_mask_edges = M_rem - ceil(0.75 M))
    bsrc, bdst = _bond_endpoints(batch)
    if tile:
        # endpoint-removal flags WITHOUT [B]-from-node-table gathers
        # (unlike _finish_subgraph's, this drop_sub is LIVE — it keys the
        # bond ranking below)
        drop_sub = batch.bond_mask & (
            _flag_at_ids_tile(removed, bsrc, batch.bond_mask, tile)
            | _flag_at_ids_tile(removed, bdst, batch.bond_mask, tile))
    else:
        rem = removed.astype(jnp.int32)  # int32 gathers (_apply_bond_drop)
        drop_sub = batch.bond_mask & (
            (jnp.take(rem, bsrc) | jnp.take(rem, bdst)) > 0)
    keep_cap = jnp.ceil(bond_keep * batch.graph_n_bonds).astype(jnp.int32)
    salts = _hash_salts(rng_b)
    hash_b = _mix_keys(salts, jnp.arange(batch.num_bonds, dtype=jnp.int32))
    bkey = jnp.where(drop_sub, _INF_TIME, hash_b)
    brank = _bond_ranks(batch, bkey, bond_window)
    # surviving bonds rank first; keep only the first keep_cap of them
    drop_extra = (batch.bond_mask & jnp.logical_not(drop_sub)
                  & (brank >= keep_cap[batch.bond_graph]))
    edge_mask, nbr_legacy = _apply_bond_drop(batch, drop_sub | drop_extra)
    if tile:
        # ELL view gather-free: endpoint-removal drop in slot space plus
        # the lex KEEP threshold — a slot's bond key is where(drop_sub,
        # INF, hash(bond id)), all computable per slot; kept bonds are the
        # keep_cap lowest (key, id) pairs, everything else drops. The
        # drop_sub predicate is identical in both spaces, so COO and ELL
        # agree exactly.
        is_bond = batch.nbr_bond < batch.num_bonds
        drop_sub_slot = is_bond & (
            removed[:, None] | _flag_at_nbr_tile(removed, batch.nbr, tile))
        hc, bc = _bond_threshold(batch, bkey, brank, keep_cap)
        key_slot = jnp.where(drop_sub_slot, _INF_TIME,
                             _mix_keys(salts, batch.nbr_bond))
        hcn = jnp.take(hc, batch.node_graph)[:, None]
        bcn = jnp.take(bc, batch.node_graph)[:, None]
        keep_slot = ((key_slot < hcn)
                     | ((key_slot == hcn) & (batch.nbr_bond <= bcn)))
        drop_slot = drop_sub_slot | (is_bond & jnp.logical_not(keep_slot))
        nbr_mask = batch.nbr_mask & jnp.logical_not(drop_slot)
    else:
        nbr_mask = nbr_legacy
    return batch.replace(atom_type=atom_type, chirality=chirality,
                         edge_mask=edge_mask, nbr_mask=nbr_mask)


@partial(jax.jit,
         static_argnames=("sub_frac_max", "node_frac", "bond_keep",
                          "max_waves", "start_rank_slot", "tile",
                          "bond_window", "bfs_stride"))
def mix_augment(batch, rng, sub_frac_max: float = 0.2,
                node_frac: float = 0.25, bond_keep: float = 0.75,
                max_waves: int = 32, start_rank_slot: int = 0,
                start_rng=None, tile: int = 0, bond_window: int = 0,
                bfs_stride: int = 1, adj_cache=None):
    """Subgraph removal + top-up masking/deletion (ref dataset_mix.py)."""
    rng_f, rng_s, rng_n, rng_b = jax.random.split(rng, 4)
    f = jax.random.uniform(rng_f, (batch.num_graphs,), maxval=sub_frac_max)
    k_sub = jnp.floor(f * batch.graph_n_nodes).astype(jnp.int32)
    rng_ss, rng_st = jax.random.split(rng_s)
    if start_rng is not None:
        rng_ss = start_rng
    removed = _subgraph_removal(batch, rng_ss, rng_st, k_sub, max_waves,
                                start_rank_slot, tile, bfs_stride,
                                adj_cache)
    return _finish_mix(batch, removed, rng_n, rng_b, node_frac, bond_keep,
                       tile, bond_window)


@partial(jax.jit,
         static_argnames=("sub_frac_max", "node_frac", "bond_keep",
                          "max_waves", "tile", "bond_window",
                          "bfs_stride"))
def paired_mix_augment(batch, rng_i, rng_j, rng_start,
                       sub_frac_max: float = 0.2, node_frac: float = 0.25,
                       bond_keep: float = 0.75, max_waves: int = 32,
                       tile: int = 0, bond_window: int = 0,
                       bfs_stride: int = 1, adj_cache=None):
    """Both mix views in one program with the BFS sweeps batched (see
    paired_subgraph_augment). Bit-identical to two mix_augment calls with
    start_rank_slot 0/1 sharing start_rng."""
    k_subs, rng_ts, rng_ns, rng_bs = [], [], [], []
    for r in (rng_i, rng_j):
        rng_f, rng_s, rng_n, rng_b = jax.random.split(r, 4)
        f = jax.random.uniform(rng_f, (batch.num_graphs,),
                               maxval=sub_frac_max)
        k_subs.append(jnp.floor(f * batch.graph_n_nodes).astype(jnp.int32))
        rng_ts.append(jax.random.split(rng_s)[1])
        rng_ns.append(rng_n)
        rng_bs.append(rng_b)
    rem_i, rem_j = _subgraph_removal_pair(batch, rng_start, rng_ts,
                                          k_subs, max_waves, tile,
                                          bfs_stride, adj_cache)
    return (_finish_mix(batch, rem_i, rng_ns[0], rng_bs[0], node_frac,
                        bond_keep, tile, bond_window),
            _finish_mix(batch, rem_j, rng_ns[1], rng_bs[1], node_frac,
                        bond_keep, tile, bond_window))


# jit-wrapped node_augment (no static args beyond fractions)
node_augment = partial(jax.jit, static_argnames=("node_frac", "bond_frac",
                                                 "tile",
                                                 "bond_window"))(node_augment)


def paired_augment(batch, rng, kind: str = "node", tile: int = 0,
                   bond_window: int = 0, bfs_stride: int = 8,
                   max_waves: int = 0, adj_cache=None, **kwargs):
    """The two contrastive views of one base batch (ref returns (data_i,
    data_j) per molecule, dataset/dataset.py:147). BFS-based kinds use
    distinct start atoms per view via start_rank_slot; pass tile > 0 for
    tile-aligned batches to run BFS as block-diagonal matmuls, and
    bond_window = spec.max_graph_bonds to rank bonds without a sort.

    max_waves bounds the BFS horizon for the subgraph/mix kinds (0 keeps
    their default, 32). The reference BFS is UNBOUNDED — it grows until
    25% of atoms are collected (dataset_subgraph.py:70-88) — so trainers
    pass a corpus-derived bound (max atoms per molecule - 1 >= any graph
    eccentricity; PretrainConfig.max_waves): molecules with diameter
    beyond the horizon would otherwise silently under-remove.
    adj_cache: see _bfs_times (shared-base-batch dispatch amortization)."""
    rng_i, rng_j, rng_start = jax.random.split(rng, 3)
    kwargs["tile"] = tile
    if kind in ("subgraph", "mix"):
        # log-doubling wave stride (tile path; bit-identical to stride 1)
        kwargs.setdefault("bfs_stride", bfs_stride)
        if max_waves:
            kwargs.setdefault("max_waves", max_waves)
        if adj_cache is not None:
            kwargs["adj_cache"] = adj_cache
    if kind == "none":
        # identity views: both branches see the raw batch (debug/benchmark
        # baseline, and the layout-equality tests of parallel/partition.py
        # where stochastic draws would differ between shardings)
        return batch, batch
    if kind == "node":
        kwargs["bond_window"] = bond_window
        return (node_augment(batch, rng_i, **kwargs),
                node_augment(batch, rng_j, **kwargs))
    if kind == "subgraph":
        # shared start ranking + slots 0/1 -> distinct start atoms per
        # view (no bond ranking: bonds drop by removed endpoints); both
        # views' BFS sweeps batch into the same wave matmuls
        return paired_subgraph_augment(batch, rng_i, rng_j, rng_start,
                                       **kwargs)
    if kind == "mix":
        kwargs["bond_window"] = bond_window
        return paired_mix_augment(batch, rng_i, rng_j, rng_start, **kwargs)
    raise ValueError(f"unknown augmentation kind {kind!r}")


# ---- batched per-dispatch augmentation (VERDICT r4 roofline work) ----
#
# Every augmentation kind mutates exactly these four fields; the rest of
# the GraphBatch is the shared base batch. Augmentation is independent of
# the train state, so a K-step dispatch can compute ALL K steps' paired
# views in one vmapped op up front (one launch of big fused kernels
# instead of K launches of ~30 small ops — augmentation is overhead-
# bound, ~0.40 ms/step standalone on v5e at B=512) and the scan body
# just leading-axis-indexes the deltas (~95 KB/view/step).

AUG_DELTA_FIELDS = ("atom_type", "chirality", "edge_mask", "nbr_mask")


def view_delta(view):
    """The augmented fields of a view, as a tuple pytree."""
    return tuple(getattr(view, f) for f in AUG_DELTA_FIELDS)


def apply_view_delta(batch, delta):
    """Reconstruct a full view from the base batch + a delta tuple."""
    return batch.replace(**dict(zip(AUG_DELTA_FIELDS, delta)))


def precompute_deltas_for(get_batch, rng_for_step, n: int, kind: str,
                          chunk: int = 0, shared_batch: bool = False,
                          **kwargs):
    """General batched-augmentation engine shared by every scan path
    (bench, Pretrainer host/resident/units, DP resident/units): step i
    augments get_batch(i) with rng key rng_for_step(i); returns both
    views' delta tuples stacked on a leading [n] axis.

    Chunked via lax.map (vmap width `chunk`) to bound the batched
    intermediates' memory; chunk=0 auto-picks 16 for node and 4 for the
    BFS kinds (subgraph/mix), whose vmapped [T, stride*tile, tile]
    adjacency-power stacks are ~50x larger per step than node's
    compare-counts. A non-divisible n runs floor(n/chunk) chunks plus a
    (< chunk)-wide remainder vmap — NEVER a full-width vmap, which would
    unbound exactly the memory the chunking exists to bound.

    shared_batch=True declares get_batch(i) identical for every i (the
    bench / precompute_paired_deltas shape): the BFS kinds then build the
    tile adjacency and its [A^1..A^S] power stack ONCE outside the
    per-step vmap instead of per step (VERDICT r4 weak #3 — the stacks
    depend only on the pre-drop base batch). Bit-identical outputs."""

    adj_cache = None
    if (shared_batch and kind in ("subgraph", "mix")
            and kwargs.get("tile")):
        from molclr_tpu.ops.tile_dense import build_tile_adjacency

        tile = kwargs["tile"]
        b0 = get_batch(jnp.int32(0))
        adj = build_tile_adjacency(b0.nbr, b0.nbr_mask, tile,
                                   dtype=jnp.bfloat16)
        stride = int(kwargs.get("bfs_stride", 8))
        mw = int(kwargs.get("max_waves", 0) or 32)
        stride = max(1, min(stride, mw))
        pstack = _adj_power_stack(adj, stride) if stride > 1 else None
        adj_cache = (adj, pstack)

    def one(i):
        vi, vj = paired_augment(get_batch(i), rng_for_step(i), kind,
                                adj_cache=adj_cache, **kwargs)
        return view_delta(vi), view_delta(vj)

    if chunk <= 0:
        chunk = 4 if kind in ("subgraph", "mix") else 16
    idx = jnp.arange(n, dtype=jnp.int32)
    if n <= chunk:
        return jax.vmap(one)(idx)
    full = (n // chunk) * chunk
    out = jax.tree_util.tree_map(
        lambda x: x.reshape((full,) + x.shape[2:]),
        jax.lax.map(jax.vmap(one), idx[:full].reshape(-1, chunk)))
    if full < n:
        rem = jax.vmap(one)(idx[full:])
        out = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b]), out, rem)
    return out


def precompute_paired_deltas(batch, rng, k: int, kind: str,
                             chunk: int = 0, **kwargs):
    """Both views' deltas for steps 0..k-1 over ONE shared base batch.

    Matches the train-step rng protocol exactly: step i draws
    ra = split(fold_in(rng, i), 3)[0], so a step consuming these deltas
    sees bit-identical views to one calling paired_augment inline."""
    return precompute_deltas_for(
        lambda i: batch,
        lambda i: jax.random.split(jax.random.fold_in(rng, i), 3)[0],
        k, kind, chunk=chunk, shared_batch=True, **kwargs)
