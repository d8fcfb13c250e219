"""Fresh per-epoch batch compositions on the device-resident path.

The reference re-draws batch MEMBERSHIP every epoch (its DataLoader
reshuffles molecules, dataset/dataset.py:179-183), so the in-batch
negatives of the contrastive loss change across epochs. The resident-HBM
batch cache (train/pretrain.py) froze compositions after epoch 0 — only
batch ORDER reshuffled (VERDICT r3 missing #2). This module restores
fresh compositions WITHOUT re-introducing per-epoch host repacking or
host->device transfers:

  - the corpus is packed ONCE into fixed-shape TILE-UNITS: each unit is a
    mini GraphBatch of exactly `tile` node slots (one MXU tile), G_t graph
    slots and E_t edge slots, with whole molecules inside (the tile
    contract trivially holds: unit n_nodes == tile);
  - the unit stack [U, ...] is uploaded to HBM once;
  - every training step draws T units and `concat_units` renumbers them
    into one standard GraphBatch ON-DEVICE: a leading-axis take of T
    contiguous unit rows plus static per-slot offsets (node += i*tile,
    graph += i*G_t, bond += i*B_t with the sentinel mapped to T*B_t) —
    the exact arithmetic of data/graphs.concat_shards, vectorized, with
    zero scatters and zero host traffic.

Per epoch, a fresh permutation of all U units regrouped into S batches
re-draws the negative pool of every batch. Granularity note: molecules
WITHIN one tile-unit stay together across epochs (~tile/avg_atoms
molecules); everything across units — i.e. all but ~G_t of each batch's
~T*G_t pairings — is redrawn each epoch. Cross-epoch randomness of the
views themselves is unaffected (augmentation is drawn on-device per
step).

Cost: the unit stack holds the same bytes as the frozen batch cache (unit
padding replaces batch padding), and the per-step regroup is a contiguous
[T, tile]-block gather + elementwise offset adds.
"""

from __future__ import annotations

import numpy as np

from molclr_tpu.data.graphs import GraphBatch, PadSpec


def plan_units(graphs, tile: int) -> list[list]:
    """Greedy first-fit grouping of molecules into `tile`-node units,
    preserving the given order (shuffle upstream for mixed units)."""
    groups, cur, nodes = [], [], 0
    for g in graphs:
        if g.n_atoms > tile:
            raise ValueError(
                f"molecule with {g.n_atoms} atoms exceeds tile {tile}")
        if nodes + g.n_atoms > tile:
            groups.append(cur)
            cur, nodes = [], 0
        cur.append(g)
        nodes += g.n_atoms
    if cur:
        groups.append(cur)
    return groups


def unit_spec_for(groups, tile: int, max_degree: int = 6) -> PadSpec:
    """The single static PadSpec covering every planned unit: G_t / E_t
    are the worst case over groups (one compile for all units)."""
    g_t = max(len(gr) for gr in groups)
    e_t = max(sum(g.edge_src.shape[0] for g in gr) for gr in groups)
    e_t = -(-e_t // 2) * 2
    max_bonds = max(g.edge_src.shape[0] // 2
                    for gr in groups for g in gr)
    return PadSpec(n_graphs=g_t, n_nodes=tile, n_edges=max(e_t, 2),
                   max_degree=max_degree, tile=tile,
                   max_graph_bonds=max_bonds)


def pack_unit_stack(graphs, tile: int, max_degree: int = 6,
                    seed: int = 0, uspec: PadSpec | None = None):
    """Pack a corpus into the [U, ...] tile-unit stack (host, one-time).

    Returns (stack_tree of numpy arrays with leading axis U, unit_spec,
    units). Molecules are shuffled once (seeded) before grouping so
    units mix the corpus. Pass `uspec` to pack with an externally AGREED
    spec (multi-host SPMD: every process must use identical unit shapes
    — parallel/multihost.agree_ints over the local specs' dims)."""
    from molclr_tpu.data.graphs import pack_batch

    order = np.random.RandomState(seed).permutation(len(graphs))
    shuffled = [graphs[i] for i in order]
    groups = plan_units(shuffled, tile)
    local = unit_spec_for(groups, tile, max_degree)
    if uspec is None:
        uspec = local
    elif (uspec.n_graphs < local.n_graphs
          or uspec.n_edges < local.n_edges
          or uspec.max_graph_bonds < local.max_graph_bonds):
        raise ValueError(f"agreed unit spec {uspec} smaller than local "
                         f"requirements {local}")
    units = [pack_batch(gr, uspec) for gr in groups]
    import jax

    stack = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs], axis=0), *units)
    return stack, uspec, units


def concat_units(stack, idx):
    """Jittable vectorized concat_shards over a unit stack.

    stack: GraphBatch pytree with a leading unit axis [U, ...] — OR a
    plain dict of the same fields in NARROW wire dtypes (int8/int16
    indices, uint8 masks; train/pretrain.Pretrainer narrows the resident
    stack when the full-width bytes exceed the HBM budget, the 10M-corpus
    configuration). Narrow fields are widened to int32/bool right after
    the [T]-row take (per-unit values are bounded by the UNIT spec, so
    the narrow storage is exact; the concat offsets are added post-widen
    in int32).
    idx: int32 [T] unit ids. Returns one GraphBatch with T*tile nodes,
    T*G_t graphs, T*E_t edges — bit-identical to
    concat_shards([units[i] for i in idx])."""
    import jax.numpy as jnp

    narrow = isinstance(stack, dict)
    get = (stack.__getitem__ if narrow
           else lambda f: getattr(stack, f))
    t = idx.shape[0]
    n = get("atom_type").shape[1]         # tile
    g = get("graph_mask").shape[1]        # G_t
    bmax = get("bond_graph").shape[1]     # B_t
    off = jnp.arange(t, dtype=jnp.int32)

    def take(field):
        y = jnp.take(get(field), idx, axis=0)
        if narrow:
            if y.dtype in (jnp.dtype(jnp.uint8), jnp.dtype(jnp.bool_)):
                y = y.astype(jnp.bool_)
            else:
                y = y.astype(jnp.int32)
        return y

    def flat(field):
        y = take(field)
        return y.reshape((t * y.shape[1],) + y.shape[2:])

    def shifted(field, s):
        y = take(field)
        o = off.reshape((t,) + (1,) * (y.ndim - 1))
        return (y + o * s).reshape((t * y.shape[1],) + y.shape[2:])

    def shifted_bond(field):
        # per-unit sentinel B_t -> concatenated sentinel T*B_t (the
        # sentinel-bond invariant of concat_shards, graphs.py:149-153)
        y = take(field)
        o = off.reshape((t,) + (1,) * (y.ndim - 1))
        y = jnp.where(y == bmax, t * bmax, y + o * bmax)
        return y.reshape((t * y.shape[1],) + y.shape[2:])

    return GraphBatch(
        atom_type=flat("atom_type"),
        chirality=flat("chirality"),
        node_graph=shifted("node_graph", g),
        node_mask=flat("node_mask"),
        src=shifted("src", n),
        dst=shifted("dst", n),
        bond_type=flat("bond_type"),
        bond_dir=flat("bond_dir"),
        edge_bond=shifted_bond("edge_bond"),
        edge_mask=flat("edge_mask"),
        nbr=shifted("nbr", n),
        nbr_bond_type=flat("nbr_bond_type"),
        nbr_bond_dir=flat("nbr_bond_dir"),
        nbr_bond=shifted_bond("nbr_bond"),
        nbr_mask=flat("nbr_mask"),
        bond_graph=shifted("bond_graph", g),
        bond_mask=flat("bond_mask"),
        graph_mask=flat("graph_mask"),
        graph_n_nodes=flat("graph_n_nodes"),
        graph_n_bonds=flat("graph_n_bonds"),
    )


def epoch_unit_orders(n_units: int, units_per_batch: int, seed: int,
                      epoch: int) -> np.ndarray:
    """Deterministic per-epoch regrouping: a fresh permutation of all
    units reshaped to [S, T]; the remainder (< T units) is dropped, the
    drop_last analog at unit granularity. Seeded by (seed, epoch) so
    resume reproduces the identical stream."""
    rng = np.random.RandomState((seed * 1_000_003 + epoch) % (2**31 - 1))
    perm = rng.permutation(n_units).astype(np.int32)
    s = n_units // units_per_batch
    return perm[: s * units_per_batch].reshape(s, units_per_batch)


def plan_corpus_units(subset, tile: int, max_degree: int = 6,
                      seed: int = 0):
    """Corpus-scale unit planning WITHOUT materializing Python MolGraphs:
    greedy first-fit over a seeded shuffle of the subset, driven by the
    corpus's vectorized atom/edge counts. Returns (id_groups — list of
    int32 corpus-molecule-id arrays, one per unit — and the static unit
    PadSpec). The sequential first-fit loop over counts is the only
    Python-per-molecule cost (~3 s at 10M)."""
    if len(subset) == 0:
        # ValueError (not IndexError from reduceat on an empty array) so
        # the trainer's host-streaming fallback catch applies
        raise ValueError("cannot plan tile-units for an empty subset")
    order = np.random.RandomState(seed).permutation(len(subset))
    ids = np.asarray(subset.ids)[order].astype(np.int32)
    atoms = np.asarray(subset.atom_counts)[order]
    edges = np.asarray(subset.edge_counts)[order]
    if atoms.size and int(atoms.max()) > tile:
        raise ValueError(
            f"molecule with {int(atoms.max())} atoms exceeds tile {tile}")
    bounds = [0]
    acc = 0
    for i, c in enumerate(atoms.tolist()):
        if acc + c > tile:
            bounds.append(i)
            acc = 0
        acc += c
    bounds.append(len(atoms))
    bounds = np.asarray(bounds, np.int64)
    sizes = np.diff(bounds)
    group_edges = np.add.reduceat(edges, bounds[:-1]) if len(sizes) else \
        np.zeros(0, np.int64)
    g_t = int(sizes.max()) if len(sizes) else 1
    e_t = int(group_edges.max()) if len(sizes) else 2
    e_t = -(-e_t // 2) * 2
    max_bonds = int(edges.max()) // 2 if edges.size else 1
    uspec = PadSpec(n_graphs=g_t, n_nodes=tile, n_edges=max(e_t, 2),
                    max_degree=max_degree, tile=tile,
                    max_graph_bonds=max_bonds)
    id_groups = [ids[bounds[i]:bounds[i + 1]]
                 for i in range(len(bounds) - 1)]
    return id_groups, uspec


def unit_stack_bytes(uspec: PadSpec, n_units: int,
                     narrow: dict | None = None) -> int:
    """Host/HBM bytes of a [U, ...] unit stack under the given storage
    (narrow wire dtypes or full int32/bool)."""
    n, e, g, k = uspec.n_nodes, uspec.n_edges, uspec.n_graphs, \
        uspec.ell_slots
    bn = uspec.n_bonds
    fields = {
        "atom_type": n, "chirality": n, "node_graph": n, "node_mask": n,
        "src": e, "dst": e, "bond_type": e, "bond_dir": e,
        "edge_bond": e, "edge_mask": e,
        "nbr": n * k, "nbr_bond_type": n * k, "nbr_bond_dir": n * k,
        "nbr_bond": n * k, "nbr_mask": n * k,
        "bond_graph": bn, "bond_mask": bn,
        "graph_mask": g, "graph_n_nodes": g, "graph_n_bonds": g,
    }
    total = 0
    for f, cnt in fields.items():
        if narrow:
            itemsize = np.dtype(narrow[f]).itemsize
        else:
            itemsize = 1 if f.endswith("mask") else 4
        total += cnt * itemsize
    return total * n_units


def pack_unit_stack_corpus(subset, tile: int, max_degree: int = 6,
                           seed: int = 0, narrow: dict | None = None,
                           progress=None):
    """Corpus-scale analog of pack_unit_stack: plan units from the
    vectorized counts (plan_corpus_units) and pack them with the native
    ragged packer (native.pack_unit_stack_indexed) straight from the
    memory-mapped buffers. The trainer inlines this plan+pack sequence
    (Pretrainer._maybe_upload_units) to interleave its HBM-budget check
    between planning and packing; this helper is the standalone API and
    the parity surface tests/test_regroup.py pins against the inlined
    path. Returns (stack_dict [U, ...], uspec, n_units)
    — stack fields in `narrow` wire dtypes when given (concat_units
    widens them on-device after the per-step row take) — or None when
    the native library is unavailable."""
    from molclr_tpu import native

    if not native.native_available():
        return None
    id_groups, uspec = plan_corpus_units(subset, tile, max_degree, seed)
    stack = native.pack_unit_stack_indexed(
        subset.corpus, id_groups, uspec, narrow=narrow, progress=progress)
    if stack is None:
        return None
    return stack, uspec, len(id_groups)
