"""Flat-packed, statically-shaped batched molecular graphs.

This is the framework's replacement for PyG `Data`/`Batch` (used by the
reference at dataset/dataset.py:17,132) — redesigned for XLA: every batch of B
molecules is packed into ONE padded graph with static shapes, so a training
step compiles once per PadSpec bucket.

Two adjacency views are carried:

  COO  (`src/dst/bond_type/bond_dir/edge_mask` over [n_edges])
       featurization-parity view; bond k of molecule g occupies directed rows
       2k/2k+1 (+ offset), mirroring the reference layout
       (dataset/dataset.py:93-106).

  ELL  (`nbr*` over [n_nodes, K]) the TPU-native aggregation view: per-node
       padded neighbor lists. Slot 0 is the self-loop the reference models add
       per conv layer (models/ginet_molclr.py:31-37; bond type 4, dir 0).
       Neighborhood aggregation becomes K static row-gathers + a masked sum —
       no scatter — which vectorizes on the VPU and feeds the MXU-friendly
       dense update MLPs. `nbr_bond` holds the undirected bond id so on-device
       bond-deletion augmentation can kill both directions of a bond with one
       boolean table lookup; self-loop/padding slots point at a sentinel bond
       id (`n_bonds`) that augmentations never delete.

Padding contract:
  - padded nodes: atom_type 0, node_mask False, node_graph 0 (consumers mask
    features before pooling);
  - padded edges: src/dst 0, edge_mask False;
  - padded graphs: graph_mask False, graph_n_nodes 0.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from flax import struct

from molclr_tpu.data.featurize import MolGraph, SELF_LOOP_BOND_TYPE


@dataclass(frozen=True)
class PadSpec:
    """Static bucket shape. K = max_degree + 1 ELL slots (slot 0 = self).

    tile > 0 requests TILE-ALIGNED packing: no molecule crosses a
    `tile`-node boundary (n_nodes must then be a multiple of tile). This is
    the precondition of the tile-dense aggregation path (ops/tile_dense.py),
    which turns neighborhood aggregation into block-diagonal [T, tile, tile]
    adjacency matmuls on the MXU instead of HBM row-gathers."""

    n_graphs: int
    n_nodes: int
    n_edges: int       # directed edge capacity (2x bond capacity)
    max_degree: int = 6
    tile: int = 0
    # Upper bound on undirected bonds in any single molecule (a corpus
    # statistic like max_degree, set by spec_for_graphs; 0 = unknown).
    # Enables the sort-free windowed bond ranking in data/augment.py:
    # per-molecule bonds are contiguous, so each bond only compares keys
    # against this many successors of its graph's first bond.
    max_graph_bonds: int = 0

    def __post_init__(self):
        if self.tile:
            if self.n_nodes % self.tile:
                raise ValueError(
                    f"n_nodes {self.n_nodes} not a multiple of tile "
                    f"{self.tile}")

    @property
    def n_bonds(self) -> int:
        return self.n_edges // 2

    @property
    def ell_slots(self) -> int:
        return self.max_degree + 1


@struct.dataclass
class GraphBatch:
    """Pytree of numpy/jax arrays; usable directly inside jit."""

    # node view [n_nodes]
    atom_type: np.ndarray      # int32
    chirality: np.ndarray      # int32
    node_graph: np.ndarray     # int32, graph id per node
    node_mask: np.ndarray      # bool

    # COO edge view [n_edges]
    src: np.ndarray            # int32
    dst: np.ndarray            # int32
    bond_type: np.ndarray      # int32
    bond_dir: np.ndarray       # int32
    edge_bond: np.ndarray      # int32, undirected bond id (sentinel n_bonds)
    edge_mask: np.ndarray      # bool

    # ELL view [n_nodes, K]
    nbr: np.ndarray            # int32, neighbor node index (self at slot 0)
    nbr_bond_type: np.ndarray  # int32
    nbr_bond_dir: np.ndarray   # int32
    nbr_bond: np.ndarray       # int32, undirected bond id
    nbr_mask: np.ndarray       # bool

    # undirected bond view [n_bonds] (for on-device bond-level augmentation)
    bond_graph: np.ndarray     # int32, graph id per bond
    bond_mask: np.ndarray      # bool

    # graph view [n_graphs]
    graph_mask: np.ndarray     # bool
    graph_n_nodes: np.ndarray  # int32 (real atoms per graph)
    graph_n_bonds: np.ndarray  # int32 (real undirected bonds per graph)

    @property
    def num_nodes(self) -> int:
        return self.atom_type.shape[-1]

    @property
    def num_edges(self) -> int:
        return self.src.shape[-1]

    @property
    def num_graphs(self) -> int:
        return self.graph_mask.shape[-1]

    @property
    def num_bonds(self) -> int:
        return self.num_edges // 2


class PackOverflow(ValueError):
    pass


def concat_shards(batches: list) -> GraphBatch:
    """Concatenate S same-shape GraphBatches into ONE packed batch with
    globally-renumbered node/graph/bond ids — jit-compatible pure array
    ops. Equal-size segments make the result shardable across a device
    mesh with a plain PartitionSpec on every array's leading axis (the
    edge-partition layout, parallel/partition.py); the tile contract keeps
    every segment self-contained, so localize_shard can recover the exact
    original sub-batch on-device."""
    import jax.numpy as jnp

    a = batches[0]
    n, g, s = a.num_nodes, a.num_graphs, len(batches)
    bmax = a.num_bonds

    def shift_bond(x, i):
        # preserve the sentinel-bond-id invariant: the per-shard sentinel
        # (== per-shard n_bonds) must map to the CONCATENATED sentinel
        # s*bmax, never to a real bond of another shard
        return jnp.where(x == bmax, s * bmax, x + i * bmax)

    def cat(field, shift=None):
        xs = [getattr(b, field) for b in batches]
        if shift is not None:
            xs = [x + i * shift for i, x in enumerate(xs)]
        return jnp.concatenate(xs)

    return GraphBatch(
        atom_type=cat("atom_type"),
        chirality=cat("chirality"),
        node_graph=cat("node_graph", g),
        node_mask=cat("node_mask"),
        src=cat("src", n),
        dst=cat("dst", n),
        bond_type=cat("bond_type"),
        bond_dir=cat("bond_dir"),
        edge_bond=jnp.concatenate(
            [shift_bond(b.edge_bond, i) for i, b in enumerate(batches)]),
        edge_mask=cat("edge_mask"),
        nbr=cat("nbr", n),
        nbr_bond_type=cat("nbr_bond_type"),
        nbr_bond_dir=cat("nbr_bond_dir"),
        nbr_bond=jnp.concatenate(
            [shift_bond(b.nbr_bond, i) for i, b in enumerate(batches)]),
        nbr_mask=cat("nbr_mask"),
        bond_graph=cat("bond_graph", g),
        bond_mask=cat("bond_mask"),
        graph_mask=cat("graph_mask"),
        graph_n_nodes=cat("graph_n_nodes"),
        graph_n_bonds=cat("graph_n_bonds"),
    )


def concat_views(a: GraphBatch, b: GraphBatch) -> GraphBatch:
    """Concatenate two same-shape GraphBatches (e.g. the two contrastive
    views) into one packed batch — jit-compatible pure array ops.

    This is the standard SimCLR execution shape: both views run through the
    encoder in ONE forward, so BatchNorm statistics span both views and
    per-pass fixed costs are paid once. (The reference runs views
    sequentially, molclr.py:57-60 — a code-structure artifact, not a
    modeling choice; set pretrain config concat_views=False to reproduce
    its sequential-BN semantics.)"""
    return concat_shards([a, b])


def pack_batch(graphs: list[MolGraph], spec: PadSpec,
               prefer_native: bool = True) -> GraphBatch:
    """Pack molecules into one padded GraphBatch.

    Raises PackOverflow if the molecules exceed the bucket's node/edge/graph
    capacity or a node exceeds max_degree (callers pre-filter via
    MolGraph.max_degree; PubChem organic molecules rarely exceed degree 6).

    Uses the native C packer when available (~10x; exact parity pinned by
    tests/test_native.py); prefer_native=False forces this Python
    implementation (the semantic source of truth)."""
    if spec.max_graph_bonds:
        worst = max((g.edge_src.shape[0] // 2 for g in graphs), default=0)
        if worst > spec.max_graph_bonds:
            raise PackOverflow(
                f"a molecule has {worst} bonds > spec.max_graph_bonds "
                f"{spec.max_graph_bonds} (the windowed bond-ranking bound)")
    if prefer_native and graphs:
        from molclr_tpu import native

        if native.native_available():
            out = native.pack_batch_native(graphs, spec)
            if out is not None:
                return out
    if len(graphs) > spec.n_graphs:
        raise PackOverflow(f"{len(graphs)} graphs > capacity {spec.n_graphs}")
    total_nodes = sum(g.n_atoms for g in graphs)
    total_edges = sum(g.edge_src.shape[0] for g in graphs)
    if total_nodes > spec.n_nodes:
        raise PackOverflow(f"{total_nodes} nodes > capacity {spec.n_nodes}")
    if total_edges > spec.n_edges:
        raise PackOverflow(f"{total_edges} edges > capacity {spec.n_edges}")

    N, E, G, K = spec.n_nodes, spec.n_edges, spec.n_graphs, spec.ell_slots
    B = spec.n_bonds

    atom_type = np.zeros(N, np.int32)
    chirality = np.zeros(N, np.int32)
    node_graph = np.zeros(N, np.int32)
    node_mask = np.zeros(N, bool)

    src = np.zeros(E, np.int32)
    dst = np.zeros(E, np.int32)
    bond_type = np.zeros(E, np.int32)
    bond_dir = np.zeros(E, np.int32)
    edge_bond = np.full(E, B, np.int32)
    edge_mask = np.zeros(E, bool)

    nbr = np.zeros((N, K), np.int32)
    nbr_bt = np.zeros((N, K), np.int32)
    nbr_bd = np.zeros((N, K), np.int32)
    nbr_bond = np.full((N, K), B, np.int32)
    nbr_mask = np.zeros((N, K), bool)

    bond_graph = np.zeros(B, np.int32)
    bond_mask = np.zeros(B, bool)

    graph_mask = np.zeros(G, bool)
    graph_n_nodes = np.zeros(G, np.int32)
    graph_n_bonds = np.zeros(G, np.int32)

    node_off = 0
    edge_off = 0
    bond_off = 0
    for gi, g in enumerate(graphs):
        n, e = g.n_atoms, g.edge_src.shape[0]
        if spec.tile:
            if n > spec.tile:
                raise PackOverflow(
                    f"molecule with {n} atoms exceeds tile {spec.tile}")
            used = node_off % spec.tile
            if used and used + n > spec.tile:
                node_off += spec.tile - used    # skip to next tile boundary
            if node_off + n > N:
                raise PackOverflow(
                    f"tile-aligned packing overflows {N} node slots at "
                    f"graph {gi}")
        sl_n = slice(node_off, node_off + n)
        atom_type[sl_n] = g.atom_type
        chirality[sl_n] = g.chirality
        node_graph[sl_n] = gi
        node_mask[sl_n] = True

        sl_e = slice(edge_off, edge_off + e)
        src[sl_e] = g.edge_src + node_off
        dst[sl_e] = g.edge_dst + node_off
        bond_type[sl_e] = g.bond_type
        bond_dir[sl_e] = g.bond_dir
        edge_bond[sl_e] = bond_off + np.arange(e, dtype=np.int32) // 2
        edge_mask[sl_e] = True

        # ELL: slot 0 self-loop, then in-edges in featurization order.
        nbr[sl_n, 0] = np.arange(node_off, node_off + n, dtype=np.int32)
        nbr_bt[sl_n, 0] = SELF_LOOP_BOND_TYPE
        nbr_bd[sl_n, 0] = 0
        nbr_mask[sl_n, 0] = True
        if e:
            # vectorized slot assignment: stable-sort edges by destination;
            # within each destination run, the slot is the offset from the
            # run start (+1 for the self-loop in slot 0)
            order = np.argsort(g.edge_dst, kind="stable")
            dst_sorted = g.edge_dst[order]
            run_start = np.r_[0, np.flatnonzero(np.diff(dst_sorted)) + 1]
            starts = np.repeat(run_start, np.diff(np.r_[run_start, e]))
            slots = np.arange(e, dtype=np.int32) - starts + 1
            if slots.max() >= K:
                raise PackOverflow(
                    f"node degree {int(slots.max())} exceeds max_degree "
                    f"{spec.max_degree} in graph {gi}")
            rows = node_off + dst_sorted
            nbr[rows, slots] = node_off + g.edge_src[order]
            nbr_bt[rows, slots] = g.bond_type[order]
            nbr_bd[rows, slots] = g.bond_dir[order]
            nbr_bond[rows, slots] = bond_off + order // 2
            nbr_mask[rows, slots] = True

        bond_graph[bond_off : bond_off + e // 2] = gi
        bond_mask[bond_off : bond_off + e // 2] = True

        graph_mask[gi] = True
        graph_n_nodes[gi] = n
        graph_n_bonds[gi] = e // 2
        node_off += n
        edge_off += e
        bond_off += e // 2

    return GraphBatch(
        atom_type=atom_type, chirality=chirality, node_graph=node_graph,
        node_mask=node_mask,
        src=src, dst=dst, bond_type=bond_type, bond_dir=bond_dir,
        edge_bond=edge_bond, edge_mask=edge_mask,
        nbr=nbr, nbr_bond_type=nbr_bt, nbr_bond_dir=nbr_bd,
        nbr_bond=nbr_bond, nbr_mask=nbr_mask,
        bond_graph=bond_graph, bond_mask=bond_mask,
        graph_mask=graph_mask, graph_n_nodes=graph_n_nodes,
        graph_n_bonds=graph_n_bonds,
    )
