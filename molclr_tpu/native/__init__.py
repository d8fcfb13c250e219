"""ctypes bindings for the native C++ featurizer.

The shared library is built on demand with g++ (no pybind11 in this
environment); the build is cached next to the source. Falls back cleanly
(native_available() == False) if no compiler is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "featurizer.cpp")
_LIB = os.path.join(_DIR, "libfeaturizer.so")
_lock = threading.Lock()
_lib = None
_tried = False

MAX_ATOMS = 1024
MAX_BONDS = 2048


def _build() -> bool:
    try:
        if (os.path.exists(_LIB)
                and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
            return True
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _build():
            return None
        lib = ctypes.CDLL(_LIB)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.mtpu_featurize.restype = ctypes.c_int
        lib.mtpu_featurize.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            i32p, i32p, i32p, i32p, i32p, i32p,
            i32p, i32p, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.mtpu_featurize_batch.restype = ctypes.c_int
        lib.mtpu_featurize_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int,
            i32p, i32p, i32p, i32p, i32p, i32p,
            i64p, i64p, i32p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        ]
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.mtpu_pack_batch.restype = ctypes.c_int
        lib.mtpu_pack_batch.argtypes = [
            i32p, i32p, i64p,                       # atoms + offsets
            i32p, i32p, i32p, i32p, i64p,           # edges + offsets
            ctypes.c_int32,                         # n_mols
            ctypes.c_int32, ctypes.c_int32,         # cap_nodes, cap_edges
            ctypes.c_int32, ctypes.c_int32,         # ell_slots, tile
            i32p, i32p, i32p, u8p,                  # node view
            i32p, i32p, i32p, i32p, i32p, u8p,      # edge view
            i32p, i32p, i32p, i32p, u8p,            # ELL view
            i32p, u8p,                              # bond view
            u8p, i32p, i32p,                        # graph view
            ctypes.c_int32,                         # cap_graphs
        ]
        lib.mtpu_pack_batch_indexed.restype = ctypes.c_int
        lib.mtpu_pack_batch_indexed.argtypes = [
            i32p, i32p, i64p,
            i32p, i32p, i32p, i32p, i64p,
            i32p, ctypes.c_int32,                   # mol_ids, n_mols
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            i32p, i32p, i32p, u8p,
            i32p, i32p, i32p, i32p, i32p, u8p,
            i32p, i32p, i32p, i32p, u8p,
            i32p, u8p,
            u8p, i32p, i32p,
            ctypes.c_int32,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def featurize_smiles_native(smiles: str, add_hs: bool = False):
    """Single-molecule native featurization -> MolGraph (None on failure)."""
    from molclr_tpu.data.featurize import MolGraph

    lib = _load()
    if lib is None:
        return None
    at = np.empty(MAX_ATOMS, np.int32)
    ch = np.empty(MAX_ATOMS, np.int32)
    es = np.empty(2 * MAX_BONDS, np.int32)
    ed = np.empty(2 * MAX_BONDS, np.int32)
    bt = np.empty(2 * MAX_BONDS, np.int32)
    bd = np.empty(2 * MAX_BONDS, np.int32)
    na = ctypes.c_int32(0)
    nb = ctypes.c_int32(0)

    def p(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    rc = lib.mtpu_featurize(
        smiles.encode(), int(add_hs), p(at), p(ch), p(es), p(ed), p(bt),
        p(bd), ctypes.byref(na), ctypes.byref(nb), MAX_ATOMS, MAX_BONDS)
    if rc != 0:
        return None
    n, m = na.value, nb.value
    return MolGraph(at[:n].copy(), ch[:n].copy(), es[: 2 * m].copy(),
                    ed[: 2 * m].copy(), bt[: 2 * m].copy(),
                    bd[: 2 * m].copy())


def featurize_corpus_native(smiles_list: list[str], add_hs: bool = False):
    """Batch featurization of a corpus via one native call.

    Returns (graphs, kept_indices) like loader.featurize_many."""
    from molclr_tpu.data.featurize import MolGraph

    lib = _load()
    if lib is None:
        return None
    buf = ("\n".join(smiles_list) + "\n").encode()
    n_mols = len(smiles_list)
    # Capacity scales with input size: one SMILES character >= one heavy
    # atom, AddHs at most ~3x atoms + the per-call MAX_ATOMS/MAX_BONDS
    # headroom the C++ side requires before each molecule. Undersizing is
    # detected below and retried, not silently dropped.
    per_mol = 4 if not add_hs else 8
    acap = max(1 << 16, per_mol * len(buf) + MAX_ATOMS)
    ecap = max(1 << 17, 2 * per_mol * len(buf) + 2 * MAX_BONDS)
    at = np.empty(acap, np.int32)
    ch = np.empty(acap, np.int32)
    es = np.empty(ecap, np.int32)
    ed = np.empty(ecap, np.int32)
    bt = np.empty(ecap, np.int32)
    bd = np.empty(ecap, np.int32)
    aoff = np.empty(n_mols + 1, np.int64)
    eoff = np.empty(n_mols + 1, np.int64)
    ok = np.empty(n_mols, np.int32)

    def p32(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    def p64(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    lib.mtpu_featurize_batch(
        buf, len(buf), int(add_hs), p32(at), p32(ch), p32(es), p32(ed),
        p32(bt), p32(bd), p64(aoff), p64(eoff), p32(ok),
        acap, ecap, n_mols)
    if (acap - aoff[n_mols] < MAX_ATOMS
            or ecap - eoff[n_mols] < 2 * MAX_BONDS):
        # possible capacity-exhaustion truncation (would be reported as
        # parse failures): fall back to the per-molecule API for full fidelity
        from molclr_tpu.data.featurize import MolGraph  # noqa: F401

        graphs, kept = [], []
        for i, s in enumerate(smiles_list):
            g = featurize_smiles_native(s, add_hs=add_hs)
            if g is not None:
                graphs.append(g)
                kept.append(i)
        return graphs, kept

    graphs, kept = [], []
    for i in range(n_mols):
        if not ok[i]:
            continue
        a0, a1 = aoff[i], aoff[i + 1]
        e0, e1 = eoff[i], eoff[i + 1]
        graphs.append(MolGraph(
            at[a0:a1].copy(), ch[a0:a1].copy(), es[e0:e1].copy(),
            ed[e0:e1].copy(), bt[e0:e1].copy(), bd[e0:e1].copy()))
        kept.append(i)
    return graphs, kept


def featurize_corpus_flat(smiles_list: list[str], add_hs: bool = False):
    """Batch featurization returning FLAT arrays (the on-disk corpus
    layout, data/corpus.py) instead of MolGraph objects:
    (nodes dict, edges dict, atom_counts, edge_counts) with failed parses
    dropped and molecule-local edge indices. None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    buf = ("\n".join(smiles_list) + "\n").encode()
    n_mols = len(smiles_list)
    per_mol = 4 if not add_hs else 8
    acap = max(1 << 16, per_mol * len(buf) + MAX_ATOMS)
    ecap = max(1 << 17, 2 * per_mol * len(buf) + 2 * MAX_BONDS)
    at = np.empty(acap, np.int32)
    ch = np.empty(acap, np.int32)
    es = np.empty(ecap, np.int32)
    ed = np.empty(ecap, np.int32)
    bt = np.empty(ecap, np.int32)
    bd = np.empty(ecap, np.int32)
    aoff = np.empty(n_mols + 1, np.int64)
    eoff = np.empty(n_mols + 1, np.int64)
    ok = np.empty(n_mols, np.int32)

    def p32(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    def p64(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    lib.mtpu_featurize_batch(
        buf, len(buf), int(add_hs), p32(at), p32(ch), p32(es), p32(ed),
        p32(bt), p32(bd), p64(aoff), p64(eoff), p32(ok),
        acap, ecap, n_mols)
    if (acap - aoff[n_mols] < MAX_ATOMS
            or ecap - eoff[n_mols] < 2 * MAX_BONDS):
        return None    # capacity exhaustion; caller falls back
    acnt = np.diff(aoff)
    ecnt = np.diff(eoff)
    keep = ok.astype(bool)
    # drop failed molecules' (empty) segments: gather kept slices
    node_keep = np.repeat(keep, acnt)
    edge_keep = np.repeat(keep, ecnt)
    nodes = {"atom_type": np.ascontiguousarray(at[: aoff[-1]][node_keep]),
             "chirality": np.ascontiguousarray(ch[: aoff[-1]][node_keep])}
    edges = {"edge_src": np.ascontiguousarray(es[: eoff[-1]][edge_keep]),
             "edge_dst": np.ascontiguousarray(ed[: eoff[-1]][edge_keep]),
             "bond_type": np.ascontiguousarray(bt[: eoff[-1]][edge_keep]),
             "bond_dir": np.ascontiguousarray(bd[: eoff[-1]][edge_keep])}
    return nodes, edges, acnt[keep], ecnt[keep]


def pack_batch_native(graphs, spec):
    """Native equivalent of data.graphs.pack_batch: pack featurized
    MolGraphs into one padded GraphBatch via one C call (~10x the Python
    per-molecule loop; exact parity pinned by tests/test_native.py).

    Returns a GraphBatch, or None if the native library is unavailable.
    Raises data.graphs.PackOverflow on capacity/degree overflow with the
    same semantics as the Python packer."""
    from molclr_tpu.data.graphs import GraphBatch, PackOverflow

    lib = _load()
    if lib is None:
        return None
    n_mols = len(graphs)
    at = np.ascontiguousarray(
        np.concatenate([g.atom_type for g in graphs])
        if n_mols else np.empty(0, np.int32), np.int32)
    ch = np.ascontiguousarray(
        np.concatenate([g.chirality for g in graphs])
        if n_mols else np.empty(0, np.int32), np.int32)
    es = np.ascontiguousarray(
        np.concatenate([g.edge_src for g in graphs])
        if n_mols else np.empty(0, np.int32), np.int32)
    ed = np.ascontiguousarray(
        np.concatenate([g.edge_dst for g in graphs])
        if n_mols else np.empty(0, np.int32), np.int32)
    bt = np.ascontiguousarray(
        np.concatenate([g.bond_type for g in graphs])
        if n_mols else np.empty(0, np.int32), np.int32)
    bd = np.ascontiguousarray(
        np.concatenate([g.bond_dir for g in graphs])
        if n_mols else np.empty(0, np.int32), np.int32)
    aoff = np.zeros(n_mols + 1, np.int64)
    eoff = np.zeros(n_mols + 1, np.int64)
    np.cumsum([g.n_atoms for g in graphs], out=aoff[1:])
    np.cumsum([g.edge_src.shape[0] for g in graphs], out=eoff[1:])

    N, E, G, K = spec.n_nodes, spec.n_edges, spec.n_graphs, spec.ell_slots
    B = spec.n_bonds
    o = {
        "atom_type": np.empty(N, np.int32),
        "chirality": np.empty(N, np.int32),
        "node_graph": np.empty(N, np.int32),
        "node_mask": np.empty(N, np.uint8),
        "src": np.empty(E, np.int32), "dst": np.empty(E, np.int32),
        "bond_type": np.empty(E, np.int32),
        "bond_dir": np.empty(E, np.int32),
        "edge_bond": np.empty(E, np.int32),
        "edge_mask": np.empty(E, np.uint8),
        "nbr": np.empty((N, K), np.int32),
        "nbr_bond_type": np.empty((N, K), np.int32),
        "nbr_bond_dir": np.empty((N, K), np.int32),
        "nbr_bond": np.empty((N, K), np.int32),
        "nbr_mask": np.empty((N, K), np.uint8),
        "bond_graph": np.empty(B, np.int32),
        "bond_mask": np.empty(B, np.uint8),
        "graph_mask": np.empty(G, np.uint8),
        "graph_n_nodes": np.empty(G, np.int32),
        "graph_n_bonds": np.empty(G, np.int32),
    }

    def p32(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    def p64(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    def pu8(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    rc = lib.mtpu_pack_batch(
        p32(at), p32(ch), p64(aoff), p32(es), p32(ed), p32(bt), p32(bd),
        p64(eoff), n_mols, N, E, K, spec.tile,
        p32(o["atom_type"]), p32(o["chirality"]), p32(o["node_graph"]),
        pu8(o["node_mask"]),
        p32(o["src"]), p32(o["dst"]), p32(o["bond_type"]),
        p32(o["bond_dir"]), p32(o["edge_bond"]), pu8(o["edge_mask"]),
        p32(o["nbr"]), p32(o["nbr_bond_type"]), p32(o["nbr_bond_dir"]),
        p32(o["nbr_bond"]), pu8(o["nbr_mask"]),
        p32(o["bond_graph"]), pu8(o["bond_mask"]),
        pu8(o["graph_mask"]), p32(o["graph_n_nodes"]),
        p32(o["graph_n_bonds"]), G)
    if rc != 0:
        if rc == -1:
            raise PackOverflow(
                f"node degree exceeds max_degree {spec.max_degree}")
        if rc == -2:
            return None  # spec too large for the native slot counter
        raise PackOverflow(
            f"molecule {rc - 1} overflows spec capacity {spec}")
    for k in ("node_mask", "edge_mask", "nbr_mask", "bond_mask",
              "graph_mask"):
        o[k] = o[k].astype(bool)
    return GraphBatch(**o)


def pack_superbatch_indexed(corpus, ids_mat, spec):
    """Pack an [S, B] matrix of corpus molecule ids into ONE stacked
    superbatch tree (a GraphBatch whose leaves carry a leading [S] batch
    axis) straight from the memory-mapped corpus buffers — zero Python
    objects per molecule, zero per-batch concatenation, zero np.stack.
    This is the streaming host hot path for corpora that exceed the HBM
    cache (train/pretrain.py _native_superbatches).

    Overflow recovery: the indexed packer reports the exact offending
    molecule, which is dropped from its batch and the batch repacked
    (same spirit as BatchIterator's drop-retry, but targeting the TRUE
    offender). Returns None if the native library is unavailable."""
    from molclr_tpu.data.graphs import GraphBatch, PackOverflow

    lib = _load()
    if lib is None:
        return None
    S, B = ids_mat.shape
    N, E, G, K = spec.n_nodes, spec.n_edges, spec.n_graphs, spec.ell_slots
    Bn = spec.n_bonds
    shapes = {
        "atom_type": (N, np.int32), "chirality": (N, np.int32),
        "node_graph": (N, np.int32), "node_mask": (N, np.uint8),
        "src": (E, np.int32), "dst": (E, np.int32),
        "bond_type": (E, np.int32), "bond_dir": (E, np.int32),
        "edge_bond": (E, np.int32), "edge_mask": (E, np.uint8),
        "nbr": ((N, K), np.int32), "nbr_bond_type": ((N, K), np.int32),
        "nbr_bond_dir": ((N, K), np.int32), "nbr_bond": ((N, K), np.int32),
        "nbr_mask": ((N, K), np.uint8),
        "bond_graph": (Bn, np.int32), "bond_mask": (Bn, np.uint8),
        "graph_mask": (G, np.uint8), "graph_n_nodes": (G, np.int32),
        "graph_n_bonds": (G, np.int32),
    }
    out = {k: np.empty((S,) + (s if isinstance(s, tuple) else (s,)), d)
           for k, (s, d) in shapes.items()}

    def p32(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    def p64(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    def pu8(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    c_at = p32(corpus._node["atom_type"])
    c_ch = p32(corpus._node["chirality"])
    c_es = p32(corpus._edge["edge_src"])
    c_ed = p32(corpus._edge["edge_dst"])
    c_bt = p32(corpus._edge["bond_type"])
    c_bd = p32(corpus._edge["bond_dir"])
    # the memmaps are contiguous; keep REFERENCES on the corpus object so
    # the pointers below cannot dangle
    c_ao = p64(corpus.aoff)
    c_eo = p64(corpus.eoff)

    for s in range(S):
        ids = np.ascontiguousarray(ids_mat[s], np.int32)
        while True:
            o = {k: out[k][s] for k in out}
            rc = lib.mtpu_pack_batch_indexed(
                c_at, c_ch, c_ao, c_es, c_ed, c_bt, c_bd, c_eo,
                p32(ids), len(ids), N, E, K, spec.tile,
                p32(o["atom_type"]), p32(o["chirality"]),
                p32(o["node_graph"]), pu8(o["node_mask"]),
                p32(o["src"]), p32(o["dst"]), p32(o["bond_type"]),
                p32(o["bond_dir"]), p32(o["edge_bond"]),
                pu8(o["edge_mask"]),
                p32(o["nbr"]), p32(o["nbr_bond_type"]),
                p32(o["nbr_bond_dir"]), p32(o["nbr_bond"]),
                pu8(o["nbr_mask"]),
                p32(o["bond_graph"]), pu8(o["bond_mask"]),
                pu8(o["graph_mask"]), p32(o["graph_n_nodes"]),
                p32(o["graph_n_bonds"]), G)
            if rc == 0:
                break
            if rc == -1:
                raise PackOverflow(
                    f"node degree exceeds max_degree {spec.max_degree}")
            if rc == -2:
                return None
            # rc-1 is the exact offending molecule: drop it and repack
            ids = np.ascontiguousarray(np.delete(ids, rc - 1), np.int32)
            import warnings

            warnings.warn(
                f"PackOverflow: dropped molecule from streaming batch "
                f"(spec {spec})", stacklevel=2)
    for k in ("node_mask", "edge_mask", "nbr_mask", "bond_mask",
              "graph_mask"):
        out[k] = out[k].view(bool)
    return GraphBatch(**out)


def pack_unit_stack_indexed(corpus, id_groups, spec, narrow=None,
                            chunk=2048, progress=None):
    """Pack RAGGED per-unit molecule-id groups into a [U, ...] stacked
    dict straight from the memory-mapped corpus buffers — the corpus-
    scale tile-unit packer (data/regroup.pack_unit_stack materializes a
    Python MolGraph per molecule; at PubChem-10M that alone is minutes,
    while this is one C call per unit on mmap'd buffers).

    id_groups: list of int32 arrays of corpus molecule ids (one group =
    one unit; variable length <= spec.n_graphs). narrow: optional
    {field: np.dtype} wire map — units are packed full-width into a
    [chunk, ...] scratch and astype'd into the narrow output per chunk,
    so host RAM holds the narrow stack plus one scratch chunk. Returns
    {field: np.ndarray[U, ...]} (masks uint8 under `narrow`, bool
    otherwise), or None if the native library is unavailable."""
    from molclr_tpu.data.graphs import PackOverflow

    lib = _load()
    if lib is None:
        return None
    U = len(id_groups)
    N, E, G, K = spec.n_nodes, spec.n_edges, spec.n_graphs, spec.ell_slots
    Bn = spec.n_bonds
    shapes = {
        "atom_type": (N, np.int32), "chirality": (N, np.int32),
        "node_graph": (N, np.int32), "node_mask": (N, np.uint8),
        "src": (E, np.int32), "dst": (E, np.int32),
        "bond_type": (E, np.int32), "bond_dir": (E, np.int32),
        "edge_bond": (E, np.int32), "edge_mask": (E, np.uint8),
        "nbr": ((N, K), np.int32), "nbr_bond_type": ((N, K), np.int32),
        "nbr_bond_dir": ((N, K), np.int32), "nbr_bond": ((N, K), np.int32),
        "nbr_mask": ((N, K), np.uint8),
        "bond_graph": (Bn, np.int32), "bond_mask": (Bn, np.uint8),
        "graph_mask": (G, np.uint8), "graph_n_nodes": (G, np.int32),
        "graph_n_bonds": (G, np.int32),
    }

    def shp(s):
        return s if isinstance(s, tuple) else (s,)

    out = {k: np.empty((U,) + shp(s),
                       (narrow[k] if narrow else d))
           for k, (s, d) in shapes.items()}
    c = min(chunk, U)
    scratch = {k: np.empty((c,) + shp(s), d) for k, (s, d) in shapes.items()}

    def p32(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    def p64(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    def pu8(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    c_at = p32(corpus._node["atom_type"])
    c_ch = p32(corpus._node["chirality"])
    c_es = p32(corpus._edge["edge_src"])
    c_ed = p32(corpus._edge["edge_dst"])
    c_bt = p32(corpus._edge["bond_type"])
    c_bd = p32(corpus._edge["bond_dir"])
    c_ao = p64(corpus.aoff)
    c_eo = p64(corpus.eoff)

    n_dropped = 0
    for lo in range(0, U, c):
        hi = min(lo + c, U)
        for u in range(lo, hi):
            ids = np.ascontiguousarray(id_groups[u], np.int32)
            s = u - lo
            while True:
                o = {k: scratch[k][s] for k in scratch}
                rc = lib.mtpu_pack_batch_indexed(
                    c_at, c_ch, c_ao, c_es, c_ed, c_bt, c_bd, c_eo,
                    p32(ids), len(ids), N, E, K, spec.tile,
                    p32(o["atom_type"]), p32(o["chirality"]),
                    p32(o["node_graph"]), pu8(o["node_mask"]),
                    p32(o["src"]), p32(o["dst"]), p32(o["bond_type"]),
                    p32(o["bond_dir"]), p32(o["edge_bond"]),
                    pu8(o["edge_mask"]),
                    p32(o["nbr"]), p32(o["nbr_bond_type"]),
                    p32(o["nbr_bond_dir"]), p32(o["nbr_bond"]),
                    pu8(o["nbr_mask"]),
                    p32(o["bond_graph"]), pu8(o["bond_mask"]),
                    pu8(o["graph_mask"]), p32(o["graph_n_nodes"]),
                    p32(o["graph_n_bonds"]), G)
                if rc == 0:
                    break
                if rc == -1:
                    raise PackOverflow(
                        f"node degree exceeds max_degree "
                        f"{spec.max_degree}")
                if rc == -2:
                    return None
                # rc-1 is the exact offending molecule: drop and repack
                ids = np.ascontiguousarray(np.delete(ids, rc - 1),
                                           np.int32)
                n_dropped += 1
        for k in out:
            out[k][lo:hi] = scratch[k][: hi - lo]
        if progress is not None:
            progress(hi, U)
    if n_dropped:
        import warnings

        warnings.warn(
            f"PackOverflow: dropped {n_dropped} molecule(s) while "
            f"packing the unit stack (spec {spec})", stacklevel=2)
    if not narrow:
        for k in ("node_mask", "edge_mask", "nbr_mask", "bond_mask",
                  "graph_mask"):
            out[k] = out[k].view(bool)
    return out
