"""Tests for on-device augmentations: exact reference counts, paired bond
deletion, BFS connectivity, mix top-up totals."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molclr_tpu.data import (
    MASK_ATOM_TYPE,
    PadSpec,
    featurize_smiles,
    pack_batch,
)
from molclr_tpu.data.augment import (
    mix_augment,
    node_augment,
    paired_augment,
    subgraph_augment,
)

SMILES = ["CC(=O)Oc1ccccc1C(=O)O", "CCCCCCCCCCCC", "c1ccc2ccccc2c1",
          "CN1CCC[C@H]1c1cccnc1", "C"]
SPEC = PadSpec(n_graphs=6, n_nodes=96, n_edges=224, max_degree=6)


def make_batch():
    return pack_batch([featurize_smiles(s) for s in SMILES], SPEC)


def per_graph_masked_atoms(orig, aug):
    out = []
    for gi in range(orig.num_graphs):
        sel = (orig.node_graph == gi) & orig.node_mask
        masked = (np.asarray(aug.atom_type)[sel] == MASK_ATOM_TYPE) & (
            np.asarray(orig.atom_type)[sel] != MASK_ATOM_TYPE)
        out.append(int(masked.sum()))
    return out


def per_graph_dropped_bonds(orig, aug):
    out = []
    em = np.asarray(aug.edge_mask)
    for gi in range(orig.num_graphs):
        sel = np.asarray(orig.bond_graph == gi) & np.asarray(orig.bond_mask)
        ids = np.nonzero(sel)[0]
        dropped = 0
        for b in ids:
            rows = np.nonzero(np.asarray(orig.edge_bond) == b)[0]
            alive = em[rows]
            assert alive[0] == alive[1], "directions must drop together"
            dropped += int(not alive[0])
        out.append(dropped)
    return out


class TestNodeAug:
    def test_exact_counts(self):
        batch = make_batch()
        aug = node_augment(batch, jax.random.PRNGKey(0))
        n_atoms = [g for g in batch.graph_n_nodes[:5]]
        n_bonds = [g for g in batch.graph_n_bonds[:5]]
        expect_atoms = [max(1, int(0.25 * n)) for n in n_atoms]
        expect_bonds = [int(0.25 * m) for m in n_bonds]
        assert per_graph_masked_atoms(batch, aug)[:5] == expect_atoms
        assert per_graph_dropped_bonds(batch, aug)[:5] == expect_bonds

    def test_ell_coo_consistency(self):
        batch = make_batch()
        aug = node_augment(batch, jax.random.PRNGKey(1))
        # every dropped bond is dead in BOTH views; self-loops all alive
        drop = {int(b) for b in np.asarray(batch.edge_bond)[
            np.asarray(batch.edge_mask) & ~np.asarray(aug.edge_mask)]}
        nbr_alive = np.asarray(aug.nbr_mask)
        nbr_bond = np.asarray(batch.nbr_bond)
        for n in range(batch.num_nodes):
            for k in range(nbr_bond.shape[1]):
                if batch.nbr_mask[n, k]:
                    expect = int(nbr_bond[n, k]) not in drop
                    assert bool(nbr_alive[n, k]) == expect
        assert np.asarray(aug.nbr_mask)[batch.node_mask, 0].all()

    def test_padding_untouched(self):
        batch = make_batch()
        aug = node_augment(batch, jax.random.PRNGKey(2))
        pad = ~np.asarray(batch.node_mask)
        assert (np.asarray(aug.atom_type)[pad] ==
                np.asarray(batch.atom_type)[pad]).all()
        assert not np.asarray(aug.edge_mask)[~np.asarray(batch.edge_mask)].any()

    def test_deterministic(self):
        batch = make_batch()
        a1 = node_augment(batch, jax.random.PRNGKey(7))
        a2 = node_augment(batch, jax.random.PRNGKey(7))
        assert (np.asarray(a1.atom_type) == np.asarray(a2.atom_type)).all()
        a3 = node_augment(batch, jax.random.PRNGKey(8))
        assert (np.asarray(a1.atom_type) != np.asarray(a3.atom_type)).any()


class TestSubgraphAug:
    def test_counts_and_connectivity(self):
        batch = make_batch()
        aug = subgraph_augment(batch, jax.random.PRNGKey(3))
        counts = per_graph_masked_atoms(batch, aug)
        for gi in range(5):
            n = int(batch.graph_n_nodes[gi])
            assert counts[gi] == int(0.25 * n), (gi, counts)
        # removed set is connected within each graph (wave-BFS property)
        masked = ((np.asarray(aug.atom_type) == MASK_ATOM_TYPE)
                  & np.asarray(batch.node_mask))
        for gi in range(5):
            nodes = set(np.nonzero(masked & (batch.node_graph == gi))[0])
            if len(nodes) <= 1:
                continue
            # BFS inside removed set over original bonds
            adj = {n: set() for n in nodes}
            for e in range(batch.num_edges):
                if batch.edge_mask[e]:
                    s, d = int(batch.src[e]), int(batch.dst[e])
                    if s in nodes and d in nodes:
                        adj[s].add(d)
            seen = {next(iter(nodes))}
            frontier = list(seen)
            while frontier:
                nxt = []
                for u in frontier:
                    for v in adj[u]:
                        if v not in seen:
                            seen.add(v)
                            nxt.append(v)
                frontier = nxt
            assert seen == nodes, f"graph {gi} removed set not connected"

    def test_removed_bonds_dropped(self):
        batch = make_batch()
        aug = subgraph_augment(batch, jax.random.PRNGKey(4))
        masked = ((np.asarray(aug.atom_type) == MASK_ATOM_TYPE)
                  & np.asarray(batch.node_mask))
        em = np.asarray(aug.edge_mask)
        for e in range(batch.num_edges):
            if batch.edge_mask[e]:
                touches = masked[int(batch.src[e])] or masked[int(batch.dst[e])]
                assert em[e] == (not touches)

    def test_paired_distinct_starts(self):
        batch = make_batch()
        vi, vj = paired_augment(batch, jax.random.PRNGKey(5), "subgraph")
        mi = ((np.asarray(vi.atom_type) == MASK_ATOM_TYPE)
              & np.asarray(batch.node_mask))
        mj = ((np.asarray(vj.atom_type) == MASK_ATOM_TYPE)
              & np.asarray(batch.node_mask))
        # the dodecane chain (graph 1, 12 atoms, 3 removed each view):
        # views should not be identical in general
        assert (mi != mj).any()


class TestMixAug:
    def test_totals(self):
        batch = make_batch()
        aug = mix_augment(batch, jax.random.PRNGKey(6))
        atoms = per_graph_masked_atoms(batch, aug)
        bonds_alive = []
        em = np.asarray(aug.edge_mask)
        for gi in range(5):
            sel = np.asarray(batch.bond_graph == gi) & np.asarray(
                batch.bond_mask)
            ids = np.nonzero(sel)[0]
            alive = sum(int(em[np.asarray(batch.edge_bond) == b][0])
                        for b in ids)
            bonds_alive.append(alive)
        for gi in range(5):
            n = int(batch.graph_n_nodes[gi])
            m = int(batch.graph_n_bonds[gi])
            assert atoms[gi] == int(0.25 * n), (gi, atoms)
            assert bonds_alive[gi] <= int(np.ceil(0.75 * m)), (gi, bonds_alive)

    def test_jit_cache(self):
        """Repeated calls with same shapes reuse the compiled kernel."""
        batch = make_batch()
        for seed in range(3):
            mix_augment(batch, jax.random.PRNGKey(seed))


class TestPaired:
    @pytest.mark.parametrize("kind", ["node", "subgraph", "mix"])
    def test_views_differ(self, kind):
        batch = make_batch()
        vi, vj = paired_augment(batch, jax.random.PRNGKey(9), kind)
        assert ((np.asarray(vi.atom_type) != np.asarray(vj.atom_type)).any()
                or (np.asarray(vi.edge_mask) != np.asarray(vj.edge_mask)).any())


class TestTiledEllConsistency:
    """The gather-free tiled ELL updates (lex thresholds, slot-space
    endpoint drops, _flag_at_nbr_tile) must agree EXACTLY with the COO
    edge view, which keeps the legacy keep-table gathers — for every
    augmentation kind and across seeds."""

    def _tiled_batch(self):
        spec = PadSpec(n_graphs=6, n_nodes=128, n_edges=224, max_degree=6,
                       tile=32, max_graph_bonds=16)
        return pack_batch([featurize_smiles(s) for s in SMILES], spec)

    @pytest.mark.parametrize("kind", ["node", "subgraph", "mix"])
    def test_ell_matches_coo(self, kind):
        batch = self._tiled_batch()
        for seed in (0, 1, 2, 3):
            vi, vj = paired_augment(batch, jax.random.PRNGKey(seed), kind,
                                    tile=32, bond_window=16)
            for aug in (vi, vj):
                dead = {int(b) for b in np.asarray(batch.edge_bond)[
                    np.asarray(batch.edge_mask)
                    & ~np.asarray(aug.edge_mask)]}
                nbr_alive = np.asarray(aug.nbr_mask)
                nbr_bond = np.asarray(batch.nbr_bond)
                nm = np.asarray(batch.nbr_mask)
                for n in range(batch.num_nodes):
                    for k in range(nbr_bond.shape[1]):
                        if nm[n, k]:
                            expect = int(nbr_bond[n, k]) not in dead
                            assert bool(nbr_alive[n, k]) == expect, \
                                (kind, seed, n, k)
                # self-loop slots always survive
                assert nbr_alive[np.asarray(batch.node_mask), 0].all()

    def test_flag_at_nbr_tile_matches_gather(self):
        from molclr_tpu.data.augment import _flag_at_nbr_tile

        batch = self._tiled_batch()
        rng = np.random.RandomState(0)
        flag = jnp.asarray(rng.rand(batch.num_nodes) < 0.3)
        out = _flag_at_nbr_tile(flag, batch.nbr, 32)
        ref = jnp.take(flag.astype(jnp.int32), batch.nbr, axis=0) > 0
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestWindowedBondRanks:
    """The sort-free windowed bond ranking (_segment_ranks_window) must be
    bit-identical to the lexsort ranking on every valid row, and the
    augmentations must be draw-for-draw identical with it on or off."""

    def test_rank_parity_random_segments(self):
        from molclr_tpu.data.augment import (
            _segment_ranks,
            _segment_ranks_window,
        )

        rng = np.random.RandomState(3)
        for trial in range(5):
            counts = rng.randint(0, 9, size=7).astype(np.int32)
            n = int(counts.sum()) + rng.randint(0, 5)  # tail padding
            seg = np.zeros(n, np.int32)
            valid = np.zeros(n, bool)
            pos = 0
            for g, c in enumerate(counts):
                seg[pos:pos + c] = g
                valid[pos:pos + c] = True
                pos += c
            key = rng.randint(0, 50, size=n).astype(np.int32)  # many ties
            ref = np.asarray(_segment_ranks(
                jax.numpy.asarray(key), jax.numpy.asarray(seg),
                jax.numpy.asarray(valid), jax.numpy.asarray(counts)))
            win = np.asarray(_segment_ranks_window(
                jax.numpy.asarray(key), jax.numpy.asarray(seg),
                jax.numpy.asarray(valid), jax.numpy.asarray(counts),
                window=int(counts.max()) if counts.max() else 1))
            np.testing.assert_array_equal(ref[valid], win[valid],
                                          err_msg=f"trial {trial}")

    @pytest.mark.parametrize("kind", ["node", "mix"])
    def test_augment_identical_with_window(self, kind):
        batch = make_batch()
        w = int(max(batch.graph_n_bonds))
        key = jax.random.PRNGKey(11)
        a0 = paired_augment(batch, key, kind, bond_window=0)
        a1 = paired_augment(batch, key, kind, bond_window=w)
        for v0, v1 in zip(a0, a1):
            for f in ("atom_type", "chirality", "edge_mask", "nbr_mask"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(v0, f)), np.asarray(getattr(v1, f)),
                    err_msg=f"{kind}/{f}")

    def test_pack_rejects_overlarge_molecule(self):
        from molclr_tpu.data.graphs import PackOverflow

        gs = [featurize_smiles(s) for s in SMILES]
        spec = PadSpec(n_graphs=6, n_nodes=96, n_edges=224, max_degree=6,
                       max_graph_bonds=3)  # aspirin has 13 bonds
        with pytest.raises(PackOverflow):
            pack_batch(gs, spec)


class TestBfsStride:
    """Log-doubling wave stride (_bfs_times stride > 1): exact wave times
    and augmented outputs must be BIT-IDENTICAL to single-wave stepping,
    including long chains (times crossing stride boundaries) and
    disconnected components (unreached nodes stay at infinity)."""

    STRESS = ["C" * 25,                      # 24-wave path graph
              "CC(=O)[O-].[Na+]",           # disconnected salt
              "CC(=O)Oc1ccccc1C(=O)O",
              "C1CCCCC1CCCCCCCCCC",
              "CCO", "c1ccc2ccccc2c1"]

    def _batch(self, tile=32):
        from molclr_tpu.data.loader import spec_for_graphs

        gs = [featurize_smiles(s) for s in self.STRESS]
        spec = spec_for_graphs(gs, len(gs), tile=tile, sizing="max")
        return pack_batch(gs, spec), spec

    @pytest.mark.parametrize("stride", [2, 4, 8, 32])
    def test_times_bit_identical(self, stride):
        from molclr_tpu.data.augment import _bfs_times, _node_ranks

        batch, _ = self._batch()
        rank = _node_ranks(batch, jax.random.randint(
            jax.random.PRNGKey(5), (batch.num_nodes,), 0, 1 << 20,
            dtype=jnp.int32), 32)
        starts = jnp.stack([batch.node_mask & (rank == 0),
                            batch.node_mask & (rank == 1)], axis=1)
        t1 = _bfs_times(batch, starts, 32, tile=32, stride=1)
        ts = _bfs_times(batch, starts, 32, tile=32, stride=stride)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(ts))
        # the 24-atom chain must contain times past any stride boundary
        assert int(np.asarray(t1)[np.asarray(batch.node_mask)].max()) > 8

    @pytest.mark.parametrize("kind", ["subgraph", "mix"])
    def test_augment_outputs_bit_identical(self, kind):
        from molclr_tpu.data.augment import paired_augment

        batch, spec = self._batch()
        rng = jax.random.PRNGKey(31)
        w = spec.max_graph_bonds
        base = paired_augment(batch, rng, kind, tile=32, bond_window=w,
                              bfs_stride=1)
        fast = paired_augment(batch, rng, kind, tile=32, bond_window=w,
                              bfs_stride=8)
        for a, b in zip(base, fast):
            for f in ("atom_type", "chirality", "edge_mask", "nbr_mask"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
                    err_msg=f"{kind} {f}")


class TestPairedBatchedBfs:
    """paired_augment's batched two-view BFS (one [T, tile, 2] wave sweep)
    must be bit-identical to two sequential single-view calls with
    start_rank_slot 0/1 sharing start_rng."""

    FIELDS = ("atom_type", "chirality", "edge_mask", "nbr_mask")

    @pytest.mark.parametrize("tile", [0, 32])
    @pytest.mark.parametrize("kind", ["subgraph", "mix"])
    def test_paired_matches_sequential(self, kind, tile):
        from molclr_tpu.data.augment import (paired_mix_augment,
                                             paired_subgraph_augment)
        from molclr_tpu.data.loader import spec_for_graphs

        gs = [featurize_smiles(s) for s in SMILES]
        spec = spec_for_graphs(gs, len(gs), tile=tile, sizing="max")
        batch = pack_batch(gs, spec)
        w = spec.max_graph_bonds
        ri, rj, rs = jax.random.split(jax.random.PRNGKey(13), 3)
        if kind == "subgraph":
            seq = (subgraph_augment(batch, ri, start_rank_slot=0,
                                    start_rng=rs, tile=tile),
                   subgraph_augment(batch, rj, start_rank_slot=1,
                                    start_rng=rs, tile=tile))
            par = paired_subgraph_augment(batch, ri, rj, rs, tile=tile)
        else:
            seq = (mix_augment(batch, ri, start_rank_slot=0, start_rng=rs,
                               tile=tile, bond_window=w),
                   mix_augment(batch, rj, start_rank_slot=1, start_rng=rs,
                               tile=tile, bond_window=w))
            par = paired_mix_augment(batch, ri, rj, rs, tile=tile,
                                     bond_window=w)
        for a, b in zip(seq, par):
            for f in self.FIELDS:
                np.testing.assert_array_equal(
                    np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
                    err_msg=f"{kind} {f} tile={tile}")


class TestPrecomputedDeltas:
    """Batched per-dispatch augmentation (precompute_paired_deltas) must
    produce BIT-IDENTICAL views to the inline per-step calls, for every
    augmentation kind (the train-step rng protocol is part of the
    contract)."""

    @staticmethod
    def _batch():
        spec = PadSpec(n_graphs=6, n_nodes=128, n_edges=224, max_degree=6,
                       tile=32, max_graph_bonds=16)
        return pack_batch([featurize_smiles(s) for s in SMILES], spec), \
            spec

    def test_deltas_match_inline_views(self):
        import jax

        from molclr_tpu.data.augment import (
            AUG_DELTA_FIELDS,
            apply_view_delta,
            paired_augment,
            precompute_paired_deltas,
        )

        batch, spec = self._batch()
        rng = jax.random.PRNGKey(42)
        k = 4
        for kind in ("node", "subgraph", "mix"):
            deltas = precompute_paired_deltas(
                batch, rng, k, kind, tile=spec.tile,
                bond_window=spec.max_graph_bonds)
            for i in range(k):
                ra = jax.random.split(jax.random.fold_in(rng, i), 3)[0]
                vi, vj = paired_augment(batch, ra, kind, tile=spec.tile,
                                        bond_window=spec.max_graph_bonds)
                di, dj = jax.tree_util.tree_map(
                    lambda x: x[i], deltas)
                for want, got_delta in ((vi, di), (vj, dj)):
                    got = apply_view_delta(batch, got_delta)
                    for f in AUG_DELTA_FIELDS:
                        np.testing.assert_array_equal(
                            np.asarray(getattr(got, f)),
                            np.asarray(getattr(want, f)),
                            err_msg=f"{kind} step {i} field {f}")

    def test_chunked_equals_unchunked(self):
        import jax

        from molclr_tpu.data.augment import precompute_paired_deltas

        batch, spec = self._batch()
        rng = jax.random.PRNGKey(7)
        # k=10 with chunk=4 exercises the REMAINDER path (2 full chunks
        # + a 2-wide tail vmap) — a non-divisible k must never fall back
        # to a full-width vmap (r4 review finding: that unbounded the
        # memory the chunking exists to bound)
        a = precompute_paired_deltas(batch, rng, 10, "node", chunk=4,
                                     tile=spec.tile,
                                     bond_window=spec.max_graph_bonds)
        b = precompute_paired_deltas(batch, rng, 10, "node", chunk=16,
                                     tile=spec.tile,
                                     bond_window=spec.max_graph_bonds)
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestMaxWavesHorizon:
    """The reference BFS is UNBOUNDED — it grows until 25% of atoms are
    collected (ref dataset_subgraph.py:70-88). The on-device wave sweep
    has a static horizon: molecules with eccentricity beyond it silently
    under-remove. A corpus-derived horizon (max atoms - 1, the Pretrainer
    auto default) must remove EXACTLY floor(0.25 N) on a long chain where
    the legacy fixed 32 provably cannot."""

    CHAIN_N = 200  # diameter 199; k_sub = 50 needs up to ~50+ waves

    def _chain_batch(self):
        g = featurize_smiles("C" * self.CHAIN_N)
        assert g is not None and g.n_atoms == self.CHAIN_N
        spec = PadSpec(n_graphs=2, n_nodes=256, n_edges=512, max_degree=4,
                       tile=256, max_graph_bonds=self.CHAIN_N)
        return pack_batch([g], spec)

    def test_auto_horizon_always_removes_exact_count(self):
        batch = self._chain_batch()
        k_sub = int(0.25 * self.CHAIN_N)  # 50
        under_removed_at_32 = 0
        for seed in range(8):
            for mw, expect_exact in ((self.CHAIN_N - 1, True), (32, False)):
                vi, vj = paired_augment(batch, jax.random.PRNGKey(seed),
                                        "subgraph", tile=256, max_waves=mw)
                for v in (vi, vj):
                    n = per_graph_masked_atoms(batch, v)[0]
                    if expect_exact:
                        assert n == k_sub, (seed, mw, n)
                    else:
                        assert n <= k_sub
                        under_removed_at_32 += int(n < k_sub)
        # the start atom is uniform on the chain, so most draws sit within
        # 50 waves of one end... only starts in the middle reach 50 atoms
        # within 32 waves (two-sided growth); ends cannot. 8 seeds x 2
        # views make a miss astronomically unlikely.
        assert under_removed_at_32 > 0, \
            "fixed 32-wave horizon unexpectedly sufficed on a 200-chain"

    def test_mix_horizon_subgraph_phase(self):
        """mix's subgraph phase honors max_waves too: with the auto
        horizon the removal target (U(0,0.2) fraction) is always met in
        full, so total masked atoms reach the 25% top-up exactly."""
        batch = self._chain_batch()
        vi, _ = paired_augment(batch, jax.random.PRNGKey(3), "mix",
                               tile=256, bond_window=self.CHAIN_N,
                               max_waves=self.CHAIN_N - 1)
        n = per_graph_masked_atoms(batch, vi)[0]
        assert n == int(0.25 * self.CHAIN_N)

    def test_pretrainer_auto_derives_corpus_bound(self, tmp_path):
        from molclr_tpu.train.config import PretrainConfig
        from molclr_tpu.train.pretrain import Pretrainer

        smiles = ["C" * 60, "CCO", "c1ccccc1"] * 40
        cfg = PretrainConfig(batch_size=8, epochs=1, model=__import__(
            "molclr_tpu.train.config", fromlist=["ModelConfig"]
        ).ModelConfig(num_layers=2, emb_dim=16, feat_dim=32, tile=64),
            aug="subgraph", valid_size=0.1, seed=0,
            featurize_processes=0, ckpt_dir=str(tmp_path))
        p = Pretrainer(cfg).setup_data(smiles)
        assert p._max_waves == 59          # max atoms 60 -> horizon 59
        cfg2 = PretrainConfig(max_waves=17, batch_size=8, epochs=1,
                              aug="subgraph", valid_size=0.1, seed=0,
                              featurize_processes=0,
                              ckpt_dir=str(tmp_path))
        p2 = Pretrainer(cfg2).setup_data(smiles)
        assert p2._max_waves == 17         # explicit value wins
