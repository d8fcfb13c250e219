"""Native C++ featurizer parity and throughput tests."""

import numpy as np
import pytest

from molclr_tpu.data.featurize import featurize_smiles
from molclr_tpu.data.synthetic import synthetic_corpus
from molclr_tpu.native import (
    featurize_corpus_native,
    featurize_smiles_native,
    native_available,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++ unavailable")

DRUGS = [
    "CC(=O)Oc1ccccc1C(=O)O",
    "Cn1cnc2c1c(=O)n(C)c(=O)n2C",
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
    "CC1(C)S[C@@H]2[C@H](NC(=O)Cc3ccccc3)C(=O)N2[C@H]1C(=O)O",
    "CN[C@H]1CC[C@@H](c2ccc(Cl)c(Cl)c2)c2ccccc21",
    "[NH4+].[Cl-]",
    "F/C=C\\F",
    "O=S(=O)(N)c1ccccc1",
    "C%10CC%10",
    "[13CH4]",
]


def assert_graph_equal(a, b, context=""):
    assert a is not None and b is not None, context
    np.testing.assert_array_equal(a.atom_type, b.atom_type, err_msg=context)
    np.testing.assert_array_equal(a.chirality, b.chirality, err_msg=context)
    np.testing.assert_array_equal(a.edge_src, b.edge_src, err_msg=context)
    np.testing.assert_array_equal(a.edge_dst, b.edge_dst, err_msg=context)
    np.testing.assert_array_equal(a.bond_type, b.bond_type, err_msg=context)
    np.testing.assert_array_equal(a.bond_dir, b.bond_dir, err_msg=context)


class TestParity:
    @pytest.mark.parametrize("smiles", DRUGS)
    def test_drugs(self, smiles):
        assert_graph_equal(featurize_smiles_native(smiles),
                           featurize_smiles(smiles), smiles)

    @pytest.mark.parametrize("add_hs", [False, True])
    def test_corpus_parity(self, add_hs):
        corpus = synthetic_corpus(300, seed=11)
        for s in corpus:
            py = featurize_smiles(s, add_hs=add_hs)
            cc = featurize_smiles_native(s, add_hs=add_hs)
            if py is None:
                assert cc is None, s
            else:
                assert_graph_equal(cc, py, s)

    def test_invalid_smiles(self):
        for bad in ["", "C1CC", "((", "[Zz]", "xyz", "c1ccccc1c1"]:
            assert featurize_smiles_native(bad) is None

    @pytest.mark.parametrize("smiles", [
        # sanitize_aromatic parity (biphenyl implicit linker -> SINGLE,
        # non-Hückel aromatic-written rings -> rejected on BOTH sides)
        "c1ccc(cc1)c1ccccc1",
        "c1ccc(cc1)-c1ccccc1",
        "Cc1ccccc1c1ccccc1C",
        "c1ccc(cc1)c1ccncc1",
        "c1ccc-2c(c1)-c1ccccc1-2",
        "c1ccc1", "cc", "c1ccccccc1", "c1cc1C",
    ])
    def test_aromatic_sanitize_parity(self, smiles):
        py = featurize_smiles(smiles)
        cc = featurize_smiles_native(smiles)
        if py is None:
            assert cc is None, smiles
        else:
            assert_graph_equal(cc, py, smiles)

    def test_batch_api(self):
        corpus = synthetic_corpus(200, seed=3) + ["not_valid(("]
        out = featurize_corpus_native(corpus)
        assert out is not None
        graphs, kept = out
        assert len(kept) == 200  # invalid row dropped
        for g, i in zip(graphs, kept):
            assert_graph_equal(g, featurize_smiles(corpus[i]), corpus[i])

    def test_csv_last_column(self):
        """Batch reader takes the last comma field (ref dataset.py:46-53)."""
        out = featurize_corpus_native(["id123,CCO"])
        graphs, kept = out
        assert kept == [0]
        assert graphs[0].n_atoms == 3


def _timed(fn):
    import time

    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


class TestThroughput:
    def test_faster_than_python(self):

        corpus = synthetic_corpus(2000, seed=5)
        t_native = min(_timed(lambda: featurize_corpus_native(corpus))
                       for _ in range(3))
        t_py = min(_timed(lambda: [featurize_smiles(s) for s in corpus])
                   for _ in range(2))
        out = featurize_corpus_native(corpus)
        py = [featurize_smiles(s) for s in corpus]
        assert len(out[0]) == sum(1 for g in py if g is not None)
        # the native path must be substantially faster; the margin is
        # conservative because this 2-vCPU box runs tests under load and
        # per-molecule numpy slicing bounds the gain on tiny molecules
        # (measured ~6.6x unloaded)
        assert t_native * 2 < t_py, (t_native, t_py)


class TestNativePacker:
    """mtpu_pack_batch vs the Python packer: bit-exact on every array,
    including tile-aligned placement, sentinels and overflow semantics."""

    def _graphs(self, n=64, seed=13):
        from molclr_tpu.data.featurize import featurize_smiles
        from molclr_tpu.data.synthetic import synthetic_corpus

        gs = [featurize_smiles(s) for s in synthetic_corpus(n, seed=seed)]
        return [g for g in gs if g is not None and g.max_degree <= 6]

    @pytest.mark.parametrize("tile", [0, 32])
    def test_bit_exact_vs_python(self, tile):
        from molclr_tpu import native
        from molclr_tpu.data.graphs import pack_batch
        from molclr_tpu.data.loader import spec_for_graphs

        if not native.native_available():
            pytest.skip("no native lib")
        gs = self._graphs()
        spec = spec_for_graphs(gs, len(gs), tile=tile)
        py = pack_batch(gs, spec, prefer_native=False)
        nat = native.pack_batch_native(gs, spec)
        assert nat is not None
        import dataclasses

        for f in py.__dataclass_fields__:
            np.testing.assert_array_equal(
                np.asarray(getattr(py, f)), np.asarray(getattr(nat, f)),
                err_msg=f"field {f} (tile={tile})")

    def test_overflow_matches_python(self):
        from molclr_tpu import native
        from molclr_tpu.data.graphs import PackOverflow, PadSpec

        if not native.native_available():
            pytest.skip("no native lib")
        gs = self._graphs(n=16)
        tiny = PadSpec(n_graphs=len(gs), n_nodes=16, n_edges=16,
                       max_degree=6)
        with pytest.raises(PackOverflow):
            native.pack_batch_native(gs, tiny)

    def test_batch_iterator_uses_native_transparently(self):
        # end-to-end through the default pack path (prefer_native=True)
        from molclr_tpu.data.graphs import pack_batch
        from molclr_tpu.data.loader import spec_for_graphs

        gs = self._graphs(n=24)
        spec = spec_for_graphs(gs, len(gs), tile=32)
        b1 = pack_batch(gs, spec)                       # native (default)
        b2 = pack_batch(gs, spec, prefer_native=False)  # python
        np.testing.assert_array_equal(np.asarray(b1.nbr),
                                      np.asarray(b2.nbr))
