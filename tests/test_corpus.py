"""On-disk featurized corpus (data/corpus.py): build/mmap round-trip
parity with in-memory featurization, vectorized spec sizing, streaming
pretraining from disk."""

import numpy as np
import pytest

from molclr_tpu.data import featurize_smiles
from molclr_tpu.data.corpus import (
    CorpusSubset,
    DiskCorpus,
    build_corpus,
    is_disk_corpus,
)
from molclr_tpu.data.loader import BatchIterator, spec_for_graphs
from molclr_tpu.data.synthetic import synthetic_corpus


@pytest.fixture(scope="module", params=["native", "python"])
def corpus(request, tmp_path_factory):
    smiles = synthetic_corpus(300, seed=11)
    out = tmp_path_factory.mktemp("corpus") / f"c_{request.param}.mtpu"
    build_corpus(iter(smiles), str(out), chunk_size=77,
                 prefer_native=request.param == "native")
    return smiles, DiskCorpus(str(out))


class TestBuildAndReadback:
    def test_meta_and_detection(self, corpus):
        smiles, dc = corpus
        assert is_disk_corpus(dc.path)
        assert dc.meta["n_mols"] == len(dc) > 0
        assert dc.meta["n_nodes"] == int(dc.atom_counts.sum())
        assert dc.meta["n_edges"] == int(dc.edge_counts.sum())

    def test_molgraph_parity_with_in_memory(self, corpus):
        """Every mmap'd MolGraph equals the directly-featurized one
        (synthetic corpus: all molecules parse, order preserved)."""
        smiles, dc = corpus
        assert len(dc) == len(smiles)
        rng = np.random.RandomState(0)
        for i in rng.choice(len(dc), size=40, replace=False):
            ref = featurize_smiles(smiles[i])
            got = dc[int(i)]
            for f in ("atom_type", "chirality", "edge_src", "edge_dst",
                      "bond_type", "bond_dir"):
                np.testing.assert_array_equal(
                    getattr(got, f), getattr(ref, f),
                    err_msg=f"{smiles[i]} {f}")
            assert got.max_degree == ref.max_degree
            assert int(dc.max_degrees[i]) == ref.max_degree

    def test_vectorized_spec_matches_list_spec(self, corpus):
        smiles, dc = corpus
        graphs = [featurize_smiles(s) for s in smiles]
        s_list = spec_for_graphs(graphs, 32, tile=32)
        s_disk = spec_for_graphs(dc, 32, tile=32)
        assert s_list == s_disk

    def test_subset_stats_and_iteration(self, corpus):
        _, dc = corpus
        ids = np.arange(0, len(dc), 3)
        sub = CorpusSubset(dc, ids)
        assert len(sub) == len(ids)
        np.testing.assert_array_equal(sub.atom_counts,
                                      np.asarray(dc.atom_counts)[ids])
        g = sub[2]
        assert g.n_atoms == int(sub.atom_counts[2])

    def test_batch_iterator_over_disk_equals_memory(self, corpus):
        """Packing from the mmap'd corpus yields bit-identical batches to
        packing the same molecules featurized in memory."""
        smiles, dc = corpus
        graphs = [featurize_smiles(s) for s in smiles]
        spec = spec_for_graphs(dc, 16, tile=32)
        it_d = BatchIterator(CorpusSubset(dc, np.arange(len(dc))), spec,
                             batch_size=16, shuffle=True, seed=3)
        it_m = BatchIterator(graphs, spec, batch_size=16, shuffle=True,
                             seed=3)
        for (bd, _, idx_d), (bm, _, idx_m) in zip(it_d, it_m):
            np.testing.assert_array_equal(idx_d, idx_m)
            for f in ("atom_type", "nbr", "src", "graph_n_nodes",
                      "node_mask"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(bd, f)), np.asarray(getattr(bm, f)))


class TestPretrainFromDisk:
    def test_two_epochs_stream_from_disk(self, tmp_path):
        from molclr_tpu.train.config import ModelConfig, PretrainConfig
        from molclr_tpu.train.pretrain import Pretrainer

        smiles = synthetic_corpus(300, seed=12)
        cdir = tmp_path / "c.mtpu"
        build_corpus(iter(smiles), str(cdir), chunk_size=100)

        cfg = PretrainConfig(
            data_path=str(cdir), batch_size=32, epochs=2, warm_up=1,
            model=ModelConfig(num_layers=2, emb_dim=32, feat_dim=64,
                              tile=32),
            aug="node", valid_size=0.1, ckpt_dir=str(tmp_path / "ck"),
            seed=0, save_every_epochs=100, eval_every_epochs=1)
        pre = Pretrainer(cfg).setup_data()
        pre.setup_state(next(iter(pre.train_iter))[0])
        hist = pre.train(log=lambda *_: None)
        assert len(hist) == 2
        assert all(np.isfinite(h["train_loss"]) for h in hist)
        assert hist[-1]["train_loss"] < hist[0]["train_loss"]

    def test_native_streaming_superbatches(self, tmp_path, monkeypatch):
        """Corpora above pack_cache_max_mols stream through the native
        indexed superbatch packer (one C call per batch straight from the
        mmap); training must still learn and the fast path must actually
        be taken."""
        from molclr_tpu import native
        from molclr_tpu.train.config import ModelConfig, PretrainConfig
        from molclr_tpu.train.pretrain import Pretrainer

        if not native.native_available():
            pytest.skip("native library unavailable")
        smiles = synthetic_corpus(300, seed=13)
        cdir = tmp_path / "c3.mtpu"
        build_corpus(iter(smiles), str(cdir), chunk_size=100)

        calls = {"n": 0}
        orig = native.pack_superbatch_indexed

        def counting(*a, **k):
            calls["n"] += 1
            return orig(*a, **k)

        monkeypatch.setattr(native, "pack_superbatch_indexed", counting)
        cfg = PretrainConfig(
            data_path=str(cdir), batch_size=32, epochs=2, warm_up=1,
            model=ModelConfig(num_layers=2, emb_dim=32, feat_dim=64,
                              tile=32),
            aug="node", valid_size=0.1, ckpt_dir=str(tmp_path / "ck3"),
            seed=0, save_every_epochs=100, eval_every_epochs=100,
            pack_cache_max_mols=10,      # force the streaming path
            steps_per_dispatch=3)
        pre = Pretrainer(cfg).setup_data()
        pre.setup_state(next(iter(pre.train_iter))[0])
        hist = pre.train(log=lambda *_: None)
        assert calls["n"] > 0, "native streaming path was not used"
        assert len(hist) == 2
        assert hist[-1]["train_loss"] < hist[0]["train_loss"]
        # every full epoch consumed: 270 train mols / 32 = 8 batches
        assert all(h["steps"] == 8 for h in hist)

    def test_add_hs_mismatch_raises(self, tmp_path):
        from molclr_tpu.train.config import ModelConfig, PretrainConfig
        from molclr_tpu.train.pretrain import Pretrainer

        cdir = tmp_path / "c2.mtpu"
        build_corpus(iter(synthetic_corpus(50, seed=1)), str(cdir))
        cfg = PretrainConfig(
            data_path=str(cdir), batch_size=8, epochs=1, aug="mix",
            model=ModelConfig(num_layers=2, emb_dim=16, feat_dim=32,
                              tile=32),
            ckpt_dir=str(tmp_path / "ck2"))
        with pytest.raises(ValueError, match="add_hs"):
            Pretrainer(cfg).setup_data()
