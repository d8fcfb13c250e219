"""Tests for the link (label-embedding) fine-tune variant and the CSV
conversion utility."""

import os

import jax
import numpy as np

from molclr_tpu.cli.convert import main as convert_main
from molclr_tpu.data import PadSpec, featurize_smiles, pack_batch
from molclr_tpu.models import LinkFineTuneNet

SMILES = ["CC(=O)Oc1ccccc1C(=O)O", "CCO", "c1ccccc1", "CC(C)N"]
SPEC = PadSpec(n_graphs=4, n_nodes=64, n_edges=128, max_degree=6)


class TestLinkNet:
    def test_forward_shapes(self):
        batch = pack_batch([featurize_smiles(s) for s in SMILES], SPEC)
        model = LinkFineTuneNet(num_layers=2, emb_dim=32, feat_dim=64)
        v = model.init(jax.random.PRNGKey(0), batch, train=False)
        h, p = model.apply(v, batch, train=False)
        assert h.shape == (4, 64)
        assert p.shape == (4, 2)
        assert not np.isnan(np.asarray(p)).any()

    def test_shared_head(self):
        """Both hypotheses run through ONE shared pred head (the reference
        calls the same nn.Sequential twice)."""
        batch = pack_batch([featurize_smiles(s) for s in SMILES], SPEC)
        model = LinkFineTuneNet(num_layers=2, emb_dim=32, feat_dim=64)
        v = model.init(jax.random.PRNGKey(0), batch, train=False)
        names = set(v["params"].keys())
        assert "pred_0" in names and "pred_out" in names
        # exactly one copy (no pred_0_1 duplicates)
        assert not any(n.startswith("pred_0_") for n in names)

    def test_label_embedding_trains(self):
        batch = pack_batch([featurize_smiles(s) for s in SMILES], SPEC)
        model = LinkFineTuneNet(num_layers=2, emb_dim=32, feat_dim=64)
        v = model.init(jax.random.PRNGKey(0), batch, train=False)

        def loss(params):
            _, p = model.apply({"params": params,
                                "batch_stats": v["batch_stats"]},
                               batch, train=False)
            return (p ** 2).sum()

        g = jax.grad(loss)(v["params"])
        assert float(np.abs(np.asarray(g["label_embedding"])).sum()) > 0


class TestConvert:
    def test_roundtrip(self, tmp_path, capsys):
        src = tmp_path / "in.csv"
        src.write_text("smiles,p_np\nCCO,1\nnot_valid((,0\nc1ccccc1,1\n")
        dst = tmp_path / "out.txt"
        convert_main([str(src), str(dst)])
        lines = dst.read_text().splitlines()
        assert lines == ["CCO", "c1ccccc1"]
        assert "2 SMILES" in capsys.readouterr().out

    def test_last_column_fallback(self, tmp_path):
        src = tmp_path / "in.csv"
        src.write_text("CCO\nc1ccccc1\nxxx((\n")
        dst = tmp_path / "out.txt"
        convert_main([str(src), str(dst)])
        assert dst.read_text().splitlines() == ["CCO", "c1ccccc1"]
