"""Model tests: shapes/masking, batch invariance, NT-Xent vs reference
transcription, and checkpoint parity against the shipped reference GCN
state dict through an independent numpy oracle."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from molclr_tpu.data import PadSpec, featurize_smiles, pack_batch
from molclr_tpu.losses import nt_xent_loss
from molclr_tpu.models import FineTuneNet, MolCLRNet, MotifFineTuneNet
from molclr_tpu.train.checkpoints import (
    import_torch_params,
    load_torch_state_dict,
    transfer_params,
)

REF_GCN_CKPT = "/root/reference/ckpt/pretrained_gcn/checkpoints/model.pth"

SMILES = ["CC(=O)Oc1ccccc1C(=O)O", "Cn1cnc2c1c(=O)n(C)c(=O)n2C",
          "CCO", "N#Cc1ccc(Cl)cc1"]
SPEC = PadSpec(n_graphs=6, n_nodes=96, n_edges=224, max_degree=6)


def make_batch(smiles=SMILES, spec=SPEC):
    return pack_batch([featurize_smiles(s) for s in smiles], spec)


def init_model(model, batch, *args, seed=0):
    variables = model.init(jax.random.PRNGKey(seed), batch, *args,
                           train=False)
    return variables["params"], variables.get("batch_stats", {})


class TestShapes:
    def test_molclr_forward(self):
        batch = make_batch()
        model = MolCLRNet(gnn_type="gin")
        params, stats = init_model(model, batch)
        h, z = model.apply({"params": params, "batch_stats": stats}, batch,
                           train=False)
        assert h.shape == (SPEC.n_graphs, 512)
        assert z.shape == (SPEC.n_graphs, 256)
        assert not np.isnan(np.asarray(h)).any()
        # padded graph rows are exactly zero through feat_lin? No — dense
        # adds bias; but they must be finite and constant across padded rows.
        hn = np.asarray(h)
        np.testing.assert_allclose(hn[4], hn[5], rtol=1e-6)

    def test_finetune_forward(self):
        batch = make_batch()
        for task, od in [("classification", 2), ("regression", 1)]:
            model = FineTuneNet(task=task, gnn_type="gin")
            params, stats = init_model(model, batch)
            h, p = model.apply({"params": params, "batch_stats": stats},
                               batch, train=False)
            assert p.shape == (SPEC.n_graphs, od)

    def test_motif_forward(self):
        batch = make_batch()
        G, C, V = SPEC.n_graphs, 4, 11
        rng = np.random.RandomState(0)
        motif_ids = rng.randint(0, V, size=(G, C)).astype(np.int32)
        motif_mask = rng.rand(G, C) < 0.7
        model = MotifFineTuneNet(num_motifs=V, gnn_type="gin")
        params, stats = init_model(model, batch, motif_ids, motif_mask)
        cat, p = model.apply({"params": params, "batch_stats": stats},
                             batch, motif_ids, motif_mask, train=False)
        assert cat.shape == (G, 1024)
        assert p.shape == (G, 2)
        assert not np.isnan(np.asarray(p)).any()

    def test_train_mode_updates_stats(self):
        batch = make_batch()
        model = MolCLRNet(gnn_type="gin", drop_ratio=0.3)
        params, stats = init_model(model, batch)
        (_, _), updates = model.apply(
            {"params": params, "batch_stats": stats}, batch, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"])
        new_stats = updates["batch_stats"]
        diff = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            stats, new_stats)
        assert max(jax.tree_util.tree_leaves(diff)) > 0


class TestBatchInvariance:
    def test_single_vs_packed(self):
        """A molecule's pooled features must not depend on its batch
        neighbors (eval mode) — the core padding-correctness property."""
        model = MolCLRNet(gnn_type="gin")
        big = make_batch()
        params, stats = init_model(model, big)
        h_all, _ = model.apply({"params": params, "batch_stats": stats},
                               big, train=False)
        for i, s in enumerate(SMILES):
            solo = pack_batch([featurize_smiles(s)],
                              PadSpec(2, 48, 112, max_degree=6))
            h_solo, _ = model.apply({"params": params, "batch_stats": stats},
                                    solo, train=False)
            np.testing.assert_allclose(np.asarray(h_solo[0]),
                                       np.asarray(h_all[i]),
                                       rtol=2e-4, atol=2e-4)


class TestNTXent:
    @pytest.mark.parametrize("use_cosine", [True, False])
    @pytest.mark.parametrize("b,d", [(8, 16), (32, 64)])
    def test_vs_reference_transcription(self, use_cosine, b, d):
        rng = np.random.RandomState(b + d)
        zis = rng.randn(b, d).astype(np.float32)
        zjs = rng.randn(b, d).astype(np.float32)
        ref = oracle.nt_xent_reference(zis, zjs, 0.1, use_cosine)
        got = float(nt_xent_loss(jnp.array(zis), jnp.array(zjs), 0.1,
                                 use_cosine))
        np.testing.assert_allclose(got, ref, rtol=1e-4)

    def test_identical_views_low_loss(self):
        rng = np.random.RandomState(0)
        z = rng.randn(16, 32).astype(np.float32)
        same = float(nt_xent_loss(jnp.array(z), jnp.array(z), 0.1))
        diff = float(nt_xent_loss(jnp.array(z),
                                  jnp.array(rng.randn(16, 32),
                                            dtype=jnp.float32), 0.1))
        assert same < diff


@pytest.mark.skipif(not os.path.exists(REF_GCN_CKPT),
                    reason="reference checkpoint not present")
class TestCheckpointParity:
    def test_gcn_reference_checkpoint(self):
        """Padded JAX GCN with imported reference weights == independent
        numpy oracle of the torch semantics, per molecule, eval mode."""
        state = load_torch_state_dict(REF_GCN_CKPT)
        params, stats = import_torch_params(state, gnn_type="gcn")
        batch = make_batch()
        model = MolCLRNet(gnn_type="gcn")
        p0, s0 = init_model(model, batch)
        params = transfer_params(params, p0)
        stats = transfer_params(stats, s0)
        h, z = model.apply({"params": params, "batch_stats": stats}, batch,
                           train=False)
        for i, s in enumerate(SMILES):
            g = featurize_smiles(s)
            h_ref, z_ref = oracle.encoder_forward(g, state, "gcn")
            np.testing.assert_allclose(np.asarray(h[i]), h_ref,
                                       rtol=1e-3, atol=1e-3)
            np.testing.assert_allclose(np.asarray(z[i]), z_ref,
                                       rtol=1e-3, atol=1e-3)

    def test_gin_random_roundtrip(self):
        """No GIN reference checkpoint ships; instead export my initialized
        GIN params into the torch schema implicitly by building a synthetic
        torch-style state dict from them, then oracle-check."""
        batch = make_batch()
        model = MolCLRNet(gnn_type="gin")
        params, stats = init_model(model, batch, seed=3)
        state = {}
        tr = params["trunk"]
        state["x_embedding1.weight"] = np.asarray(tr["x_embedding1"])
        state["x_embedding2.weight"] = np.asarray(tr["x_embedding2"])
        for l in range(5):
            c = tr[f"conv_{l}"]
            state[f"gnns.{l}.edge_embedding1.weight"] = np.asarray(
                c["edge_embedding1"])
            state[f"gnns.{l}.edge_embedding2.weight"] = np.asarray(
                c["edge_embedding2"])
            state[f"gnns.{l}.mlp.0.weight"] = np.asarray(
                c["mlp_0"]["kernel"]).T
            state[f"gnns.{l}.mlp.0.bias"] = np.asarray(c["mlp_0"]["bias"])
            state[f"gnns.{l}.mlp.2.weight"] = np.asarray(
                c["mlp_1"]["kernel"]).T
            state[f"gnns.{l}.mlp.2.bias"] = np.asarray(c["mlp_1"]["bias"])
            bn = tr[f"bn_{l}"]
            sbn = stats["trunk"][f"bn_{l}"]
            state[f"batch_norms.{l}.weight"] = np.asarray(bn["scale"])
            state[f"batch_norms.{l}.bias"] = np.asarray(bn["bias"])
            state[f"batch_norms.{l}.running_mean"] = np.asarray(sbn["mean"])
            state[f"batch_norms.{l}.running_var"] = np.asarray(sbn["var"])
        state["feat_lin.weight"] = np.asarray(params["feat_lin"]["kernel"]).T
        state["feat_lin.bias"] = np.asarray(params["feat_lin"]["bias"])
        state["out_lin.0.weight"] = np.asarray(
            params["out_lin_0"]["kernel"]).T
        state["out_lin.0.bias"] = np.asarray(params["out_lin_0"]["bias"])
        state["out_lin.2.weight"] = np.asarray(
            params["out_lin_1"]["kernel"]).T
        state["out_lin.2.bias"] = np.asarray(params["out_lin_1"]["bias"])

        h, z = model.apply({"params": params, "batch_stats": stats}, batch,
                           train=False)
        for i, s in enumerate(SMILES):
            g = featurize_smiles(s)
            h_ref, z_ref = oracle.encoder_forward(g, state, "gin")
            np.testing.assert_allclose(np.asarray(h[i]), h_ref,
                                       rtol=1e-3, atol=1e-3)

    def test_transfer_into_finetune(self):
        """Pretrained trunk weights flow into the fine-tune net; head stays
        freshly initialized (load_my_state_dict semantics)."""
        state = load_torch_state_dict(REF_GCN_CKPT)
        imported, _ = import_torch_params(state, gnn_type="gcn")
        batch = make_batch()
        model = FineTuneNet(task="classification", gnn_type="gcn")
        p0, s0 = init_model(model, batch)
        merged = transfer_params(imported, p0)
        np.testing.assert_array_equal(
            np.asarray(merged["trunk"]["x_embedding1"]),
            state["x_embedding1.weight"])
        # head untouched
        np.testing.assert_array_equal(
            np.asarray(merged["pred_out"]["kernel"]),
            np.asarray(p0["pred_out"]["kernel"]))
