"""WHOLE-RUN training-dynamics parity vs the pure-torch oracle.

Extends the 3-step parity of tests/test_torch_step_parity.py to full
campaigns (VERDICT r3 gap #1): N epochs of the REAL Pretrainer /
FineTuner loops against the oracle's transcription of the reference
epoch loops (tests/torch_oracle.py: torch_pretrain_run /
torch_finetune_run), on identical data, split, and initial state —
including a warm start from the SHIPPED reference GCN checkpoint.

What this pins beyond per-step parity: the baked warm-up+cosine LR
schedule vs torch CosineAnnealingLR (molclr.py:84-91,146-147), BN
running-stat accumulation across epochs and its eval-mode use in
validation, strict-improvement best-epoch gating on the task metric
(finetune.py:228-243), and the absence of slow drift over 20+ epochs of
Adam x BN x schedule interactions.

Harness note: both frameworks train FULL-BATCH (batch_size == n_train,
one optimizer step per epoch) with aug='none' here — the simplest
end-to-end pin. The minibatch x BN-drift x stochastic-augmentation
regime (the reference's actual operating point) is pinned separately by
tests/test_minibatch_parity.py, which injects the JAX framework's own
deterministic augmentation stream into the oracle and teacher-forces
per-epoch state so fp32 trajectory chaos cannot mask real divergence.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import torch_oracle as to
from molclr_tpu.train.config import FineTuneConfig, ModelConfig, \
    PretrainConfig
from molclr_tpu.train.finetune import FineTuner
from molclr_tpu.train.pretrain import Pretrainer

REF_GCN_CKPT = "/root/reference/ckpt/pretrained_gcn/checkpoints/model.pth"

torch.set_num_threads(1)


def _export_to_torch(params, stats, tmodel, gnn_type, num_layers,
                     pred_n_layer=2):
    to.load_into_torch(tmodel, to.export_torch_state(
        params, stats, gnn_type=gnn_type, num_layers=num_layers,
        pred_n_layer=pred_n_layer))


class TestFineTuneWholeRun:
    """20+ epochs of the real FineTuner vs torch_finetune_run."""

    def _run_pair(self, tmp_path, task_name, gnn_type, tile,
                  pretrained="", epochs=22, synthetic_n=160,
                  model_kw=None):
        cfg = FineTuneConfig(
            task_name=task_name, data_root=str(tmp_path),
            batch_size=64, epochs=epochs, synthetic_n=synthetic_n,
            synthetic_fallback=True, seed=0, pretrained=pretrained,
            ckpt_dir=str(tmp_path / "ft"),
            model=ModelConfig(gnn_type=gnn_type, tile=tile,
                              drop_ratio=0.0, **(model_kw or {})))
        probe = FineTuner(cfg).setup_data()
        n_train = len(probe.split[0])
        cfg.batch_size = n_train          # full-batch: 1 step per epoch

        ft = FineTuner(cfg).setup_data()
        tr, va, te = ft.split
        first = next(iter(ft.iters["train"]))[0]
        # the whole train split must be in the single batch (no silent
        # PackOverflow evictions, which would desync the oracle)
        assert int(np.asarray(first.graph_mask).sum()) == n_train
        ft.setup_state(first)

        # identical initial state: export the (possibly warm-started)
        # JAX params + BN stats into the torch oracle
        mcfg = cfg.model
        tmodel = to.TorchNet(gnn_type=gnn_type, task=ft.task.task,
                             num_layers=mcfg.num_layers,
                             emb_dim=mcfg.emb_dim, feat_dim=mcfg.feat_dim)
        _export_to_torch(
            jax.tree_util.tree_map(np.asarray, ft.state.params),
            jax.tree_util.tree_map(np.asarray, ft.state.batch_stats),
            tmodel, gnn_type, mcfg.num_layers)

        graphs = ft.shared.graphs
        ids, _ = ft.shared.select(ft.target)      # row -> shared graph id
        sel = lambda rows: [graphs[ids[r]] for r in rows]
        y = ft.train_labels
        oracle = to.torch_finetune_run(
            tmodel,
            to.batch_graphs(sel(tr)), y[tr],
            to.batch_graphs(sel(va)), y[va],
            to.batch_graphs(sel(te)), y[te],
            task=ft.task.task, loss_kind=ft.task.loss,
            metric_name=ft.task.metric, epochs=epochs,
            head_lr=cfg.init_lr, base_lr=cfg.init_base_lr,
            weight_decay=cfg.weight_decay)

        out = ft.train(log=lambda *_: None)
        hist = out["history"]
        jax_losses = np.array([h["train_loss"] for h in hist])
        jax_valid = np.array(
            [h[f"valid_{ft.task.metric}"] for h in hist])
        return (jax_losses, jax_valid, out["test_metric"],
                np.array(oracle["train_losses"]),
                np.array(oracle["valid_metrics"]),
                oracle["test_metric"], ft.task.metric)

    def _assert_trajectories(self, jl, jv, jt, tl, tv, tt, metric,
                             loss_rtol=1e-3):
        np.testing.assert_allclose(
            jl, tl, rtol=loss_rtol, atol=1e-5,
            err_msg="per-epoch train-loss trajectory diverged")
        if metric == "roc_auc":
            # rank metric on a small valid set: a score pair closer than
            # the fp32 trajectory tolerance can flip a rank; require the
            # trajectories to agree except for isolated single-rank flips
            n_va = max(len(jv), 1)
            flip = 1.0 / 4.0  # conservative one-flip bound for tiny sets
            bad = np.abs(jv - tv) > flip
            assert bad.mean() <= 0.15, (jv, tv)
            np.testing.assert_allclose(np.nanmean(jv), np.nanmean(tv),
                                       atol=0.05)
            assert abs(jt - tt) <= 0.1, (jt, tt)
        else:
            np.testing.assert_allclose(jv, tv, rtol=5e-3, atol=1e-4)
            np.testing.assert_allclose(jt, tt, rtol=5e-3, atol=1e-4)

    def test_gin_classification_whole_run(self, tmp_path):
        """GIN/BBBP (CE + ROC-AUC), scratch init, ELL aggregation path."""
        res = self._run_pair(tmp_path, "BBBP", "gin", tile=0,
                             model_kw=dict(num_layers=3, emb_dim=64,
                                           feat_dim=128))
        self._assert_trajectories(*res)

    def test_gcn_regression_warmstart_whole_run(self, tmp_path):
        """GCN/FreeSolv (MSE + RMSE), tile-dense path, warm-started from
        the SHIPPED reference GCN checkpoint via the torch importer —
        both frameworks start from the published weights."""
        if not os.path.exists(REF_GCN_CKPT):
            pytest.skip("shipped GCN checkpoint not present")
        res = self._run_pair(tmp_path, "FreeSolv", "gcn", tile=64,
                             pretrained=REF_GCN_CKPT, epochs=20,
                             synthetic_n=120)
        self._assert_trajectories(*res)


class TestPretrainWholeRun:
    """6 epochs (2 warm-up + 4 cosine) of the real Pretrainer vs
    torch_pretrain_run: pins the baked warm-up+cosine schedule against
    torch CosineAnnealingLR stepped per the reference loop."""

    @pytest.mark.parametrize("gnn_type", ["gin", "gcn"])
    def test_pretrain_whole_run(self, gnn_type, tmp_path):
        from molclr_tpu.data.loader import featurize_many
        from molclr_tpu.data.synthetic import synthetic_corpus

        smiles = synthetic_corpus(96, seed=21)
        graphs, _ = featurize_many(smiles, max_degree=6, processes=0)
        n = len(graphs)
        n_valid = int(n * 0.1)
        n_train = n - n_valid
        epochs, warm_up = 6, 2

        cfg = PretrainConfig(
            batch_size=n_train, epochs=epochs, warm_up=warm_up,
            init_lr=5e-4, weight_decay=1e-5, aug="none", valid_size=0.1,
            seed=0, featurize_processes=0, eval_every_epochs=100,
            save_every_epochs=100, ckpt_dir=str(tmp_path / "pre"),
            steps_per_dispatch=1, device_cache_mb=0, pad_sizing="max",
            model=ModelConfig(gnn_type=gnn_type, num_layers=3, emb_dim=64,
                              feat_dim=128, tile=0, drop_ratio=0.0))
        pre = Pretrainer(cfg).setup_data(smiles)
        assert len(pre.train_iter) == 1      # full-batch epochs
        first = next(iter(pre.train_iter))[0]
        assert int(np.asarray(first.graph_mask).sum()) == n_train
        pre.setup_state(first)

        tmodel = to.TorchNet(gnn_type=gnn_type, num_layers=3, emb_dim=64,
                             feat_dim=128)
        to.load_into_torch(tmodel, to.export_torch_state(
            jax.tree_util.tree_map(np.asarray, pre.state.params),
            jax.tree_util.tree_map(np.asarray, pre.state.batch_stats),
            num_layers=3, gnn_type=gnn_type))
        tb = to.batch_graphs(pre.train_iter.graphs)
        t_losses = to.torch_pretrain_run(
            tmodel, tb, tb, epochs=epochs, warm_up=warm_up,
            init_lr=cfg.init_lr, weight_decay=cfg.weight_decay,
            temperature=cfg.temperature)

        history = pre.train(log=lambda *_: None)
        j_losses = np.array([h["train_loss"] for h in history])
        # fp32 trajectory chaos: a ~1e-7 JAX-vs-torch linalg rounding gap
        # amplifies ~10x per optimizer step over 6 epochs (the r5 biaryl
        # bond-type sanitization shifted the corpus trajectory from
        # ~0.9e-3 to ~1.5e-3 peak drift with epoch 0 still bit-equal).
        # Real step-level divergence is pinned far tighter by
        # test_torch_step_parity (per-step) and test_minibatch_parity
        # (teacher-forced, chaos-free); this asserts no SLOW DRIFT only.
        np.testing.assert_allclose(
            j_losses, np.array(t_losses), rtol=2.5e-3, atol=1e-5,
            err_msg=f"{gnn_type} pretrain loss trajectory diverged")
