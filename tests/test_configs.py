"""Coverage of the remaining BASELINE.json reference configurations on
synthetic data: GCN multi-task classification, subgraph/mix-augmentation
pretraining, and YAML config loading."""

import os

import numpy as np
import pytest

from molclr_tpu.data.synthetic import synthetic_corpus
from molclr_tpu.train.config import (
    FineTuneConfig,
    ModelConfig,
    PretrainConfig,
    finetune_from_yaml,
    pretrain_from_yaml,
)
from molclr_tpu.train.finetune import FineTuner, run_all_targets
from molclr_tpu.train.pretrain import Pretrainer

SMALL = ModelConfig(gnn_type="gin", num_layers=2, emb_dim=64, feat_dim=128)
SMALL_GCN = ModelConfig(gnn_type="gcn", num_layers=2, emb_dim=64,
                        feat_dim=128)


class TestGcnMultiTask:
    def test_tox21_two_targets(self, tmp_path, monkeypatch):
        """GCN fine-tune over multiple target columns (config #2 analog;
        exercises GCNConv + the per-target loop of finetune.py:495-506)."""
        monkeypatch.chdir(tmp_path)
        cfg = FineTuneConfig(task_name="Tox21", data_root=str(tmp_path),
                             batch_size=32, epochs=2, model=SMALL_GCN,
                             synthetic_n=250, seed=0,
                             ckpt_dir=str(tmp_path / "ft"))
        results = []
        for target in ("NR-AR", "NR-AhR"):
            ft = FineTuner(cfg, target=target).setup_data()
            first = next(iter(ft.iters["train"]))[0]
            ft.setup_state(first)
            results.append(ft.train(log=lambda *_: None))
        assert len(results) == 2
        assert all(np.isfinite(r["test_metric"]) or
                   np.isnan(r["test_metric"]) for r in results)

    def test_gcn_normalized_variant(self, tmp_path):
        """normalize_gcn=True (quirk-Q2 fixed mode) trains too."""
        cfg = FineTuneConfig(
            task_name="BBBP", data_root=str(tmp_path), batch_size=32,
            epochs=2, synthetic_n=200, seed=0,
            model=ModelConfig(gnn_type="gcn", num_layers=2, emb_dim=64,
                              feat_dim=128, normalize_gcn=True),
            ckpt_dir=str(tmp_path / "ft"))
        ft = FineTuner(cfg).setup_data()
        first = next(iter(ft.iters["train"]))[0]
        ft.setup_state(first)
        r = ft.train(log=lambda *_: None)
        assert np.isfinite(r["test_metric"])


class TestAugPretrainVariants:
    @pytest.mark.parametrize("aug", ["subgraph", "mix"])
    def test_pretrain_runs(self, aug, tmp_path):
        """Subgraph/mix-augmentation pretraining (configs #4/#3)."""
        cfg = PretrainConfig(batch_size=16, epochs=2, warm_up=1,
                             model=SMALL, aug=aug, valid_size=0.1,
                             ckpt_dir=str(tmp_path / aug), seed=0,
                             featurize_processes=0, save_every_epochs=100,
                             eval_every_epochs=1, steps_per_dispatch=4)
        pre = Pretrainer(cfg).setup_data(synthetic_corpus(150, seed=2))
        first = next(iter(pre.train_iter))[0]
        pre.setup_state(first)
        history = pre.train(log=lambda *_: None)
        assert all(np.isfinite(h["train_loss"]) for h in history)
        assert "edges_per_sec" in history[0]
        assert os.path.exists(os.path.join(cfg.ckpt_dir, "metrics.jsonl"))


class TestYamlConfigs:
    def test_repo_configs_load(self):
        pc = pretrain_from_yaml("configs/pretrain.yaml")
        assert pc.batch_size == 512 and pc.warm_up == 10
        assert pc.model.num_layers == 5 and pc.model.emb_dim == 300
        assert pc.temperature == 0.1
        fc = finetune_from_yaml("configs/finetune.yaml")
        assert fc.task_name == "BBBP" and fc.init_base_lr == 1e-4
        assert fc.model.drop_ratio == 0.3
        assert fc.splitting == "scaffold"


class TestMetricWriter:
    def test_jsonl_and_tensorboard_files(self, tmp_path):
        from molclr_tpu.train.logging_util import MetricWriter

        w = MetricWriter(str(tmp_path), tensorboard=True)
        w.record({"epoch": 0, "train_loss": 1.5})
        w.scalars(0, train_loss=1.5, cosine_lr_decay=5e-4,
                  validation_loss=float("nan"))  # NaN must be skipped
        w.close()
        import json

        lines = (tmp_path / "metrics.jsonl").read_text().splitlines()
        assert json.loads(lines[0])["train_loss"] == 1.5
        tb = [f for f in tmp_path.iterdir()
              if "tfevents" in f.name]
        assert tb, "no TensorBoard event file written"
