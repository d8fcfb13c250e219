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
                             synthetic_n=250, synthetic_fallback=True, seed=0,
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
            epochs=2, synthetic_n=200, synthetic_fallback=True, seed=0,
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

    def test_verbatim_reference_yaml_keys(self, tmp_path):
        """A user's unmodified reference config.yaml / config_finetune.yaml
        must map every key (ref config.yaml:1-31, config_finetune.yaml:1-28;
        `gpu` and `num_workers` are host-environment knobs)."""
        (tmp_path / "p.yaml").write_text(
            "batch_size: 256\nwarm_up: 7\nepochs: 40\n"
            "load_model: None\neval_every_n_epochs: 2\n"
            "save_every_n_epochs: 3\nlog_every_n_steps: 25\n"
            "fp16_precision: True\ninit_lr: 0.0005\nweight_decay: 1e-5\n"
            "gpu: cuda:0\nmodel_type: gcn\n"
            "model:\n  num_layer: 4\n  emb_dim: 128\n  feat_dim: 256\n"
            "  drop_ratio: 0\n  pool: mean\n"
            "aug: subgraph\n"
            "dataset:\n  num_workers: 12\n  valid_size: 0.07\n"
            "  data_path: data/pubchem-10m-clean.txt\n"
            "loss:\n  temperature: 0.2\n  use_cosine_similarity: True\n")
        pc = pretrain_from_yaml(str(tmp_path / "p.yaml"))
        assert pc.eval_every_epochs == 2 and pc.save_every_epochs == 3
        assert pc.log_every_steps == 25
        assert pc.model.bf16 is True          # fp16_precision -> bf16
        assert pc.model.gnn_type == "gcn" and pc.model.num_layers == 4
        assert pc.aug == "subgraph" and pc.valid_size == 0.07
        assert pc.featurize_processes == 12
        assert pc.data_path == "data/pubchem-10m-clean.txt"
        assert pc.temperature == 0.2 and pc.resume_from == ""

        (tmp_path / "f.yaml").write_text(
            "batch_size: 16\nepochs: 30\neval_every_n_epochs: 1\n"
            "fine_tune_from: pretrained_gin\nlog_every_n_steps: 10\n"
            "fp16_precision: False\ninit_lr: 0.0005\ninit_base_lr: 0.0002\n"
            "weight_decay: 1e-6\ngpu: cuda:1\ntask_name: SIDER\n"
            "model_type: gin\n"
            "model:\n  num_layer: 5\n  emb_dim: 300\n  feat_dim: 512\n"
            "  drop_ratio: 0.3\n  pool: mean\n"
            "dataset:\n  num_workers: 4\n  valid_size: 0.1\n"
            "  test_size: 0.1\n  splitting: scaffold\n")
        fc = finetune_from_yaml(str(tmp_path / "f.yaml"))
        assert fc.task_name == "SIDER" and fc.init_base_lr == 2e-4
        assert fc.log_every_steps == 10 and fc.model.bf16 is False
        assert fc.pretrained == "pretrained_gin"

    def test_resolve_pretrained_reference_layout(self, tmp_path,
                                                 monkeypatch):
        """`fine_tune_from: <name>` resolves like the reference
        (finetune.py:249: ./ckpt/<name>/checkpoints/model.pth), and Orbax
        checkpoint dirs resolve to their newest step."""
        from molclr_tpu.train.checkpoints import resolve_pretrained

        monkeypatch.chdir(tmp_path)
        pth = tmp_path / "ckpt" / "pretrained_gin" / "checkpoints"
        pth.mkdir(parents=True)
        (pth / "model.pth").write_bytes(b"x")
        assert resolve_pretrained("pretrained_gin") == os.path.join(
            "ckpt", "pretrained_gin", "checkpoints", "model.pth")

        run = tmp_path / "runs" / "pre"
        (run / "step_5").mkdir(parents=True)
        (run / "step_40").mkdir()
        assert resolve_pretrained(str(run)) == str(run / "step_40")
        # explicit paths pass through untouched
        assert resolve_pretrained(str(run / "step_5")) == str(run / "step_5")
        assert resolve_pretrained("") == ""


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


class TestExperimentsCsvSchema:
    """Experiments CSV conformance with the reference convention
    (finetune.py:501-506, pandas to_csv append): target,metric[,std]
    [,synthetic=true] rows, with pandas-style quoting for targets that
    THEMSELVES contain commas (SIDER's 'Neoplasms benign, malignant and
    unspecified (incl cysts and polyps)' — a bare join corrupted these,
    caught by runs/dress_rehearsal.py)."""

    def test_comma_bearing_target_roundtrips(self, tmp_path, monkeypatch):
        import csv

        from molclr_tpu.train.config import FineTuneConfig
        from molclr_tpu.train.finetune import _append_experiments_csv

        monkeypatch.chdir(tmp_path)
        cfg = FineTuneConfig(task_name="SIDER", pretrained="")
        tgt = ("Neoplasms benign, malignant and unspecified "
               "(incl cysts and polyps)")
        _append_experiments_csv(cfg, [
            {"target": tgt, "test_metric": 0.75, "test_std": 0.01,
             "synthetic": True},
            {"target": "Cardiac disorders", "test_metric": 0.5},
        ])
        with open(tmp_path / "experiments"
                  / "scratch_SIDER_finetune.csv", newline="") as f:
            rows = [r for r in csv.reader(f) if r]
        assert rows[0] == [tgt, "0.75", "0.01", "synthetic=true"]
        assert rows[1] == ["Cardiac disorders", "0.5"]

    def test_pathological_task_csv_schema(self, tmp_path):
        """write_task_csv(pathologies=True): exact target headers, the
        _synthetic marker, per-column missing labels ONLY on multi-task
        classification (so regression keeps coinciding rows for the
        vmapped multi-target program), and unparseable SMILES rows that
        the reader drops."""
        import csv

        from molclr_tpu.data.loader import read_task_csv
        from molclr_tpu.data.synthetic import write_task_csv
        from molclr_tpu.data.tasks import TASKS

        spec = TASKS["ClinTox"]
        path = str(tmp_path / "clintox.csv")
        write_task_csv(path, spec, n=150, seed=3, pathologies=True)
        with open(path, newline="") as f:
            header = next(csv.reader(f))
        assert header == ["mol_id", "name", "smiles", "_synthetic",
                          *spec.targets]
        rows = {}
        for t in spec.targets:
            smiles, labels = read_task_csv(path, t, spec.task)
            rows[t] = smiles
            assert len(labels) == len(smiles) > 0
        # per-column missing patterns differ -> row sets differ
        assert rows[spec.targets[0]] != rows[spec.targets[1]]

        rspec = TASKS["qm8"]
        rpath = str(tmp_path / "qm8.csv")
        write_task_csv(rpath, rspec, n=80, seed=3, pathologies=True)
        rrows = [read_task_csv(rpath, t, rspec.task)[0]
                 for t in rspec.targets[:3]]
        assert rrows[0] == rrows[1] == rrows[2]   # fully labeled
