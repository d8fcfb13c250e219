"""Metric logging: JSONL (always) + TensorBoard scalars (optional).

TensorBoard tags match the reference's SummaryWriter usage so existing
dashboards carry over: train_loss / cosine_lr_decay / validation_loss
(ref molclr.py:116-118,139) and per-task valid metrics (finetune.py:242)."""

from __future__ import annotations

import json
import os


class MetricWriter:
    def __init__(self, run_dir: str, tensorboard: bool = False):
        os.makedirs(run_dir, exist_ok=True)
        self._jsonl = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(run_dir)
            except Exception:
                self._tb = None

    def scalars(self, step: int, **values) -> None:
        for name, v in values.items():
            if self._tb is not None and v == v:  # skip NaN for TB
                self._tb.add_scalar(name, float(v), step)

    def record(self, payload: dict) -> None:
        self._jsonl.write(json.dumps(payload) + "\n")
        self._jsonl.flush()

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class NullWriter:
    """Drop-in no-op MetricWriter for non-primary hosts (multi-process
    runs write metrics/checkpoints from process 0 only)."""

    def scalars(self, step: int, **values) -> None:
        pass

    def record(self, payload: dict) -> None:
        pass

    def close(self) -> None:
        pass
