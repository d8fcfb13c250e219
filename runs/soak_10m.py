"""PubChem-scale cold-start soak (VERDICT r3 missing #4): stream N epochs
of pretraining from the 10M-molecule on-disk corpus (built by
cli.featurize — constant-RAM, memory-mapped) and record steady-state
epoch time, throughput and the process RSS ceiling.

Usage: python runs/soak_10m.py [--corpus data/corpus10m] [--epochs 2]
Writes runs/soak_10m.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class RssTracker(threading.Thread):
    def __init__(self):
        super().__init__(daemon=True)
        self.max_mb = 0.0
        self._stop = False

    def run(self):
        while not self._stop:
            try:
                with open("/proc/self/status") as f:
                    for line in f:
                        if line.startswith("VmRSS"):
                            self.max_mb = max(self.max_mb,
                                              int(line.split()[1]) / 1024)
            except OSError:
                pass
            time.sleep(1.0)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", default="data/corpus10m")
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--resident", action="store_true",
                   help="device-bound epochs: pack the corpus into the "
                        "narrow tile-unit stack and keep it HBM-resident "
                        "(one-time pack+upload; epochs then move only "
                        "index matrices over the wire) instead of "
                        "streaming batches per step")
    p.add_argument("--device-cache-mb", type=int, default=None)
    p.add_argument("--steps-per-dispatch", type=int, default=None)
    p.add_argument("--out", default="runs/soak_10m.json")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from molclr_tpu.train.config import ModelConfig, PretrainConfig
    from molclr_tpu.train.pretrain import Pretrainer

    tracker = RssTracker()
    tracker.start()

    cfg = PretrainConfig(
        data_path=args.corpus, batch_size=args.batch_size,
        epochs=args.epochs, warm_up=1, aug="node", valid_size=0.001,
        seed=0, eval_every_epochs=100, save_every_epochs=100,
        ckpt_dir="runs/soak10m_ckpt", log_every_steps=2000,
        model=ModelConfig(gnn_type="gin", num_layers=5, emb_dim=300,
                          feat_dim=512, tile=256, bf16=True))
    if args.resident:
        # narrow HBM-resident unit stack (VERDICT r4 weak #1): ~8 GB of
        # int8/int16 units for the full 10M corpus on one v5e
        cfg.pack_cache_max_mols = 20_000_000
        cfg.device_cache_mb = 13_000
        cfg.steps_per_dispatch = 256   # bounds the per-dispatch aug
                                       # precompute deltas (~65 MB)
    if args.device_cache_mb is not None:
        cfg.device_cache_mb = args.device_cache_mb
    if args.steps_per_dispatch is not None:
        cfg.steps_per_dispatch = args.steps_per_dispatch
    t0 = time.time()
    pre = Pretrainer(cfg).setup_data()
    setup_s = time.time() - t0
    n_train = len(pre.train_iter.graphs)
    log(f"setup {setup_s:.1f}s, train mols {n_train}, "
        f"steps/epoch {len(pre.train_iter)}")
    pre.setup_state(next(iter(pre.train_iter))[0])
    t1 = time.time()
    history = pre.train(log=lambda *a: log(*a))
    train_s = time.time() - t1
    tracker._stop = True

    out = {
        "mode": "resident" if args.resident else "streamed",
        "units_active": pre._unit_stack is not None,
        "narrow": isinstance(pre._unit_stack, dict),
        "device_cache_used_mb": round(pre._device_cache_used_mb, 1),
        "corpus": args.corpus,
        "n_train_mols": n_train,
        "steps_per_epoch": len(pre.train_iter),
        "setup_s": round(setup_s, 1),
        "train_s": round(train_s, 1),
        "epoch_s": [h["time_s"] for h in history],
        "edges_per_sec": [h["edges_per_sec"] for h in history],
        "train_loss": [round(h["train_loss"], 4) for h in history],
        "max_rss_mb": round(tracker.max_mb, 1),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
