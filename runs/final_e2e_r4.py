"""End-of-round end-to-end refresh: the 50k-corpus CLI-equivalent
pretraining campaign under the final r4 stack (fresh tile-unit
compositions + batched augmentation + bf16 flag lookups), fresh vs
frozen, one TPU attach. Writes runs/final_e2e_r4.json."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    import numpy as np

    from molclr_tpu.data.synthetic import synthetic_corpus
    from molclr_tpu.train.config import ModelConfig, PretrainConfig
    from molclr_tpu.train.pretrain import Pretrainer

    out = {}
    smiles = synthetic_corpus(50_000, seed=3)
    for label, fresh in (("fresh", True), ("frozen", False)):
        log(f"[{label}] 10-epoch 50k run")
        cfg = PretrainConfig(
            batch_size=512, epochs=10, warm_up=2, aug="node",
            valid_size=0.02, seed=0, featurize_processes=2,
            eval_every_epochs=100, save_every_epochs=100,
            ckpt_dir=f"runs/final_e2e_{label}", fresh_compositions=fresh,
            model=ModelConfig(gnn_type="gin", num_layers=5, emb_dim=300,
                              feat_dim=512, tile=256, bf16=True))
        t0 = time.time()
        pre = Pretrainer(cfg).setup_data(smiles)
        pre.setup_state(next(iter(pre.train_iter))[0])
        history = pre.train(log=lambda *a: log("  ", *a))
        steady = [h for h in history[2:]]
        out[label] = {
            "wall_s": round(time.time() - t0, 1),
            "losses": [round(h["train_loss"], 4) for h in history],
            "epoch_s": [h["time_s"] for h in history],
            "steady_epoch_s": round(float(np.median(
                [h["time_s"] for h in steady])), 3),
            "steady_edges_per_s": round(float(np.median(
                [h["edges_per_sec"] for h in steady]))),
        }
        log(f"[{label}] steady epoch {out[label]['steady_epoch_s']} s, "
            f"{out[label]['steady_edges_per_s']/1e6:.1f}M edges/s, "
            f"final loss {out[label]['losses'][-1]}")
        with open("runs/final_e2e_r4.json", "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
