"""Assemble the 100-epoch PubChem-10M campaign artifact
(runs/campaign10m_summary.json) from the Pretrainer's metrics JSONL:
loss/validation curves, LR schedule checkpoints (warm-up plateau, cosine
to EXACTLY 0 on the final step), the planned stop/resume seam, and
steady-state throughput. Run after part 2 completes."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    ckpt_dir = sys.argv[1] if len(sys.argv) > 1 else "runs/campaign10m"
    records = []
    with open(os.path.join(ckpt_dir, "metrics.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if "epoch" in r:
                records.append(r)
    # keep the LAST record per epoch (part-2 resume re-logs nothing, but
    # be robust to reruns)
    by_epoch = {}
    for r in records:
        by_epoch[r["epoch"]] = r
    epochs = sorted(by_epoch)
    assert epochs == list(range(100)), \
        f"expected epochs 0..99, got {epochs[:3]}...{epochs[-3:]}"
    losses = [by_epoch[e]["train_loss"] for e in epochs]
    valids = [by_epoch[e].get("valid_loss") for e in epochs]
    times = [by_epoch[e]["time_s"] for e in epochs]
    steps = by_epoch[0]["steps"]

    # schedule checks: warm-up plateau then cosine to 0 on the final step
    from molclr_tpu.train.optim import warmup_then_cosine

    sched = warmup_then_cosine(5e-4, steps, 100, 10)
    lr_first = float(sched(0))
    lr_warm_end = float(sched(10 * steps - 1))
    lr_final = float(sched(100 * steps - 1))
    lr_after = float(sched(100 * steps))

    import numpy as np

    steady = [t for t in times[1:] if t < 3 * min(times)]
    out = {
        "corpus": "data/corpus10m (10M molecules, 93.5M atoms)",
        "protocol": "reference config.yaml: 100 epochs x B=512, Adam "
                    "5e-4/wd 1e-5, warm-up 10 + cosine to 0, "
                    "NT-Xent T=0.1 cosine, GIN-5L/300/512 (bf16, "
                    "tile 256, narrow HBM-resident units)",
        "steps_per_epoch": steps,
        "total_optimizer_steps": 100 * steps,
        "train_loss": {"first": losses[0], "epoch10": losses[10],
                       "epoch50": losses[50], "final": losses[-1]},
        "valid_loss": {"first": valids[0], "final": valids[-1],
                       "best": min(v for v in valids if v is not None)},
        "monotone_tail": bool(losses[-1] == min(losses)),
        "steady_epoch_s": {"median": float(np.median(steady)),
                           "min": float(np.min(steady)),
                           "max": float(np.max(steady))},
        "edges_per_sec_wall": int(np.median(
            [by_epoch[e]["edges_per_sec"] for e in epochs[1:]])),
        "lr_schedule": {"warmup_lr": lr_first,
                        "end_of_warmup": lr_warm_end,
                        "final_step": lr_final,
                        "cosine_hits_zero": abs(lr_after) < 1e-12},
        "stop_resume_seam": {"part1_epochs": "0-54 (stop_after_epoch 55,"
                            " forced full-state checkpoint)",
                            "part2_epochs": "55-99 (--resume latest; "
                            "same baked cosine)"},
        "loss_curve": [round(x, 4) for x in losses],
        "valid_curve": [round(v, 4) if v is not None else None
                        for v in valids],
        "epoch_s": times,
    }
    with open("runs/campaign10m_summary.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("loss_curve", "valid_curve",
                                   "epoch_s")}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
