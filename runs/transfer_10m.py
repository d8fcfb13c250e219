"""Transfer validation from the 100-epoch PubChem-10M campaign
checkpoint (runs/campaign10m/best): low-data synthetic FreeSolv,
warm-started vs from scratch, 3-seed ensembles on the SAME CSV/splits —
the round-4 runs/transfer_lowdata protocol re-run against the
reference-scale pretrained encoder (ref molclr.py pretrain ->
finetune.py fine_tune_from).

CPU-sized; labels are synthetic (structure-derived logP-like scores),
so this validates the TRANSFER PLUMBING and the low-data gain
direction, not MoleculeNet quality (no real CSVs in this environment).

Usage: python runs/transfer_10m.py [--ckpt runs/campaign10m/best]
Writes runs/transfer_10m.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="runs/campaign10m/best")
    p.add_argument("--rows", type=int, default=250)
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--n-seeds", type=int, default=3)
    p.add_argument("--data-root", default="/tmp/transfer_10m")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from molclr_tpu.data.synthetic import write_task_csv
    from molclr_tpu.data.tasks import TASKS
    from molclr_tpu.train.config import FineTuneConfig
    from molclr_tpu.train.finetune import run_all_targets

    task = TASKS["FreeSolv"]
    csv_path = os.path.join(args.data_root, task.data_path)
    if not os.path.exists(csv_path):
        write_task_csv(csv_path, task, n=args.rows, seed=7)

    out = {"ckpt": args.ckpt, "rows": args.rows, "epochs": args.epochs,
           "n_seeds": args.n_seeds, "task": "FreeSolv (synthetic)"}
    for arm, pretrained in (("scratch", ""), ("warm", args.ckpt)):
        cfg = FineTuneConfig(
            task_name="FreeSolv", data_root=args.data_root,
            epochs=args.epochs, n_seeds=args.n_seeds,
            pretrained=pretrained, synthetic_fallback=True,
            ckpt_dir=f"/tmp/transfer_10m_ckpt_{arm}")
        res = run_all_targets(cfg, log=lambda *a: print(arm, *a,
                                                       flush=True))
        (r,) = res
        out[arm] = {"test_rmse": r["test_metric"],
                    "test_std": r.get("test_std")}
        print(f"{arm}: RMSE {r['test_metric']:.4f} "
              f"+- {r.get('test_std') or 0:.4f}", flush=True)

    out["gain"] = out["scratch"]["test_rmse"] - out["warm"]["test_rmse"]
    with open("runs/transfer_10m.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
