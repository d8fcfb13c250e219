"""13-task MoleculeNet dress rehearsal on exact real schemas (VERDICT r4
next #6).

One command runs the COMPLETE fine-tune surface the way a user would run
it on the real CSVs, end to end:

  - fabricates, for every one of the 13 tasks (data/tasks.py TASKS — the
    reference's registry, finetune.py:401-491), a CSV with the EXACT
    target-column headers plus the real datasets' pathologies
    (write_task_csv(pathologies=True)): DeepChem-style metadata columns,
    per-column missing labels on the multi-task classification sets
    (different pattern per column -> the vmapped multi-target program
    must fall back to the reference's sequential per-target loop),
    fully-labeled regression sets (-> the vmapped path), unparseable
    SMILES rows, and the qm9 Hartree->eV unit conversion targets;
  - runs train.finetune.run_all_targets for each task with a 3-seed
    ensemble (the paper protocol's mean +- std over 3 runs);
  - verifies every task appended its experiments CSV rows in the
    reference convention (finetune.py:501-506: 'target,metric' append
    rows; ours add ',std' and ',synthetic=true' stamps) and that every
    row is stamped synthetic;
  - writes runs/dress_rehearsal.json with the full results table.

CPU-sized (tiny encoder, few epochs): this validates SURFACE and SCHEMA,
not quality — every row is stamped synthetic=true by construction.

Usage: python runs/dress_rehearsal.py [--data-root /tmp/dress] [--rows 150]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", default="/tmp/dress_rehearsal")
    p.add_argument("--rows", type=int, default=150)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--n-seeds", type=int, default=3)
    p.add_argument("--tasks", default=None,
                   help="comma list (default: all 13)")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from molclr_tpu.data.synthetic import write_task_csv
    from molclr_tpu.data.tasks import TASKS
    from molclr_tpu.train.config import FineTuneConfig, ModelConfig
    from molclr_tpu.train.finetune import run_all_targets

    tasks = (args.tasks.split(",") if args.tasks else list(TASKS))
    os.makedirs("runs", exist_ok=True)
    summary = {"tasks": {}, "rows": args.rows, "epochs": args.epochs,
               "n_seeds": args.n_seeds}
    t_all = time.time()
    for name in tasks:
        spec = TASKS[name]
        csv_path = os.path.join(args.data_root, spec.data_path)
        if not os.path.exists(csv_path):
            write_task_csv(csv_path, spec, n=args.rows, seed=7,
                           pathologies=True)
        cfg = FineTuneConfig(
            task_name=name, data_root=args.data_root,
            batch_size=32, epochs=args.epochs, n_seeds=args.n_seeds,
            seed=0, synthetic_fallback=False,   # the CSVs exist — and
            # must still be STAMPED via their _synthetic marker column
            ckpt_dir=os.path.join(args.data_root, "ckpt", name),
            model=ModelConfig(num_layers=2, emb_dim=32, feat_dim=64,
                              tile=0, drop_ratio=0.3))
        t0 = time.time()
        results = run_all_targets(cfg, log=lambda *_: None)
        dt = time.time() - t0
        n_tgt = len(spec.targets)
        assert len(results) == n_tgt, (name, len(results), n_tgt)
        for r in results:
            assert r.get("synthetic"), \
                f"{name}/{r['target']}: missing synthetic stamp"
            assert r["metric_name"] == spec.metric
        # experiments CSV conformance (reference finetune.py:501-506)
        exp = os.path.join("experiments", f"scratch_{name}_finetune.csv")
        assert os.path.exists(exp), exp
        import csv as _csv

        with open(exp, newline="") as f:
            rows = [r for r in _csv.reader(f) if r]
        tail = rows[-n_tgt:]
        tgts = [r[0] for r in tail]
        assert tgts == [r["target"] for r in results], (name, tgts)
        for r in tail:
            float(r[1])                           # target,metric
            assert r[-1] == "synthetic=true", r
            if args.n_seeds > 1:
                float(r[2])                       # ,std
        summary["tasks"][name] = {
            "targets": n_tgt,
            "metric": spec.metric,
            "seconds": round(dt, 1),
            "results": [{"target": r["target"],
                         "test_metric": round(float(r["test_metric"]), 4),
                         **({"test_std": round(float(r["test_std"]), 4)}
                            if "test_std" in r else {})}
                        for r in results],
        }
        print(f"[{name}] {n_tgt} target(s) x {args.n_seeds} seeds in "
              f"{dt:.1f}s -> {exp} OK", flush=True)
    summary["total_seconds"] = round(time.time() - t_all, 1)
    with open("runs/dress_rehearsal.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(f"ALL {len(tasks)} TASKS OK in {summary['total_seconds']}s; "
          f"summary -> runs/dress_rehearsal.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
