"""Contrastive pretraining CLI (replaces `python molclr.py`,
ref molclr.py:180-199)."""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="molclr-pretrain",
        description="MolCLR contrastive pretraining on TPU (JAX)")
    p.add_argument("--config", default="configs/pretrain.yaml",
                   help="YAML config (reference config.yaml keys accepted)")
    p.add_argument("--data", default=None, help="override corpus path")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--aug", choices=["node", "subgraph", "mix"], default=None)
    p.add_argument("--model", choices=["gin", "gcn"], default=None)
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--steps-per-dispatch", type=int, default=None,
                   help="train steps folded into one device dispatch "
                        "(0 = auto: 8 while streaming, the whole epoch "
                        "once the batch cache is device-resident)")
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace of epoch 0's first "
                        "dispatches here")
    p.add_argument("--resume", default=None, metavar="PATH|latest",
                   help="resume from a checkpoint; 'latest' picks the "
                        "newest full-state checkpoint in --ckpt-dir")
    p.add_argument("--device-cache-mb", type=int, default=None,
                   help="HBM budget for the resident batch cache "
                        "(0 = keep batches host-side)")
    p.add_argument("--pack-cache-max-mols", type=int, default=None,
                   help="corpora up to this size are eligible for the "
                        "resident unit/batch caches (default 500k; raise "
                        "for device-bound PubChem-10M epochs — the "
                        "narrow unit stack fits one v5e's HBM)")
    p.add_argument("--narrow-cache", choices=["auto", "on", "off"],
                   default=None,
                   help="store the resident tile-unit stack in narrow "
                        "wire dtypes (~2.4x fewer HBM bytes, faster row "
                        "takes, identical numerics). auto/on = whenever "
                        "the unit spec fits the narrow dtypes; off = "
                        "full width")
    p.add_argument("--valid-size", type=float, default=None,
                   help="validation fraction (reference 0.05; large "
                        "corpora want less — validation batches stream "
                        "host-side every eval epoch)")
    p.add_argument("--eval-every", type=int, default=None,
                   help="validate every N epochs")
    p.add_argument("--save-every", type=int, default=None,
                   help="periodic full-state checkpoint every N epochs")
    p.add_argument("--warm-up", type=int, default=None)
    p.add_argument("--replan-units-every", type=int, default=None,
                   help="re-plan the resident tile-units from a fresh "
                        "molecule shuffle every N epochs (dissolves "
                        "within-unit co-batching; costs one host repack "
                        "+ upload per replan)")
    p.add_argument("--stop-after-epoch", type=int, default=None,
                   help="break after this many epochs WITHOUT changing "
                        "the baked --epochs schedule (forces a full-state "
                        "checkpoint; --resume latest continues the same "
                        "cosine to --epochs)")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--synthetic", type=int, default=0, metavar="N",
                   help="generate an N-molecule synthetic corpus if the "
                        "data path is missing")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend")
    p.add_argument("--distributed", action="store_true",
                   help="initialize jax.distributed (multi-host pod run; "
                        "pair with --data-axis in the config). Coordinator/"
                        "process ids autodetect from the TPU environment "
                        "or the --dist-* flags")
    p.add_argument("--dist-coordinator", default=None,
                   metavar="HOST:PORT")
    p.add_argument("--dist-nproc", type=int, default=None)
    p.add_argument("--dist-procid", type=int, default=None)
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.distributed or args.dist_coordinator:
        # must run before any device use; each process then featurizes
        # only its corpus slice (train/pretrain.py _process_shard) and the
        # DP mesh spans all processes' devices
        from molclr_tpu.parallel import init_distributed

        init_distributed(args.dist_coordinator, args.dist_nproc,
                         args.dist_procid)

    from molclr_tpu.train.config import PretrainConfig, pretrain_from_yaml
    from molclr_tpu.train.pretrain import Pretrainer

    cfg = (pretrain_from_yaml(args.config) if os.path.exists(args.config)
           else PretrainConfig())
    if args.data:
        cfg.data_path = args.data
    if args.epochs is not None:
        cfg.epochs = args.epochs
    if args.batch_size is not None:
        cfg.batch_size = args.batch_size
    if args.aug:
        cfg.aug = args.aug
    if args.model:
        cfg.model.gnn_type = args.model
    if args.ckpt_dir:
        cfg.ckpt_dir = args.ckpt_dir
    if args.steps_per_dispatch is not None:
        cfg.steps_per_dispatch = args.steps_per_dispatch
    if args.device_cache_mb is not None:
        cfg.device_cache_mb = args.device_cache_mb
    if args.pack_cache_max_mols is not None:
        cfg.pack_cache_max_mols = args.pack_cache_max_mols
    if args.narrow_cache is not None:
        cfg.narrow_cache = args.narrow_cache
    if args.valid_size is not None:
        cfg.valid_size = args.valid_size
    if args.eval_every is not None:
        cfg.eval_every_epochs = args.eval_every
    if args.save_every is not None:
        cfg.save_every_epochs = args.save_every
    if args.warm_up is not None:
        cfg.warm_up = args.warm_up
    if args.stop_after_epoch is not None:
        cfg.stop_after_epochs = args.stop_after_epoch
    if args.replan_units_every is not None:
        cfg.replan_units_every = args.replan_units_every
    if args.seed is not None:
        cfg.seed = args.seed
    if args.profile_dir:
        cfg.profile_dir = args.profile_dir
    if args.resume:
        if args.resume == "latest":
            from molclr_tpu.train.checkpoints import latest_checkpoint

            latest = latest_checkpoint(cfg.ckpt_dir)
            if latest is None:
                print(f"no checkpoint under {cfg.ckpt_dir}; "
                      "starting from scratch")
            else:
                cfg.resume_from = latest
        else:
            cfg.resume_from = args.resume

    if args.synthetic:
        # size-keyed corpus path so different --synthetic N don't silently
        # reuse a smaller cached corpus (unless --data names one explicitly)
        if not args.data:
            root, ext = os.path.splitext(cfg.data_path)
            cfg.data_path = f"{root}_{args.synthetic}{ext}"
        if not os.path.exists(cfg.data_path):
            from molclr_tpu.data.synthetic import write_pretrain_corpus

            print(f"generating synthetic corpus ({args.synthetic} "
                  f"molecules) -> {cfg.data_path}")
            write_pretrain_corpus(cfg.data_path, args.synthetic,
                                  seed=cfg.seed)

    print(f"devices: {jax.devices()}")
    pre = Pretrainer(cfg).setup_data()
    first = next(iter(pre.train_iter))[0]
    print(f"bucket: {pre.spec}")
    pre.setup_state(first)
    pre.train()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
