"""Batch inference CLI: encode SMILES into embedding vectors.

A serving-path capability the reference lacks: load a pretrained encoder
(torch .pth or Orbax checkpoint), featurize an input corpus, and write the
pooled molecular embeddings (feat_lin output, the representation the
reference returns as `h`) as .npy, with a sidecar .txt of the kept SMILES.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="molclr-embed")
    p.add_argument("input", help="SMILES file (one per line / CSV last col)")
    p.add_argument("output", help="output .npy path ([n, feat_dim] fp32)")
    p.add_argument("--checkpoint", required=True,
                   help="torch .pth or Orbax checkpoint dir")
    p.add_argument("--model", choices=["gin", "gcn"], default="gin")
    p.add_argument("--layers", type=int, default=5)
    p.add_argument("--emb-dim", type=int, default=300)
    p.add_argument("--feat-dim", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--tile", type=int, default=256,
                   help="tile-dense aggregation tile size (0 = ELL gathers)")
    p.add_argument("--projection", action="store_true",
                   help="emit the contrastive projection z instead of h")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from molclr_tpu.data.graphs import pack_batch
    from molclr_tpu.data.loader import (
        featurize_many,
        read_pretrain_smiles,
        spec_for_graphs,
    )
    from molclr_tpu.models import MolCLRNet
    from molclr_tpu.train import checkpoints as ckpt_lib

    smiles = read_pretrain_smiles(args.input)
    graphs, kept = featurize_many(smiles)
    if args.tile:
        over = [i for g, i in zip(graphs, kept) if g.n_atoms > args.tile]
        if over:
            print(f"skipping {len(over)} molecules larger than the "
                  f"{args.tile}-atom tile (e.g. input row {over[0]})")
            keep = [(g, i) for g, i in zip(graphs, kept)
                    if g.n_atoms <= args.tile]
            graphs = [g for g, _ in keep]
            kept = [i for _, i in keep]
    if not graphs:
        p.error("no featurizable molecules in input")
    print(f"{len(graphs)}/{len(smiles)} molecules featurized")

    model = MolCLRNet(gnn_type=args.model, num_layers=args.layers,
                      emb_dim=args.emb_dim, feat_dim=args.feat_dim,
                      tile=args.tile)
    # sizing='max': embed packs SEQUENTIAL chunks (no shuffle, no
    # drop-retry), so capacity must fit any batch_size-subset exactly
    spec = spec_for_graphs(graphs, min(args.batch_size, len(graphs)),
                           tile=args.tile, sizing="max")
    example = pack_batch(graphs[: spec.n_graphs], spec)
    variables = model.init(jax.random.PRNGKey(0), example, train=False)
    params, stats = variables["params"], variables.get("batch_stats", {})
    if args.checkpoint.endswith(".pth"):
        ip, istats = ckpt_lib.import_torch_params(
            ckpt_lib.load_torch_state_dict(args.checkpoint),
            gnn_type=args.model)
    else:
        restored = ckpt_lib.load_checkpoint(args.checkpoint, None)
        ip = restored.get("params", restored)
        istats = restored.get("batch_stats", {})
    tstats: dict = {}
    params = ckpt_lib.transfer_params(ip, params, stats=tstats)
    stats = ckpt_lib.transfer_params(istats, stats)
    print(f"transferred {tstats['copied']} param leaves "
          f"({len(tstats['skipped'])} skipped)")
    if tstats["copied"] == 0:
        p.error(
            "checkpoint transferred ZERO parameters — architecture "
            "mismatch? Pass --layers/--emb-dim/--feat-dim matching the "
            f"checkpoint. First skipped paths: {tstats['skipped'][:4]}")
    if tstats["skipped"]:
        import sys

        print(f"WARNING: {len(tstats['skipped'])} leaves skipped (shape "
              f"mismatch?) e.g. {tstats['skipped'][:3]} — embeddings may "
              f"come from partially random weights", file=sys.stderr)

    @jax.jit
    def encode(batch):
        h, z = model.apply({"params": params, "batch_stats": stats}, batch,
                           train=False)
        return z if args.projection else h

    out = []
    for lo in range(0, len(graphs), spec.n_graphs):
        chunk = graphs[lo : lo + spec.n_graphs]
        emb = np.asarray(encode(pack_batch(chunk, spec)))
        out.append(emb[: len(chunk)])
    embeddings = np.concatenate(out).astype(np.float32)
    np.save(args.output, embeddings)
    side = os.path.splitext(args.output)[0] + ".smiles.txt"
    with open(side, "w") as f:
        for i in kept:
            f.write(smiles[i] + "\n")
    print(f"wrote {embeddings.shape} embeddings -> {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
