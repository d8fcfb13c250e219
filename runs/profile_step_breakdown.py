"""Decompose the pretrain step time into augmentation / forward /
backward+Adam / resident-cache-gather components.

Each component is measured as the DIFFERENCE of marginal scan-step times
between nested variants of the step body (CLAUDE.md methodology: marginal
time between two lax.scan lengths, host readback as the barrier, bodies
carry a data dependency so XLA cannot hoist them):

    aug        = t(aug only)
    forward    = t(aug + 2x encoder fwd + loss) - t(aug only)
    bwd+Adam   = t(full step) - t(aug + fwd)
    gather     = t(cache-gather + aug) - t(aug only)

Usage:  python runs/profile_step_breakdown.py [--aug node] [--tile 256]
Numbers recorded in docs/DESIGN.md "Single-chip perf journal".
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(*a):
    print(*a, flush=True)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--aug", default="node")
    p.add_argument("--tile", type=int, default=256)
    p.add_argument("--bfs-stride", type=int, default=8)
    p.add_argument("--cache-batches", type=int, default=8)
    p.add_argument("--k1", type=int, default=16)
    p.add_argument("--k2", type=int, default=96)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--fused", choices=["auto", "on", "off"], default="auto",
                   help="fused Pallas GINE layers (ops/fused_layer.py)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from functools import partial

    import jax.numpy as jnp
    import numpy as np

    from molclr_tpu.data import featurize_smiles, pack_batch
    from molclr_tpu.data.augment import paired_augment
    from molclr_tpu.data.graphs import PackOverflow
    from molclr_tpu.data.loader import spec_for_graphs
    from molclr_tpu.data.synthetic import synthetic_corpus
    from molclr_tpu.losses import nt_xent_loss
    from molclr_tpu.models import MolCLRNet
    from molclr_tpu.train.optim import adam_torch
    from molclr_tpu.train.state import TrainState

    log(f"device: {jax.devices()[0]}")
    b = args.batch_size
    smiles = synthetic_corpus(b, seed=7)
    graphs = [g for g in (featurize_smiles(s) for s in smiles)
              if g is not None and g.max_degree <= 6][:b]
    spec = spec_for_graphs(graphs, len(graphs), slack=1.05, tile=args.tile)
    try:
        packed = pack_batch(graphs, spec)
    except PackOverflow:
        spec = spec_for_graphs(graphs, len(graphs), slack=1.05,
                               tile=args.tile, sizing="max")
        packed = pack_batch(graphs, spec)
    batch = jax.device_put(packed)
    n_nodes = int(np.asarray(batch.node_mask).sum())
    n_edges = int(np.asarray(batch.edge_mask).sum())
    log(f"batch: {len(graphs)} mols, {n_nodes} atoms, {n_edges} edges, "
        f"{spec}")

    from molclr_tpu.models import resolve_fused

    fused = resolve_fused({"auto": None, "on": True, "off": False}
                          [args.fused], "gin", args.tile)
    log(f"fused Pallas layers: {fused}")
    model = MolCLRNet(num_layers=5, emb_dim=300, gnn_type="gin",
                      dtype=jnp.bfloat16, tile=args.tile, fused=fused)
    variables = jax.device_put(
        model.init(jax.random.PRNGKey(0), batch, train=False))
    tx = adam_torch(5e-4, 1e-5)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]), step=0)

    def augment(rng):
        return paired_augment(batch, rng, args.aug, tile=args.tile,
                              bond_window=spec.max_graph_bonds,
                              bfs_stride=args.bfs_stride)

    def fwd_loss(params, batch_stats, rng):
        ra, ri, rj = jax.random.split(rng, 3)
        vi, vj = augment(ra)
        (_, zi), upd = model.apply(
            {"params": params, "batch_stats": batch_stats}, vi,
            train=True, rngs={"dropout": ri}, mutable=["batch_stats"])
        (_, zj), upd = model.apply(
            {"params": params, "batch_stats": upd["batch_stats"]}, vj,
            train=True, rngs={"dropout": rj}, mutable=["batch_stats"])
        return nt_xent_loss(zi.astype(jnp.float32), zj.astype(jnp.float32),
                            0.1, pair_mask=batch.graph_mask), \
            upd["batch_stats"]

    # ---- variant scan bodies -------------------------------------------
    # every body folds the loop index into the rng (data dependence) and
    # returns a scalar that depends on the computation (no dead code)
    def consume(*trees):
        # sum EVERY leaf so no part of the augmentation is dead code
        tot = jnp.float32(0.0)
        for t in trees:
            for leaf in jax.tree_util.tree_leaves(t):
                tot = tot + leaf.sum().astype(jnp.float32)
        return tot

    def body_aug(c, i):
        vi, vj = augment(jax.random.fold_in(jax.random.PRNGKey(1), i))
        return c + consume(vi, vj), None

    def body_fwd(c, i):
        loss, _ = fwd_loss(state.params, state.batch_stats,
                           jax.random.fold_in(jax.random.PRNGKey(1), i))
        return c + loss, None

    def full_step(s, i):
        rng = jax.random.fold_in(jax.random.PRNGKey(1), i)
        (loss, stats), grads = jax.value_and_grad(
            fwd_loss, has_aux=True)(s.params, s.batch_stats, rng)
        updates, opt_state = tx.update(grads, s.opt_state, s.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, s.params,
                                        updates)
        return TrainState(params=params, batch_stats=stats,
                          opt_state=opt_state, step=s.step + 1), loss

    # device-resident cache gather: stack C copies, gather batch idx per
    # step like Pretrainer._multi_step_resident does
    stack = jax.tree_util.tree_map(
        lambda x: jnp.stack([jnp.asarray(x)] * args.cache_batches),
        packed)
    stack = jax.device_put(stack)

    def body_gather(c, i):
        idx = jax.lax.rem(i, args.cache_batches)
        gathered = jax.tree_util.tree_map(lambda x: x[idx], stack)
        vi, vj = paired_augment(gathered,
                                jax.random.fold_in(jax.random.PRNGKey(1),
                                                   i),
                                args.aug, tile=args.tile,
                                bond_window=spec.max_graph_bonds,
                                bfs_stride=args.bfs_stride)
        return c + consume(vi, vj), None

    def marginal(make_scan):
        meds = {}
        for k in (args.k1, args.k2):
            _ = np.asarray(make_scan(k))
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                _ = np.asarray(make_scan(k))
                ts.append(time.perf_counter() - t0)
            meds[k] = float(np.median(ts))
        return (meds[args.k2] - meds[args.k1]) / (args.k2 - args.k1)

    times = {}

    for name, body in (("aug", body_aug), ("aug+fwd", body_fwd),
                       ("gather+aug", body_gather)):
        @partial(jax.jit, static_argnums=1)
        def scan_fn(c0, k, body=body):
            out, _ = jax.lax.scan(body, c0,
                                  jnp.arange(k, dtype=jnp.int32))
            return out

        times[name] = marginal(
            lambda k: scan_fn(jnp.float32(0.0), k))
        log(f"{name:12s} marginal {times[name]*1e3:7.3f} ms/step")

    @partial(jax.jit, static_argnums=1)
    def scan_full(s, k):
        s, losses = jax.lax.scan(full_step, s,
                                 jnp.arange(k, dtype=jnp.int32))
        return losses[-1]

    times["full"] = marginal(lambda k: scan_full(state, k))
    log(f"{'full step':12s} marginal {times['full']*1e3:7.3f} ms/step")

    log("\nbreakdown:")
    log(f"  augmentation : {times['aug']*1e3:7.3f} ms")
    log(f"  forward+loss : {(times['aug+fwd'] - times['aug'])*1e3:7.3f} ms")
    log(f"  bwd + Adam   : {(times['full'] - times['aug+fwd'])*1e3:7.3f} ms")
    log(f"  cache gather : "
        f"{(times['gather+aug'] - times['aug'])*1e3:7.3f} ms")
    log(f"  total step   : {times['full']*1e3:7.3f} ms "
        f"({2 * 5 * (n_edges + n_nodes) / times['full'] / 1e6:.1f}M "
        f"msg-edges/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
