"""Round-4 one-attach TPU experiment matrix (relay-lease rule: every
measurement in ONE process).

  A. step-variant marginal times (GIN-5L/node/tile-256/B=512, bf16):
       base (optax-chain Adam) / fused Adam / aug='none' / both
       + aug-only scan (standalone augmentation cost)
  B. NT-Xent impls INSIDE the real train step at simulated pod-scale
     global batches (B=2048 -> 2B=4096, B=4096 -> 2B=8192): XLA closed
     form vs the fused Pallas kernel (VERDICT r3 weak #1 bench ask).
  C. fresh-vs-frozen batch compositions: two 30-epoch Pretrainer runs on
     a 50k corpus (identical config, fresh_compositions on/off) — final
     losses + steady-state epoch times (VERDICT r3 missing #2 ablation).

Writes runs/r4_experiments.json; all diagnostics to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


RESULTS: dict = {}
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r4_experiments.json")


def save():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=2)


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU smoke test of the harness itself")
    args = ap.parse_args()

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from molclr_tpu.data import featurize_smiles, pack_batch
    from molclr_tpu.data.augment import paired_augment
    from molclr_tpu.data.graphs import PackOverflow
    from molclr_tpu.data.loader import spec_for_graphs
    from molclr_tpu.data.synthetic import synthetic_corpus
    from molclr_tpu.losses import nt_xent_loss
    from molclr_tpu.models import MolCLRNet, resolve_fused
    from molclr_tpu.ops.pallas_ntxent import nt_xent_pallas
    from molclr_tpu.train.optim import adam_torch, adam_torch_fused
    from molclr_tpu.train.state import TrainState

    dev = jax.devices()[0]
    log(f"device: {dev}")
    RESULTS["device"] = str(dev)
    TILE = 32 if args.smoke else 256
    K1, K2, REPS = (2, 4, 1) if args.smoke else (16, 96, 5)
    B_MAIN = 32 if args.smoke else 512
    B_BIG = (64,) if args.smoke else (2048, 4096)
    N_CORPUS = 600 if args.smoke else 50_000
    N_EPOCHS = 3 if args.smoke else 30
    LAYERS = 2 if args.smoke else 5

    def build_batch(b, seed=7):
        smiles = synthetic_corpus(b, seed=seed)
        graphs = [g for g in (featurize_smiles(s) for s in smiles)
                  if g is not None and g.max_degree <= 6][:b]
        spec = spec_for_graphs(graphs, len(graphs), slack=1.05, tile=TILE)
        try:
            packed = pack_batch(graphs, spec)
        except PackOverflow:
            spec = spec_for_graphs(graphs, len(graphs), slack=1.05,
                                   tile=TILE, sizing="max")
            packed = pack_batch(graphs, spec)
        batch = jax.device_put(packed)
        n_nodes = int(np.asarray(batch.node_mask).sum())
        n_edges = int(np.asarray(batch.edge_mask).sum())
        return batch, spec, len(graphs), n_edges + n_nodes

    def marginal(multi_step, state0, k1=K1, k2=K2, reps=REPS):
        rng = jax.random.PRNGKey(1)
        meds = {}
        state = state0          # donated on first use; carry thereafter
        for k in (k1, k2):
            t0 = time.time()
            state, out = multi_step(state, rng, k)
            _ = np.asarray(out)
            log(f"  K={k}: compile+run {time.time() - t0:.1f}s")
            ts = []
            for i in range(reps):
                t0 = time.perf_counter()
                state, out = multi_step(state,
                                        jax.random.fold_in(rng, i), k)
                _ = np.asarray(out)
                ts.append(time.perf_counter() - t0)
            meds[k] = float(np.median(ts))
        dt = (meds[k2] - meds[k1]) / (k2 - k1)
        return dt if dt > 0 else meds[k2] / k2

    def make_step(batch, spec, *, adam="chain", aug="node",
                  ntxent="xla", layers=None):
        layers = LAYERS if layers is None else layers
        fused = resolve_fused(None, "gin", TILE)
        model = MolCLRNet(num_layers=layers, emb_dim=300, gnn_type="gin",
                          dtype=jnp.bfloat16, tile=TILE, fused=fused)
        variables = jax.device_put(
            model.init(jax.random.PRNGKey(0), batch, train=False))
        tx = (adam_torch_fused if adam == "fused" else adam_torch)(
            5e-4, 1e-5)
        state = TrainState(params=variables["params"],
                           batch_stats=variables.get("batch_stats", {}),
                           opt_state=tx.init(variables["params"]), step=0)
        loss_impl = (partial(nt_xent_pallas, interpret=args.smoke)
                     if ntxent == "pallas" else nt_xent_loss)

        def loss_fn(params, batch_stats, rng):
            ra, ri, rj = jax.random.split(rng, 3)
            vi, vj = paired_augment(batch, ra, aug, tile=TILE,
                                    bond_window=spec.max_graph_bonds)
            (_, zi), upd = model.apply(
                {"params": params, "batch_stats": batch_stats}, vi,
                train=True, rngs={"dropout": ri}, mutable=["batch_stats"])
            (_, zj), upd = model.apply(
                {"params": params, "batch_stats": upd["batch_stats"]}, vj,
                train=True, rngs={"dropout": rj}, mutable=["batch_stats"])
            return loss_impl(zi.astype(jnp.float32),
                             zj.astype(jnp.float32), 0.1, True,
                             pair_mask=batch.graph_mask), \
                upd["batch_stats"]

        def one_step(state, rng):
            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.batch_stats,
                                       rng)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = jax.tree_util.tree_map(lambda p, u: p + u,
                                            state.params, updates)
            return TrainState(params=params, batch_stats=stats,
                              opt_state=opt_state,
                              step=state.step + 1), loss

        @partial(jax.jit, static_argnums=2, donate_argnums=0)
        def multi_step(state, rng, k):
            def body(s, i):
                return one_step(s, jax.random.fold_in(rng, i))
            return jax.lax.scan(body, state,
                                jnp.arange(k, dtype=jnp.int32))

        return multi_step, state

    # ---- A. step variants at B=512 ----
    batch, spec, b_real, msg_edges = build_batch(B_MAIN)
    edges_per_step = 2 * LAYERS * msg_edges
    RESULTS["A_step_variants"] = {}
    for label, kw in [
        ("base_chain", dict(adam="chain", aug="node")),
        ("adam_fused", dict(adam="fused", aug="node")),
        ("aug_none_chain", dict(adam="chain", aug="none")),
        ("aug_none_adam_fused", dict(adam="fused", aug="none")),
    ]:
        log(f"[A] {label}")
        ms, st = make_step(batch, spec, **kw)
        dt = marginal(ms, st)
        RESULTS["A_step_variants"][label] = {
            "step_ms": round(dt * 1e3, 4),
            "edges_per_s": round(edges_per_step / dt, 1)}
        log(f"[A] {label}: {dt*1e3:.3f} ms "
            f"({edges_per_step/dt/1e6:.1f}M edges/s)")
        save()

    # aug-only scan: paired_augment consumed by a cheap reduction
    def make_aug_only():
        @partial(jax.jit, static_argnums=1)
        def aug_multi(rng, k):
            def body(c, i):
                vi, vj = paired_augment(batch, jax.random.fold_in(rng, i),
                                        "node", tile=TILE,
                                        bond_window=spec.max_graph_bonds)
                s = (vi.atom_type.sum() + vj.atom_type.sum()
                     + vi.nbr_mask.sum() + vj.nbr_mask.sum()
                     + vi.edge_mask.sum() + vj.edge_mask.sum())
                return c + s, ()
            return jax.lax.scan(body, jnp.zeros((), jnp.int32),
                                jnp.arange(k, dtype=jnp.int32))[0]
        return aug_multi

    log("[A] aug_only")
    aug_multi = make_aug_only()
    rng = jax.random.PRNGKey(2)
    meds = {}
    for k in (K1, K2):
        _ = np.asarray(aug_multi(rng, k))
        ts = []
        for i in range(REPS):
            t0 = time.perf_counter()
            _ = np.asarray(aug_multi(jax.random.fold_in(rng, i), k))
            ts.append(time.perf_counter() - t0)
        meds[k] = float(np.median(ts))
    dt = max((meds[K2] - meds[K1]) / (K2 - K1), 0.0)
    RESULTS["A_step_variants"]["aug_only_paired"] = {
        "step_ms": round(dt * 1e3, 4)}
    log(f"[A] aug_only paired: {dt*1e3:.3f} ms")
    save()

    # ---- B. NT-Xent impls inside the step at big B ----
    RESULTS["B_ntxent_in_step"] = {}
    for b_big in B_BIG:
        big_batch, big_spec, _, big_msg = build_batch(b_big, seed=11)
        for impl in ("xla", "pallas"):
            label = f"B{b_big}_{impl}"
            log(f"[B] {label}")
            ms, st = make_step(big_batch, big_spec, adam="chain",
                               aug="node", ntxent=impl)
            dt = marginal(ms, st, k1=4, k2=16, reps=3)
            RESULTS["B_ntxent_in_step"][label] = {
                "step_ms": round(dt * 1e3, 4),
                "edges_per_s": round(2 * LAYERS * big_msg / dt, 1)}
            log(f"[B] {label}: {dt*1e3:.3f} ms")
            save()
        del big_batch

    # ---- C. fresh vs frozen compositions, 30 epochs on 50k ----
    from molclr_tpu.train.config import ModelConfig, PretrainConfig
    from molclr_tpu.train.pretrain import Pretrainer

    RESULTS["C_compositions"] = {}
    smiles_50k = synthetic_corpus(N_CORPUS, seed=3)
    for label, fresh in (("fresh", True), ("frozen", False)):
        log(f"[C] {label} 30-epoch run")
        cfg = PretrainConfig(
            batch_size=B_MAIN, epochs=N_EPOCHS, warm_up=3, aug="node",
            valid_size=0.02, seed=0, featurize_processes=2,
            eval_every_epochs=100, save_every_epochs=100,
            ckpt_dir=f"runs/ablate_{label}", fresh_compositions=fresh,
            model=ModelConfig(gnn_type="gin",
                              num_layers=LAYERS,
                              emb_dim=300 if not args.smoke else 32,
                              feat_dim=512 if not args.smoke else 64,
                              tile=TILE, bf16=not args.smoke))
        t0 = time.time()
        pre = Pretrainer(cfg).setup_data(smiles_50k)
        pre.setup_state(next(iter(pre.train_iter))[0])
        history = pre.train(log=lambda *a: log("   ", *a))
        RESULTS["C_compositions"][label] = {
            "wall_s": round(time.time() - t0, 1),
            "losses": [round(h["train_loss"], 4) for h in history],
            "epoch_s": [h["time_s"] for h in history],
            "steady_epoch_s": round(float(np.median(
                [h["time_s"] for h in history[2:]])), 3),
        }
        save()
        log(f"[C] {label}: final loss "
            f"{history[-1]['train_loss']:.4f}, steady epoch "
            f"{RESULTS['C_compositions'][label]['steady_epoch_s']} s")

    save()
    log("ALL DONE")
    print(json.dumps({"ok": True, "out": OUT}))
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    finally:
        save()
