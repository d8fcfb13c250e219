"""Round-5 one-attach TPU experiment matrix.

Everything in ONE process (relay-lease rule): the bench matrix under the
r5 changes (corpus-derived BFS horizon + hoisted power stacks), the step
breakdown, a backward-time ATTRIBUTION (trunk vs heads/loss vs Adam —
VERDICT r4 weak #2 asks where the 0.94 ms bwd+Adam goes), hardware
validation of the padded Pallas NT-Xent (any pair count), and the narrow
vs full-width resident unit-stack step cost (int8/int16 takes + on-device
widen).

Methodology: marginal scan-step timing (CLAUDE.md), host readback as the
barrier, scan bodies carry a data dependency on the loop index.

Usage: python runs/r5_experiments.py [--quick] [--cpu]
Writes runs/r5_experiments.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--k1", type=int, default=16)
    p.add_argument("--k2", type=int, default=96)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--quick", action="store_true",
                   help="tiny shapes / short scans (CPU smoke)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.quick:
        args.batch_size, args.k1, args.k2, args.reps = 32, 2, 6, 1

    from functools import partial

    import jax.numpy as jnp
    import numpy as np

    from molclr_tpu.data import featurize_smiles, pack_batch
    from molclr_tpu.data.augment import (
        apply_view_delta,
        paired_augment,
        precompute_paired_deltas,
    )
    from molclr_tpu.data.graphs import PackOverflow
    from molclr_tpu.data.loader import spec_for_graphs
    from molclr_tpu.data.synthetic import synthetic_corpus
    from molclr_tpu.losses import nt_xent_loss
    from molclr_tpu.models import MolCLRNet, resolve_fused
    from molclr_tpu.train.optim import adam_torch
    from molclr_tpu.train.state import TrainState

    dev = jax.devices()[0]
    log(f"device: {dev}")
    results = {"device": str(dev), "batch_size": args.batch_size}

    b = args.batch_size
    tile = 256 if not args.quick else 32
    smiles = synthetic_corpus(b, seed=7)
    graphs = [g for g in (featurize_smiles(s) for s in smiles)
              if g is not None and g.max_degree <= 6][:b]
    spec = spec_for_graphs(graphs, len(graphs), slack=1.05, tile=tile)
    try:
        packed = pack_batch(graphs, spec)
    except PackOverflow:
        spec = spec_for_graphs(graphs, len(graphs), slack=1.05,
                               tile=tile, sizing="max")
        packed = pack_batch(graphs, spec)
    batch = jax.device_put(packed)
    n_nodes = int(np.asarray(batch.node_mask).sum())
    n_edges = int(np.asarray(batch.edge_mask).sum())
    msg_edges = n_edges + n_nodes
    max_waves = max(1, max(g.n_atoms for g in graphs) - 1)
    bw = spec.max_graph_bonds
    log(f"batch: {len(graphs)} mols, {n_nodes} atoms, {n_edges} edges, "
        f"max_waves {max_waves}, {spec}")
    results["max_waves"] = max_waves

    def marginal(run, k1, k2, reps):
        meds = {}
        for k in (k1, k2):
            _ = np.asarray(run(k))          # compile + warm
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                _ = np.asarray(run(k))
                ts.append(time.perf_counter() - t0)
            meds[k] = float(np.median(ts))
        return (meds[k2] - meds[k1]) / (k2 - k1)

    # ================= A. bench matrix (aug-mode=pre) =================
    def build_step(gnn, aug):
        fused = resolve_fused(None, gnn, tile)
        model = MolCLRNet(num_layers=5, emb_dim=300, gnn_type=gnn,
                          dtype=jnp.bfloat16, tile=tile, fused=fused)
        variables = jax.device_put(
            model.init(jax.random.PRNGKey(0), batch, train=False))
        tx = adam_torch(5e-4, 1e-5)
        state = TrainState(params=variables["params"],
                           batch_stats=variables.get("batch_stats", {}),
                           opt_state=tx.init(variables["params"]), step=0)

        def loss_fn(params, batch_stats, rng, views):
            ra, ri, rj = jax.random.split(rng, 3)
            vi, vj = views
            (_, zi), upd = model.apply(
                {"params": params, "batch_stats": batch_stats}, vi,
                train=True, rngs={"dropout": ri},
                mutable=["batch_stats"])
            (_, zj), upd = model.apply(
                {"params": params, "batch_stats": upd["batch_stats"]},
                vj, train=True, rngs={"dropout": rj},
                mutable=["batch_stats"])
            return nt_xent_loss(zi.astype(jnp.float32),
                                zj.astype(jnp.float32), 0.1,
                                pair_mask=batch.graph_mask), \
                upd["batch_stats"]

        def one_step(state, rng, views):
            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.batch_stats,
                                       rng, views)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = jax.tree_util.tree_map(lambda p, u: p + u,
                                            state.params, updates)
            return TrainState(params=params, batch_stats=stats,
                              opt_state=opt_state, step=state.step + 1), \
                loss

        @partial(jax.jit, static_argnums=2)
        def multi(state, rng, k):
            deltas = precompute_paired_deltas(
                batch, rng, k, aug, tile=tile, bond_window=bw,
                max_waves=max_waves)

            def body(s, i):
                di, dj = jax.tree_util.tree_map(lambda x: x[i], deltas)
                views = (apply_view_delta(batch, di),
                         apply_view_delta(batch, dj))
                return one_step(s, jax.random.fold_in(rng, i), views)
            _, losses = jax.lax.scan(body, state,
                                     jnp.arange(k, dtype=jnp.int32))
            return losses

        return model, state, tx, loss_fn, multi

    matrix = {}
    for gnn, aug in (("gin", "node"), ("gcn", "node"),
                     ("gin", "subgraph"), ("gin", "mix")):
        _, state, _, _, multi = build_step(gnn, aug)
        rng = jax.random.PRNGKey(1)
        t = marginal(lambda k: multi(state, rng, k),
                     args.k1, args.k2, args.reps)
        matrix[f"{gnn}/{aug}"] = {
            "step_ms": round(t * 1e3, 3),
            "edges_per_s": round(2 * 5 * msg_edges / t, 1)}
        log(f"[{gnn}/{aug}] {t*1e3:.3f} ms -> "
            f"{2*5*msg_edges/t/1e6:.1f}M edges/s")
    results["matrix"] = matrix

    # ======== B+C. step breakdown + backward attribution (gin/node) ====
    model, state, tx, loss_fn, _ = build_step("gin", "node")

    def views_for(rng):
        ra = jax.random.split(rng, 3)[0]
        return paired_augment(batch, ra, "node", tile=tile,
                              bond_window=bw, max_waves=max_waves)

    def consume(*trees):
        tot = jnp.float32(0.0)
        for t in trees:
            for leaf in jax.tree_util.tree_leaves(t):
                tot = tot + leaf.sum().astype(jnp.float32)
        return tot

    def h_only(params, batch_stats, rng):
        """Both views' pooled features h (trunk + pool + feat_lin), no
        projection head, no NT-Xent."""
        _, ri, rj = jax.random.split(rng, 3)
        vi, vj = views_for(rng)
        (hi, _), upd = model.apply(
            {"params": params, "batch_stats": batch_stats}, vi,
            train=True, rngs={"dropout": ri}, mutable=["batch_stats"])
        (hj, _), upd = model.apply(
            {"params": params, "batch_stats": upd["batch_stats"]}, vj,
            train=True, rngs={"dropout": rj}, mutable=["batch_stats"])
        return (hi.astype(jnp.float32).sum()
                + hj.astype(jnp.float32).sum()), upd["batch_stats"]

    bodies = {}

    def body_aug(c, i):
        vi, vj = views_for(jax.random.fold_in(jax.random.PRNGKey(1), i))
        return c + consume(vi, vj), None

    bodies["aug"] = body_aug

    def body_fwd(c, i):
        loss, _ = loss_fn(state.params, state.batch_stats,
                          jax.random.fold_in(jax.random.PRNGKey(1), i),
                          views_for(jax.random.fold_in(
                              jax.random.PRNGKey(1), i)))
        return c + loss, None

    bodies["fwd"] = body_fwd

    def body_hgrad(c, i):
        (v, _), grads = jax.value_and_grad(h_only, has_aux=True)(
            state.params, state.batch_stats,
            jax.random.fold_in(jax.random.PRNGKey(1), i))
        return c + v + consume(grads), None

    bodies["hgrad"] = body_hgrad

    def body_fullgrad(c, i):
        rng = jax.random.fold_in(jax.random.PRNGKey(1), i)
        (loss, _), grads = jax.value_and_grad(
            lambda p, s, r: loss_fn(p, s, r, views_for(r)),
            has_aux=True)(state.params, state.batch_stats, rng)
        return c + loss + consume(grads), None

    bodies["fullgrad"] = body_fullgrad

    times = {}
    for name, body in bodies.items():
        @partial(jax.jit, static_argnums=1)
        def scan_fn(c0, k, body=body):
            out, _ = jax.lax.scan(body, c0,
                                  jnp.arange(k, dtype=jnp.int32))
            return out

        times[name] = marginal(lambda k: scan_fn(jnp.float32(0.0), k),
                               args.k1, args.k2, args.reps)
        log(f"{name:10s} {times[name]*1e3:7.3f} ms/step")

    def full_step(s, i):
        rng = jax.random.fold_in(jax.random.PRNGKey(1), i)
        (loss, stats), grads = jax.value_and_grad(
            lambda p, st, r: loss_fn(p, st, r, views_for(r)),
            has_aux=True)(s.params, s.batch_stats, rng)
        updates, opt_state = tx.update(grads, s.opt_state, s.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, s.params,
                                        updates)
        return TrainState(params=params, batch_stats=stats,
                          opt_state=opt_state, step=s.step + 1), loss

    @partial(jax.jit, static_argnums=1)
    def scan_full(s, k):
        _, losses = jax.lax.scan(full_step, s,
                                 jnp.arange(k, dtype=jnp.int32))
        return losses[-1]

    times["full"] = marginal(lambda k: scan_full(state, k),
                             args.k1, args.k2, args.reps)
    log(f"{'full':10s} {times['full']*1e3:7.3f} ms/step")

    attribution = {
        "aug_ms": round(times["aug"] * 1e3, 3),
        "fwd_loss_ms": round((times["fwd"] - times["aug"]) * 1e3, 3),
        "bwd_adam_ms": round((times["full"] - times["fwd"]) * 1e3, 3),
        "trunk_fwd_bwd_ms": round(times["hgrad"] * 1e3, 3),
        "heads_loss_bwd_extra_ms": round(
            (times["fullgrad"] - times["hgrad"]) * 1e3, 3),
        "adam_update_ms": round(
            (times["full"] - times["fullgrad"]) * 1e3, 3),
        "full_ms": round(times["full"] * 1e3, 3),
    }
    results["attribution"] = attribution
    log(f"attribution: {attribution}")

    # ============ D. padded Pallas NT-Xent on real Mosaic ==============
    from molclr_tpu.ops.pallas_ntxent import nt_xent_pallas

    interp = jax.default_backend() != "tpu"
    ntx = {}
    for bp in ((50, 128), (2500, 64) if not args.quick else (70, 32)):
        bb, d = bp
        rng = np.random.RandomState(3)
        zis = jnp.asarray(rng.randn(bb, d), jnp.float32)
        zjs = jnp.asarray(rng.randn(bb, d), jnp.float32)

        @jax.jit
        def vg(a, c):
            return jax.value_and_grad(
                lambda x: nt_xent_pallas(x, c, 0.1, True,
                                         interpret=interp))(a)

        v, g = vg(zis, zjs)
        ref = float(nt_xent_loss(zis, zjs, 0.1, True))
        err = abs(float(v) - ref) / max(abs(ref), 1e-9)
        ok = err < 1e-4 and bool(np.isfinite(np.asarray(g)).all())
        ntx[f"B={bb}"] = {"pallas": float(v), "xla": ref,
                          "rel_err": err, "ok": ok}
        log(f"pallas ntxent B={bb} (padded 2B="
            f"{2 * (bb + (-bb) % 64)}): rel_err {err:.2e} ok={ok}")
    results["pallas_ntxent_padded"] = ntx

    # ====== E. narrow vs full-width resident unit-stack step cost ======
    from molclr_tpu.data.regroup import concat_units, pack_unit_stack
    from molclr_tpu.train.pretrain import Pretrainer

    ug = [g for g in (featurize_smiles(s)
                      for s in synthetic_corpus(40 * b // 32, seed=17))
          if g is not None and g.max_degree <= 6]
    stack, uspec, units = pack_unit_stack(ug, tile, seed=3)
    wire = Pretrainer._wire_dtypes(uspec)
    nstack = {f: np.asarray(getattr(stack, f)).astype(d)
              for f, d in wire.items()}
    u = len(units)
    t_units = max(1, (b * 11) // tile)  # ~ batch-equivalent units
    log(f"unit stacks: {u} units, {t_units} units/step")
    dstack = jax.device_put(stack)
    dnarrow = jax.device_put(nstack)
    rng_host = np.random.RandomState(0)
    order = np.stack([rng_host.permutation(u)[:t_units]
                      for _ in range(max(args.k2, 8))]).astype(np.int32)
    dorder = jnp.asarray(order)

    for name, st in (("wide", dstack), ("narrow", dnarrow)):
        @partial(jax.jit, static_argnums=1)
        def scan_cc(c0, k, st=st):
            def body(c, i):
                gb = concat_units(st, dorder[i % order.shape[0]])
                return c + consume(gb), None
            out, _ = jax.lax.scan(body, c0,
                                  jnp.arange(k, dtype=jnp.int32))
            return out

        t = marginal(lambda k: scan_cc(jnp.float32(0.0), k),
                     args.k1, args.k2, args.reps)
        results[f"concat_units_{name}_ms"] = round(t * 1e3, 3)
        log(f"concat_units[{name}] {t*1e3:.3f} ms/step")

    with open("runs/r5_experiments.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
