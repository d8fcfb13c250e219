"""Decompose node-augmentation time into its sub-ops on the TPU.

Same marginal-scan methodology as profile_step_breakdown.py (CLAUDE.md):
every variant scans K steps whose body depends on the loop index, is timed
as (t_K2 - t_K1) / (K2 - K1) with a host readback as the barrier, and
consumes every output leaf so nothing is dead-code-eliminated.

Variants (cumulative slices of node_augment, one view):
    keys          draw the two int32 key vectors
    node_ranks    + per-tile compare-and-count over nodes
    bond_ranks    + banded compare-and-count over bonds
    apply         + threshold/mask/bond-drop application
    one_view      full node_augment
    paired        both contrastive views (what the train step runs)
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
    p.add_argument("--tile", type=int, default=256)
    p.add_argument("--k1", type=int, default=16)
    p.add_argument("--k2", type=int, default=96)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from functools import partial

    import jax.numpy as jnp
    import numpy as np

    from molclr_tpu.data import featurize_smiles, pack_batch
    from molclr_tpu.data import augment as A
    from molclr_tpu.data.graphs import PackOverflow
    from molclr_tpu.data.loader import spec_for_graphs
    from molclr_tpu.data.synthetic import synthetic_corpus

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
    bw = spec.max_graph_bonds
    log(f"batch: {len(graphs)} mols, {spec}")

    def consume(*trees):
        tot = jnp.float32(0.0)
        for t in trees:
            for leaf in jax.tree_util.tree_leaves(t):
                tot = tot + leaf.sum().astype(jnp.float32)
        return tot

    def keys(rng):
        rn, rb = jax.random.split(rng)
        return (A._rand_keys(rn, batch.num_nodes),
                A._rand_keys(rb, batch.num_bonds))

    def body_keys(c, i):
        kn, kb = keys(jax.random.fold_in(jax.random.PRNGKey(1), i))
        return c + consume(kn, kb), None

    def body_node_ranks(c, i):
        kn, kb = keys(jax.random.fold_in(jax.random.PRNGKey(1), i))
        rn = A._node_ranks(batch, kn, args.tile)
        return c + consume(rn, kb), None

    def body_bond_ranks(c, i):
        kn, kb = keys(jax.random.fold_in(jax.random.PRNGKey(1), i))
        rb = A._bond_ranks(batch, kb, bw)
        return c + consume(kn, rb), None

    def body_both_ranks(c, i):
        kn, kb = keys(jax.random.fold_in(jax.random.PRNGKey(1), i))
        rn = A._node_ranks(batch, kn, args.tile)
        rb = A._bond_ranks(batch, kb, bw)
        return c + consume(rn, rb), None

    def _flags(rng):
        rng_n, rng_b = jax.random.split(rng)
        rank_n = A._node_ranks(batch, A._rand_keys(rng_n, batch.num_nodes),
                               args.tile)
        k_n = jnp.where(
            batch.graph_mask,
            jnp.maximum(1, jnp.floor(0.25 * batch.graph_n_nodes)
                        .astype(jnp.int32)), 0)
        mask_flag = batch.node_mask & (rank_n < k_n[batch.node_graph])
        rank_b = A._bond_ranks(batch, A._rand_keys(rng_b, batch.num_bonds),
                               bw)
        k_b = jnp.floor(0.25 * batch.graph_n_bonds).astype(jnp.int32)
        drop_bond = batch.bond_mask & (rank_b < k_b[batch.bond_graph])
        return mask_flag, drop_bond

    def body_flags(c, i):
        mf, db = _flags(jax.random.fold_in(jax.random.PRNGKey(1), i))
        return c + consume(mf, db), None

    def body_edge_take(c, i):
        mf, db = _flags(jax.random.fold_in(jax.random.PRNGKey(1), i))
        keep = jnp.concatenate(
            [jnp.logical_not(db), jnp.ones(1, bool)]).astype(jnp.int32)
        em = batch.edge_mask & (jnp.take(keep, batch.edge_bond) > 0)
        return c + consume(mf, em), None

    def body_nbr_take(c, i):
        mf, db = _flags(jax.random.fold_in(jax.random.PRNGKey(1), i))
        keep = jnp.concatenate(
            [jnp.logical_not(db), jnp.ones(1, bool)]).astype(jnp.int32)
        nm = batch.nbr_mask & (jnp.take(keep, batch.nbr_bond) > 0)
        return c + consume(mf, nm), None

    def body_one_view(c, i):
        v = A.node_augment(batch,
                           jax.random.fold_in(jax.random.PRNGKey(1), i),
                           tile=args.tile, bond_window=bw)
        return c + consume(v), None

    def body_paired(c, i):
        vi, vj = A.paired_augment(
            batch, jax.random.fold_in(jax.random.PRNGKey(1), i), "node",
            tile=args.tile, bond_window=bw)
        return c + consume(vi, vj), None

    # ---- mix decomposition (the slowest aug kind): cumulative stages of
    # paired BFS removal -> _finish_mix, mirroring data/augment.py ----
    def _mix_removed(rng):
        k_subs, rng_ts = [], []
        for r in jax.random.split(rng, 2):
            rng_f, rng_s, _, _ = jax.random.split(r, 4)
            f = jax.random.uniform(rng_f, (batch.num_graphs,), maxval=0.2)
            k_subs.append(jnp.floor(f * batch.graph_n_nodes)
                          .astype(jnp.int32))
            rng_ts.append(jax.random.split(rng_s)[1])
        return A._subgraph_removal_pair(batch, rng, rng_ts, k_subs, 32,
                                        args.tile, 8)

    def _mix_stage(rng, stage):
        rems = _mix_removed(rng)
        if stage == "bfs":
            return rems
        outs = []
        g = batch.num_graphs
        for v, rem in enumerate(rems):
            rng_n, rng_b = jax.random.split(jax.random.fold_in(rng, v))
            n_removed = jax.ops.segment_sum(rem.astype(jnp.int32),
                                            batch.node_graph,
                                            num_segments=g)
            k_total = jnp.floor(0.25 * batch.graph_n_nodes).astype(jnp.int32)
            k_extra = jnp.maximum(0, k_total - n_removed)
            survivors = batch.node_mask & jnp.logical_not(rem)
            key = jnp.where(rem, -1, A._rand_keys(rng_n, batch.num_nodes))
            rank = A._node_ranks(batch, key, args.tile)
            topup = survivors & (
                rank < (n_removed + k_extra)[batch.node_graph])
            masked = rem | topup
            if stage == "topup":
                outs.append(masked)
                continue
            bsrc, bdst = A._bond_endpoints(batch)
            drop_sub = batch.bond_mask & (
                A._flag_at_ids_tile(rem, bsrc, batch.bond_mask, args.tile)
                | A._flag_at_ids_tile(rem, bdst, batch.bond_mask,
                                      args.tile))
            keep_cap = jnp.ceil(0.75 * batch.graph_n_bonds).astype(jnp.int32)
            salts = A._hash_salts(rng_b)
            hash_b = A._mix_keys(salts, jnp.arange(batch.num_bonds,
                                                   dtype=jnp.int32))
            bkey = jnp.where(drop_sub, A._INF_TIME, hash_b)
            brank = A._bond_ranks(batch, bkey, bw)
            if stage == "bondrank":
                outs.append((masked, brank))
                continue
            is_bond = batch.nbr_bond < batch.num_bonds
            drop_sub_slot = is_bond & (
                rem[:, None] | A._flag_at_nbr_tile(rem, batch.nbr,
                                                   args.tile))
            hc, bc = A._bond_threshold(batch, bkey, brank, keep_cap)
            key_slot = jnp.where(drop_sub_slot, A._INF_TIME,
                                 A._mix_keys(salts, batch.nbr_bond))
            hcn = jnp.take(hc, batch.node_graph)[:, None]
            bcn = jnp.take(bc, batch.node_graph)[:, None]
            keep_slot = ((key_slot < hcn)
                         | ((key_slot == hcn) & (batch.nbr_bond <= bcn)))
            drop_slot = drop_sub_slot | (is_bond & jnp.logical_not(keep_slot))
            outs.append((masked, batch.nbr_mask & jnp.logical_not(drop_slot)))
        return outs

    def mix_body(stage):
        def body(c, i):
            out = _mix_stage(jax.random.fold_in(jax.random.PRNGKey(1), i),
                             stage)
            return c + consume(out), None
        return body

    def body_mix_paired(c, i):
        vi, vj = A.paired_augment(
            batch, jax.random.fold_in(jax.random.PRNGKey(1), i), "mix",
            tile=args.tile, bond_window=bw)
        return c + consume(vi, vj), None

    def body_subgraph_paired(c, i):
        vi, vj = A.paired_augment(
            batch, jax.random.fold_in(jax.random.PRNGKey(1), i), "subgraph",
            tile=args.tile, bond_window=bw)
        return c + consume(vi, vj), None

    def marginal(body):
        @partial(jax.jit, static_argnums=1)
        def scan_fn(c0, k):
            out, _ = jax.lax.scan(body, c0,
                                  jnp.arange(k, dtype=jnp.int32))
            return out

        meds = {}
        for k in (args.k1, args.k2):
            _ = np.asarray(scan_fn(jnp.float32(0.0), k))
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                _ = np.asarray(scan_fn(jnp.float32(0.0), k))
                ts.append(time.perf_counter() - t0)
            meds[k] = float(np.median(ts))
        return (meds[args.k2] - meds[args.k1]) / (args.k2 - args.k1)

    for name, body in (("keys", body_keys),
                       ("keys+node_ranks", body_node_ranks),
                       ("keys+bond_ranks", body_bond_ranks),
                       ("keys+both_ranks", body_both_ranks),
                       ("flags", body_flags),
                       ("flags+edge_take", body_edge_take),
                       ("flags+nbr_take", body_nbr_take),
                       ("one_view", body_one_view),
                       ("paired", body_paired),
                       ("mix_bfs", mix_body("bfs")),
                       ("mix+topup", mix_body("topup")),
                       ("mix+bondrank", mix_body("bondrank")),
                       ("mix+ell", mix_body("ell")),
                       ("mix_paired", body_mix_paired),
                       ("subgraph_paired", body_subgraph_paired)):
        t = marginal(body)
        log(f"{name:18s} marginal {t*1e3:7.3f} ms/step")
    return 0


if __name__ == "__main__":
    sys.exit(main())
