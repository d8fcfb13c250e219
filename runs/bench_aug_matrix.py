"""One-attach multi-config bench: GCN node + GIN subgraph/mix (GIN node
is bench.py's own headline config), all in a single TPU process (relay
lease makes per-config processes pay ~10 min attach each). Mirrors
bench.py methodology exactly."""
import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from molclr_tpu.data import featurize_smiles, pack_batch
from molclr_tpu.data.augment import paired_augment
from molclr_tpu.data.loader import spec_for_graphs
from molclr_tpu.data.synthetic import synthetic_corpus
from molclr_tpu.losses import nt_xent_loss
from molclr_tpu.models import MolCLRNet
from molclr_tpu.train.optim import adam_torch
from molclr_tpu.train.state import TrainState


def log(*a):
    print(*a, file=sys.stderr, flush=True)


TILE = 256
dev = jax.devices()[0]
log(f"device: {dev}")

b = 512
smiles = synthetic_corpus(b, seed=7)
graphs = [g for g in (featurize_smiles(s) for s in smiles)
          if g is not None and g.max_degree <= 6][:b]
spec = spec_for_graphs(graphs, len(graphs), slack=1.05, tile=TILE)
packed = pack_batch(graphs, spec)
batch = jax.device_put(packed)
n_nodes = int(np.asarray(batch.node_mask).sum())
n_edges = int(np.asarray(batch.edge_mask).sum())
msg_edges = n_edges + n_nodes
log(f"batch: {len(graphs)} mols, {n_nodes} atoms, {n_edges} edges; {spec}")

results = {}
for gnn, aug in (("gcn", "node"), ("gin", "subgraph"), ("gin", "mix")):
    model = MolCLRNet(num_layers=5, emb_dim=300, gnn_type=gnn,
                      dtype=jnp.bfloat16, tile=TILE, fused=True)
    variables = jax.device_put(
        model.init(jax.random.PRNGKey(0), batch, train=False))
    tx = adam_torch(5e-4, 1e-5)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]), step=0)

    def loss_fn(params, batch_stats, rng):
        ra, ri, rj = jax.random.split(rng, 3)
        vi, vj = paired_augment(batch, ra, aug, tile=TILE,
                                bond_window=spec.max_graph_bonds,
                                bfs_stride=8)
        (_, zi), upd = model.apply(
            {"params": params, "batch_stats": batch_stats}, vi,
            train=True, rngs={"dropout": ri}, mutable=["batch_stats"])
        (_, zj), upd = model.apply(
            {"params": params, "batch_stats": upd["batch_stats"]}, vj,
            train=True, rngs={"dropout": rj}, mutable=["batch_stats"])
        return nt_xent_loss(zi.astype(jnp.float32), zj.astype(jnp.float32),
                            0.1, pair_mask=batch.graph_mask), \
            upd["batch_stats"]

    def one_step(state, rng):
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params,
                                        updates)
        return TrainState(params=params, batch_stats=stats,
                          opt_state=opt_state, step=state.step + 1), loss

    @partial(jax.jit, static_argnums=2)
    def multi_step(state, rng, k):
        def body(s, i):
            return one_step(s, jax.random.fold_in(rng, i))
        return jax.lax.scan(body, state, jnp.arange(k, dtype=jnp.int32))

    rng = jax.random.PRNGKey(1)
    meds = {}
    for k in (16, 96):
        t0 = time.time()
        state, losses = multi_step(state, rng, k)
        lh = np.asarray(losses)
        log(f"[{gnn}/{aug}] K={k}: compile+run {time.time()-t0:.1f}s, "
            f"loss {lh[0]:.3f}->{lh[-1]:.3f}")
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            state, losses = multi_step(state, jax.random.fold_in(rng, i), k)
            _ = np.asarray(losses)
            ts.append(time.perf_counter() - t0)
        meds[k] = float(np.median(ts))
        log(f"[{gnn}/{aug}] K={k}: median dispatch {meds[k]*1e3:.1f} ms")
    step_time = (meds[96] - meds[16]) / 80
    value = 2 * 5 * msg_edges / step_time
    log(f"[{gnn}/{aug}] marginal step {step_time*1e3:.3f} ms -> "
        f"{value/1e6:.1f}M msg-edges/s")
    results[f"{gnn}/{aug}"] = {"step_ms": step_time * 1e3,
                               "edges_per_s": value}

print(json.dumps(results))
