"""Edge/node-partitioned training (parallel/partition.py): one giant
packed batch sharded by node rows across a CPU mesh, trained under
shard_map with collective-free tile aggregation — gradients and loss must
match the unsharded step exactly (SURVEY §2.5 item 2; VERDICT r1 gap #4).
"""

import jax
import jax.numpy as jnp
import numpy as np

from molclr_tpu.data import featurize_smiles, pack_batch
from molclr_tpu.data.graphs import PadSpec, concat_shards
from molclr_tpu.data.synthetic import synthetic_corpus
from molclr_tpu.losses import nt_xent_loss
from molclr_tpu.models import MolCLRNet
from molclr_tpu.parallel import (
    build_partitioned_pretrain_step,
    make_mesh,
    shard_graph_batch,
)
from molclr_tpu.parallel.partition import _localize
from molclr_tpu.train.optim import adam_torch
from molclr_tpu.train.state import TrainState

S = 4           # shards
TILE = 32
PER = 4         # graphs per shard


def make_shard_batches(seed=0):
    smiles = synthetic_corpus(S * PER, seed=seed)
    graphs = [g for g in (featurize_smiles(s) for s in smiles)
              if g is not None and g.max_degree <= 6]
    max_bonds = max(g.edge_src.shape[0] // 2 for g in graphs)
    spec = PadSpec(n_graphs=PER, n_nodes=2 * TILE, n_edges=56 * PER,
                   max_degree=6, tile=TILE, max_graph_bonds=max_bonds)
    per = [graphs[i * PER: (i + 1) * PER] for i in range(S)]
    return [pack_batch(p, spec) for p in per], max_bonds


class TestConcatLocalize:
    def test_roundtrip_exact(self):
        """Slicing shard i's segments out of the concat batch and applying
        _localize(i, S) recovers the original sub-batch bit-exactly."""
        batches, _ = make_shard_batches()
        cat = concat_shards(batches)
        for i, orig in enumerate(batches):
            def seg(x, o):
                per = np.asarray(o).shape[0]
                return np.asarray(x)[i * per: (i + 1) * per]

            local = jax.tree_util.tree_map(
                lambda x, o: jnp.asarray(seg(x, o)), cat, orig)
            back = _localize(local, i, S)
            for f in ("atom_type", "node_graph", "src", "dst", "edge_bond",
                      "nbr", "nbr_bond", "bond_graph", "graph_n_nodes",
                      "nbr_mask", "node_mask", "graph_mask"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(back, f)),
                    np.asarray(getattr(orig, f)), err_msg=f)


class TestPartitionedStep:
    def _setup(self, aug="none"):
        batches, max_bonds = make_shard_batches()
        cat = concat_shards(batches)
        mesh = make_mesh(S, axis="part")
        sharded_batch = shard_graph_batch(cat, mesh, "part")

        model_u = MolCLRNet(gnn_type="gin", num_layers=3, emb_dim=32,
                            feat_dim=64, tile=TILE)
        model_p = MolCLRNet(gnn_type="gin", num_layers=3, emb_dim=32,
                            feat_dim=64, tile=TILE, bn_axis_name="part")
        variables = model_u.init(jax.random.PRNGKey(0), cat, train=False)
        tx = adam_torch(1e-3, 0.0)
        state = TrainState(params=variables["params"],
                           batch_stats=variables["batch_stats"],
                           opt_state=tx.init(variables["params"]), step=0)
        return (batches, cat, mesh, sharded_batch, model_u, model_p, tx,
                state, max_bonds)

    def test_loss_and_grads_match_unsharded(self):
        """aug='none' removes stochastic divergence: the partitioned step's
        global loss and pmean'd gradients must equal the single-device
        fwd+bwd on the same concatenated batch."""
        (_, cat, mesh, sharded_batch, model_u, model_p, tx, state,
         _) = self._setup()

        def loss_u(params, stats):
            (_, zi), upd = model_u.apply(
                {"params": params, "batch_stats": stats}, cat, train=True,
                mutable=["batch_stats"])
            (_, zj), upd = model_u.apply(
                {"params": params, "batch_stats": upd["batch_stats"]}, cat,
                train=True, mutable=["batch_stats"])
            return nt_xent_loss(zi, zj, 0.1, True,
                                pair_mask=cat.graph_mask), \
                upd["batch_stats"]

        (ref_loss, ref_stats), ref_grads = jax.jit(jax.value_and_grad(
            loss_u, has_aux=True))(state.params, state.batch_stats)

        pstep = build_partitioned_pretrain_step(
            model_p, tx, mesh, aug="none", temperature=0.1, axis="part",
            tile=TILE, return_grads=True)
        loss, grads = pstep(state, sharded_batch, jax.random.PRNGKey(1))

        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
        flat_ref = jax.tree_util.tree_leaves_with_path(ref_grads)
        flat_got = dict(
            (jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_leaves_with_path(grads))
        for k, v in flat_ref:
            ks = jax.tree_util.keystr(k)
            np.testing.assert_allclose(
                np.asarray(flat_got[ks]), np.asarray(v),
                rtol=2e-4, atol=1e-6, err_msg=f"grad mismatch at {ks}")

    def test_partitioned_step_trains(self):
        """A real augmented partitioned step: finite loss, step count
        advances, params move."""
        (_, _, mesh, sharded_batch, _, model_p, tx, state,
         max_bonds) = self._setup()
        pstep = build_partitioned_pretrain_step(
            model_p, tx, mesh, aug="node", temperature=0.1, axis="part",
            tile=TILE, bond_window=max_bonds)
        p0 = np.asarray(state.params["feat_lin"]["kernel"]).copy()
        new_state, loss = pstep(state, sharded_batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(loss))
        assert int(new_state.step) == 1
        assert np.abs(np.asarray(
            new_state.params["feat_lin"]["kernel"]) - p0).max() > 0


class TestFusedPartitionedStep:
    """The fused Pallas layer kernels (interpreter mode off-TPU) compose
    with the edge-partitioned shard_map step: per-shard pallas_call over
    the local tiles, identical loss to the unfused partitioned step."""

    def test_fused_matches_unfused_loss(self):
        batches, _ = make_shard_batches()
        cat = concat_shards(batches)
        mesh = make_mesh(S, axis="part")
        sharded_batch = shard_graph_batch(cat, mesh, "part")
        kw = dict(gnn_type="gin", num_layers=3, emb_dim=32, feat_dim=64,
                  tile=TILE, bn_axis_name="part")
        model_u = MolCLRNet(**kw)
        model_f = MolCLRNet(**kw, fused=True)
        variables = MolCLRNet(gnn_type="gin", num_layers=3, emb_dim=32,
                              feat_dim=64, tile=TILE).init(
            jax.random.PRNGKey(0), cat, train=False)
        tx = adam_torch(1e-3, 0.0)
        # the partitioned step donates the state buffers: keep host copies
        host_params = jax.tree_util.tree_map(np.asarray,
                                             variables["params"])
        host_stats = jax.tree_util.tree_map(np.asarray,
                                            variables["batch_stats"])

        losses = []
        for m in (model_u, model_f):
            state = TrainState(params=host_params,
                               batch_stats=host_stats,
                               opt_state=tx.init(host_params),
                               step=0)
            pstep = build_partitioned_pretrain_step(
                m, tx, mesh, aug="none", temperature=0.1, axis="part",
                tile=TILE)
            _, loss = pstep(state, sharded_batch, jax.random.PRNGKey(1))
            losses.append(float(loss))
        np.testing.assert_allclose(losses[1], losses[0], rtol=2e-5)
