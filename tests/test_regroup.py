"""On-device fresh batch compositions (data/regroup.py): the tile-unit
stack + concat_units must reproduce concat_shards bit-exactly, train
correctly through the model, and re-draw batch memberships per epoch."""

import jax
import jax.numpy as jnp
import numpy as np

from molclr_tpu.data import featurize_smiles
from molclr_tpu.data.graphs import concat_shards
from molclr_tpu.data.regroup import (
    concat_units,
    epoch_unit_orders,
    pack_unit_stack,
    plan_units,
)
from molclr_tpu.data.synthetic import synthetic_corpus

TILE = 64


def _graphs(n=96, seed=5):
    smiles = synthetic_corpus(n, seed=seed)
    return [g for g in (featurize_smiles(s) for s in smiles)
            if g is not None and g.max_degree <= 6]


class TestConcatUnits:
    def test_bit_exact_vs_concat_shards(self):
        graphs = _graphs()
        stack, uspec, units = pack_unit_stack(graphs, TILE, seed=3)
        u = len(units)
        assert u >= 8
        idx = np.random.RandomState(0).permutation(u)[:6].astype(np.int32)
        got = jax.jit(concat_units)(stack, jnp.asarray(idx))
        want = concat_shards([units[i] for i in idx])
        for f in ("atom_type", "chirality", "node_graph", "node_mask",
                  "src", "dst", "bond_type", "bond_dir", "edge_bond",
                  "edge_mask", "nbr", "nbr_bond_type", "nbr_bond_dir",
                  "nbr_bond", "nbr_mask", "bond_graph", "bond_mask",
                  "graph_mask", "graph_n_nodes", "graph_n_bonds"):
            np.testing.assert_array_equal(
                np.asarray(getattr(got, f)), np.asarray(getattr(want, f)),
                err_msg=f)

    def test_units_cover_corpus_exactly_once(self):
        graphs = _graphs()
        groups = plan_units(graphs, TILE)
        flat = [g for gr in groups for g in gr]
        assert len(flat) == len(graphs)
        # identity (same objects, same order)
        assert all(a is b for a, b in zip(flat, graphs))
        assert all(sum(g.n_atoms for g in gr) <= TILE for gr in groups)

    def test_model_loss_and_grads_match_repacked(self):
        """A training forward/backward on the regrouped on-device batch
        equals the same molecules host-packed the classic way (semantic
        equivalence: losses are padding/layout invariant)."""
        from molclr_tpu.data.graphs import PadSpec, pack_batch
        from molclr_tpu.losses import nt_xent_loss
        from molclr_tpu.models import MolCLRNet

        graphs = _graphs()
        stack, uspec, units = pack_unit_stack(graphs, TILE, seed=3)
        idx = jnp.arange(6, dtype=jnp.int32)
        dev_batch = jax.jit(concat_units)(stack, idx)

        # the same molecules, packed from scratch into an equal-capacity
        # batch (different layout: no unit padding); reproduce the
        # pack_unit_stack shuffle to recover each unit's molecule group
        shuffled = [graphs[i] for i in
                    np.random.RandomState(3).permutation(len(graphs))]
        groups = plan_units(shuffled, TILE)
        mols = [g for i in np.asarray(idx) for g in groups[i]]
        spec = PadSpec(n_graphs=dev_batch.num_graphs,
                       n_nodes=dev_batch.num_nodes,
                       n_edges=dev_batch.num_edges, max_degree=6,
                       tile=TILE, max_graph_bonds=uspec.max_graph_bonds)
        host_batch = pack_batch(mols, spec)

        model = MolCLRNet(gnn_type="gin", num_layers=2, emb_dim=32,
                          feat_dim=64, tile=TILE)
        variables = model.init(jax.random.PRNGKey(0), host_batch,
                               train=False)

        def loss_fn(params, stats, batch):
            (_, z), upd = model.apply(
                {"params": params, "batch_stats": stats}, batch,
                train=True, mutable=["batch_stats"])
            return nt_xent_loss(z, z, 0.1, True,
                                pair_mask=batch.graph_mask), \
                upd["batch_stats"]

        vg = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
        (l_dev, _), g_dev = vg(variables["params"],
                               variables["batch_stats"], dev_batch)
        (l_host, _), g_host = vg(variables["params"],
                                 variables["batch_stats"], host_batch)
        np.testing.assert_allclose(float(l_dev), float(l_host), rtol=1e-5)
        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_leaves_with_path(g_dev),
                jax.tree_util.tree_leaves_with_path(g_host)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6,
                err_msg=jax.tree_util.keystr(ka))

    def test_epoch_orders_redraw_membership(self):
        orders0 = epoch_unit_orders(100, 8, seed=1, epoch=0)
        orders1 = epoch_unit_orders(100, 8, seed=1, epoch=1)
        assert orders0.shape == orders1.shape == (12, 8)
        # batch memberships differ between epochs
        sets0 = [frozenset(r) for r in orders0]
        sets1 = [frozenset(r) for r in orders1]
        assert sets0 != sets1
        # each epoch uses each kept unit exactly once
        assert len(set(orders0.ravel())) == 96
        # deterministic for resume
        np.testing.assert_array_equal(
            orders1, epoch_unit_orders(100, 8, seed=1, epoch=1))


class TestPretrainerFreshCompositions:
    def test_resident_epochs_use_units_and_learn(self, tmp_path):
        """End-to-end: after epoch 0 the Pretrainer uploads the tile-unit
        stack; later epochs regroup on-device, keep the schedule's
        steps-per-epoch, and the loss decreases."""
        from molclr_tpu.train.config import ModelConfig, PretrainConfig
        from molclr_tpu.train.pretrain import Pretrainer

        cfg = PretrainConfig(
            batch_size=48, epochs=3, warm_up=1, aug="node",
            valid_size=0.1, seed=0, featurize_processes=0,
            eval_every_epochs=100, save_every_epochs=100,
            ckpt_dir=str(tmp_path / "pre"), device_cache_mb=512,
            model=ModelConfig(gnn_type="gin", num_layers=2, emb_dim=32,
                              feat_dim=64, tile=TILE, drop_ratio=0.0))
        # 430 molecules: the unit count does NOT divide evenly by the
        # epoch length, so this also pins the steps-per-epoch truncation
        # (a 300-mol CLI probe caught epoch 1 running 11 steps vs 8)
        smiles = synthetic_corpus(430, seed=9)
        pre = Pretrainer(cfg).setup_data(smiles)
        pre.setup_state(next(iter(pre.train_iter))[0])
        s_epoch = len(pre.train_iter)
        history = pre.train(log=lambda *_: None)
        assert pre._unit_stack is not None, "units path did not activate"
        assert pre._units_per_batch >= 1
        assert pre._n_units % s_epoch != 0, \
            "corpus accidentally divisible; test would not pin truncation"
        # schedule contract: steps per epoch unchanged by the units path
        assert all(h["steps"] == s_epoch for h in history)
        losses = [h["train_loss"] for h in history]
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]

    def test_flag_off_keeps_frozen_batch_cache(self, tmp_path):
        from molclr_tpu.train.config import ModelConfig, PretrainConfig
        from molclr_tpu.train.pretrain import Pretrainer

        cfg = PretrainConfig(
            batch_size=48, epochs=2, warm_up=1, aug="node",
            valid_size=0.1, seed=0, featurize_processes=0,
            eval_every_epochs=100, save_every_epochs=100,
            ckpt_dir=str(tmp_path / "pre"), device_cache_mb=512,
            fresh_compositions=False,
            model=ModelConfig(gnn_type="gin", num_layers=2, emb_dim=32,
                              feat_dim=64, tile=TILE, drop_ratio=0.0))
        smiles = synthetic_corpus(400, seed=9)
        pre = Pretrainer(cfg).setup_data(smiles)
        pre.setup_state(next(iter(pre.train_iter))[0])
        history = pre.train(log=lambda *_: None)
        assert pre._unit_stack is None
        assert pre._device_stack is not None
        assert all(np.isfinite(h["train_loss"]) for h in history)


class TestAugPrecompute:
    def test_trajectory_identical_on_vs_off(self, tmp_path):
        """aug_precompute batches the scan's augmentations up front; the
        rng protocol contract makes per-step losses BIT-identical to the
        inline path, across host-streaming, resident and units epochs."""
        from molclr_tpu.train.config import ModelConfig, PretrainConfig
        from molclr_tpu.train.pretrain import Pretrainer

        losses = {}
        for pre in (True, False):
            cfg = PretrainConfig(
                batch_size=48, epochs=3, warm_up=1, aug="node",
                valid_size=0.1, seed=0, featurize_processes=0,
                eval_every_epochs=100, save_every_epochs=100,
                ckpt_dir=str(tmp_path / f"pre{pre}"), device_cache_mb=512,
                aug_precompute=pre,
                model=ModelConfig(gnn_type="gin", num_layers=2, emb_dim=32,
                                  feat_dim=64, tile=TILE, drop_ratio=0.0))
            smiles = synthetic_corpus(400, seed=9)
            p = Pretrainer(cfg).setup_data(smiles)
            p.setup_state(next(iter(p.train_iter))[0])
            history = p.train(log=lambda *_: None)
            losses[pre] = [h["train_loss"] for h in history]
        np.testing.assert_allclose(losses[True], losses[False],
                                   rtol=1e-6, atol=1e-7)


class TestDpFreshCompositions:
    def test_dp_resident_epochs_use_units_and_learn(self, tmp_path):
        """DP fresh compositions: after epoch 0 the Pretrainer shards the
        tile-unit stack over the mesh; later epochs regroup per-device
        ON-DEVICE, keep the optimizer-step epoch length, and learn."""
        from molclr_tpu.train.config import ModelConfig, PretrainConfig
        from molclr_tpu.train.pretrain import Pretrainer

        cfg = PretrainConfig(
            batch_size=8, epochs=3, warm_up=1, aug="node",
            valid_size=0.1, seed=0, featurize_processes=0,
            eval_every_epochs=100, save_every_epochs=100,
            ckpt_dir=str(tmp_path / "dpu"), device_cache_mb=512,
            data_axis="data",
            model=ModelConfig(gnn_type="gin", num_layers=2, emb_dim=32,
                              feat_dim=64, tile=TILE, drop_ratio=0.0))
        smiles = synthetic_corpus(900, seed=9)
        pre = Pretrainer(cfg).setup_data(smiles)
        pre.setup_state(next(iter(pre.train_iter))[0])
        s_dp = pre._sched_steps_per_epoch
        history = pre.train(log=lambda *_: None)
        assert pre._dp_unit_stack is not None, \
            "DP units path did not activate"
        # epochs after activation run exactly the schedule's step count
        assert all(h["steps"] == s_dp for h in history[1:])
        losses = [h["train_loss"] for h in history]
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]


class TestUnitsResume:
    def test_resume_reproduces_fresh_composition_stream(self, tmp_path):
        """Full-state resume on the fresh-compositions path: the resumed
        run must re-pack IDENTICAL units (seeded shuffle + greedy plan)
        and re-draw the SAME per-epoch unit orders, so its epoch-2/3
        losses equal the uninterrupted run's."""
        from molclr_tpu.train.checkpoints import latest_checkpoint
        from molclr_tpu.train.config import ModelConfig, PretrainConfig
        from molclr_tpu.train.pretrain import Pretrainer

        base = dict(batch_size=48, warm_up=1, aug="node", valid_size=0.1,
                    seed=0, featurize_processes=0, eval_every_epochs=100,
                    device_cache_mb=512,
                    model=ModelConfig(gnn_type="gin", num_layers=2,
                                      emb_dim=32, feat_dim=64, tile=TILE,
                                      drop_ratio=0.0))
        smiles = synthetic_corpus(430, seed=9)

        # uninterrupted 4-epoch run
        cfg_full = PretrainConfig(epochs=4, save_every_epochs=100,
                                  ckpt_dir=str(tmp_path / "full"), **base)
        pf = Pretrainer(cfg_full).setup_data(smiles)
        pf.setup_state(next(iter(pf.train_iter))[0])
        hist_full = pf.train(log=lambda *_: None)
        assert pf._unit_stack is not None

        # 2 epochs, checkpoint, resume for epochs 2-3
        cfg1 = PretrainConfig(epochs=4, save_every_epochs=2,
                              ckpt_dir=str(tmp_path / "a"), **base)
        p1 = Pretrainer(cfg1).setup_data(smiles)
        p1.setup_state(next(iter(p1.train_iter))[0])
        # stop after 2 epochs by training a 2-epoch schedule? No — the
        # schedule must match the 4-epoch run, so train the full config
        # but interrupt via epochs override on a copy:
        import dataclasses

        p1.cfg = dataclasses.replace(cfg1)  # keep schedule from setup
        orig_epochs = p1.cfg.epochs
        p1.cfg.epochs = 2
        p1.train(log=lambda *_: None)
        p1.cfg.epochs = orig_epochs
        ckpt = latest_checkpoint(cfg1.ckpt_dir)
        assert ckpt is not None

        cfg2 = PretrainConfig(epochs=4, save_every_epochs=100,
                              ckpt_dir=str(tmp_path / "b"),
                              resume_from=ckpt, **base)
        p2 = Pretrainer(cfg2).setup_data(smiles)
        p2.setup_state(next(iter(p2.train_iter))[0])
        assert p2._start_epoch == 2
        hist_res = p2.train(log=lambda *_: None)
        assert p2._unit_stack is not None
        assert len(hist_res) == 2
        got = [h["train_loss"] for h in hist_res]
        want = [h["train_loss"] for h in hist_full[2:]]
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)
