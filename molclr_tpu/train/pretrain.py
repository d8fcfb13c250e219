"""MolCLR contrastive pretraining loop (ref molclr.py:33-177, TPU-native).

Differences from the reference by design:
  - molecules are featurized once; the two augmented views are produced
    on-device inside the jitted train step (data/augment.py), not in
    DataLoader workers;
  - the whole step (2x encoder fwd+bwd + NT-Xent) is one XLA computation;
  - bf16 activations optional (replaces apex amp O2, molclr.py:93-96);
  - checkpoints are Orbax trees (+ config snapshot), best-by-validation and
    periodic, mirroring molclr.py:131-143.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from molclr_tpu.data.augment import paired_augment
from molclr_tpu.data.loader import (
    BatchIterator,
    featurize_many,
    read_pretrain_smiles,
    spec_for_graphs,
)
from molclr_tpu.losses import nt_xent_loss
from molclr_tpu.models import MolCLRNet, resolve_fused
from molclr_tpu.train import checkpoints as ckpt_lib
from molclr_tpu.train.config import PretrainConfig, to_dict
from molclr_tpu.train.optim import adam_torch, warmup_then_cosine
from molclr_tpu.train.state import TrainState


class Pretrainer:
    def __init__(self, cfg: PretrainConfig):
        self.cfg = cfg
        m = cfg.model
        self.model = MolCLRNet(
            num_layers=m.num_layers, emb_dim=m.emb_dim, feat_dim=m.feat_dim,
            gnn_type=m.gnn_type, pool=m.pool, drop_ratio=m.drop_ratio,
            normalize_gcn=m.normalize_gcn,
            bn_axis_name=cfg.data_axis or None,
            dtype=jnp.bfloat16 if m.bf16 else jnp.float32,
            tile=m.tile,
            fused=resolve_fused(m.fused, m.gnn_type, m.tile))
        self._train_step = None
        self._eval_step = None

    # ---- data ----
    def setup_data(self, smiles: list[str] | None = None):
        """Featurize and split the corpus. Three sources, in precedence:
        an explicit `smiles` list; a prepared on-disk featurized corpus
        (cfg.data_path names a data/corpus.py directory — memory-mapped,
        zero featurization at startup); or a SMILES text file (featurized
        in memory, the round-1 path)."""
        cfg = self.cfg
        from molclr_tpu.data.corpus import is_disk_corpus

        if smiles is None and cfg.data_path \
                and is_disk_corpus(cfg.data_path):
            from molclr_tpu.data.corpus import CorpusSubset, DiskCorpus

            corpus = DiskCorpus(cfg.data_path)
            if bool(corpus.meta.get("add_hs")) != (cfg.aug == "mix"):
                raise ValueError(
                    f"corpus {cfg.data_path} was built with add_hs="
                    f"{corpus.meta.get('add_hs')} but aug={cfg.aug!r} "
                    f"needs add_hs={cfg.aug == 'mix'}; rebuild with "
                    f"cli.featurize --add-hs accordingly")
            keep = np.flatnonzero(
                np.asarray(corpus.max_degrees) <= cfg.max_degree)
            rng = np.random.RandomState(cfg.seed)
            order = keep[rng.permutation(len(keep))]
            n_valid = int(len(order) * cfg.valid_size)
            valid_ids, train_ids = order[:n_valid], order[n_valid:]
            train_ids, valid_ids = self._process_shard(train_ids, valid_ids)
            train = CorpusSubset(corpus, train_ids)
            valid = CorpusSubset(corpus, valid_ids)
            self.spec = spec_for_graphs(
                CorpusSubset(corpus, keep), cfg.batch_size,
                cfg.max_degree, cfg.pad_slack, cfg.pad_quantile,
                tile=cfg.model.tile, sizing=cfg.pad_sizing)
            self._mean_real_nodes = (float(train.atom_counts.mean())
                                     * cfg.batch_size if len(train) else 0.0)
            self._mean_real_edges = (float(train.edge_counts.mean())
                                     * cfg.batch_size if len(train) else 0.0)
            max_atoms = (int(np.asarray(corpus.atom_counts)[keep].max())
                         if len(keep) else 2)
        else:
            if smiles is None:
                smiles = read_pretrain_smiles(cfg.data_path)
            graphs, _ = featurize_many(smiles, add_hs=(cfg.aug == "mix"),
                                       max_degree=cfg.max_degree,
                                       processes=cfg.featurize_processes)
            rng = np.random.RandomState(cfg.seed)
            order = rng.permutation(len(graphs))
            n_valid = int(len(graphs) * cfg.valid_size)
            valid_ids, train_ids = order[:n_valid], order[n_valid:]
            train_ids, valid_ids = self._process_shard(train_ids, valid_ids)
            train = [graphs[i] for i in train_ids]
            valid = [graphs[i] for i in valid_ids]
            self.spec = spec_for_graphs(graphs, cfg.batch_size,
                                        cfg.max_degree,
                                        cfg.pad_slack, cfg.pad_quantile,
                                        tile=cfg.model.tile,
                                        sizing=cfg.pad_sizing)
            self._mean_real_nodes = float(np.mean(
                [g.n_atoms for g in train])) * cfg.batch_size \
                if train else 0.0
            self._mean_real_edges = float(np.mean(
                [g.edge_src.shape[0] for g in train])) * cfg.batch_size \
                if train else 0.0
            max_atoms = (max(g.n_atoms for g in graphs) if graphs else 2)
        # BFS horizon for subgraph/mix: the reference BFS is unbounded
        # (dataset_subgraph.py:70-88); max atoms - 1 upper-bounds every
        # graph eccentricity, so wave-BFS removal can never under-remove
        # (capped at 2000 so the rank key (max_waves+1) << 20 stays in
        # int32 — no real molecule approaches that diameter)
        self._max_waves = (cfg.max_waves if cfg.max_waves > 0
                           else max(1, min(int(max_atoms) - 1, 2000)))
        self.train_iter = BatchIterator(
            train, self.spec, shuffle=True,
            drop_last=True, seed=cfg.seed,
            cache_packed=0 < len(train_ids) <= cfg.pack_cache_max_mols)
        self.valid_iter = BatchIterator(
            valid, self.spec, shuffle=False,
            drop_last=False, seed=cfg.seed,
            cache_packed=0 < len(valid_ids) <= cfg.pack_cache_max_mols)
        return self

    @staticmethod
    def _process_shard(train_ids, valid_ids):
        """Multi-host: every process computes the IDENTICAL seeded shuffle
        and split, then keeps only its contiguous slice of each — host
        featurization/packing scales out with processes and no host ever
        touches the global corpus. Single-process: unchanged."""
        if jax.process_count() <= 1:
            return train_ids, valid_ids
        from molclr_tpu.parallel.multihost import corpus_shard_range

        rt = corpus_shard_range(len(train_ids))
        rv = corpus_shard_range(len(valid_ids))
        return train_ids[rt.start:rt.stop], valid_ids[rv.start:rv.stop]

    # ---- model/optimizer ----
    def setup_state(self, example_batch):
        cfg = self.cfg
        variables = self.model.init(jax.random.PRNGKey(cfg.seed),
                                    example_batch, train=False)
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        self._start_epoch = 0
        steps_per_epoch = max(1, len(self.train_iter))
        if cfg.data_axis:
            # one DP OPTIMIZER step consumes a device-group of batches:
            # the schedule must count optimizer steps, not batches, or the
            # cosine phase advances n_dev x too slowly on a pod (epoch
            # boundaries are drop_last at device-group granularity).
            # train_iter is PER-PROCESS (sharded by _process_shard), so
            # the divisor is the LOCAL device count — dividing by the
            # global count would undercount by process_count on pods
            steps_per_epoch = max(
                1, steps_per_epoch // jax.local_device_count())
            if jax.process_count() > 1:
                # corpus_shard_range slices can differ by one batch across
                # processes; without agreement each process would bake a
                # DIFFERENT cosine schedule and apply different LRs to
                # supposedly replicated params (grads are pmean'd but
                # updates are local) — silent cross-replica divergence
                # (ADVICE r4). min matches the s_dp agreement the units
                # path already does in _maybe_upload_units_dp.
                from molclr_tpu.parallel import make_mesh
                from molclr_tpu.parallel.multihost import agree_ints

                (steps_per_epoch,) = agree_ints(
                    (steps_per_epoch,), make_mesh(axis=cfg.data_axis),
                    cfg.data_axis, op="min")
        self._sched_steps_per_epoch = steps_per_epoch
        self.schedule = warmup_then_cosine(cfg.init_lr, steps_per_epoch,
                                           cfg.epochs, cfg.warm_up)
        if cfg.adam_impl == "fused":
            from molclr_tpu.train.optim import adam_torch_fused

            self.tx = adam_torch_fused(self.schedule, cfg.weight_decay)
        elif cfg.adam_impl == "chain":
            self.tx = adam_torch(self.schedule, cfg.weight_decay)
        else:
            raise ValueError(f"unknown adam_impl {cfg.adam_impl!r}")
        full = None
        if cfg.resume_from:
            params, stats, full = self._resume(params, stats)
        self.state = TrainState(params=params, batch_stats=stats,
                                opt_state=self.tx.init(params), step=0)
        if full is not None:
            # full-state resume: optimizer moments, step count (and thus the
            # LR schedule position) and epoch continue where they left off —
            # the reference restarts schedules on resume (molclr.py:149-158)
            self.state = TrainState(params=full["params"],
                                    batch_stats=full["batch_stats"],
                                    opt_state=full["opt_state"],
                                    step=int(full["step"]))
            self._start_epoch = int(full["epoch"]) + 1
            # continue the data stream too: epoch shuffles are seeded by
            # (seed + epoch counter), so advance the iterators past the
            # epochs the original run already consumed
            self.train_iter.set_epoch(self._start_epoch)
            self.valid_iter.set_epoch(self._start_epoch)
        return self

    def _resume(self, params, stats):
        """Returns (params, stats, full_state_or_None). Accepts a torch
        .pth (weights-only transfer), a full-state Orbax checkpoint
        (resumes optimizer/step/epoch), or a weights-only Orbax dir."""
        path = self.cfg.resume_from
        if path.endswith(".pth"):
            imported_p, imported_s = ckpt_lib.import_torch_params(
                ckpt_lib.load_torch_state_dict(path),
                gnn_type=self.cfg.model.gnn_type)
            return (ckpt_lib.transfer_params(imported_p, params),
                    ckpt_lib.transfer_params(imported_s, stats), None)
        # adam_impl='chain' vs 'fused' carry structurally different opt
        # states; a wrong-impl resume would fail deep in Orbax (or worse,
        # partially restore). The stamp written at save time turns that
        # into a clear, early error (ADVICE r4).
        meta_path = os.path.join(path, "train_meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                saved_impl = json.load(f).get("adam_impl")
            if saved_impl and saved_impl != self.cfg.adam_impl:
                raise ValueError(
                    f"checkpoint {path} was written with adam_impl="
                    f"{saved_impl!r} but this run has adam_impl="
                    f"{self.cfg.adam_impl!r}; their opt states are "
                    f"structurally different — set cfg.adam_impl="
                    f"{saved_impl!r} to resume")
        try:
            full = ckpt_lib.load_checkpoint(path, {
                "params": params, "batch_stats": stats,
                "opt_state": self.tx.init(params),
                "step": 0, "epoch": 0})
            return full["params"], full["batch_stats"], full
        except Exception as e:
            print(f"WARNING: full-state restore from {path} failed "
                  f"({type(e).__name__}: {e}); falling back to "
                  f"weights-only — optimizer moments, step count and the "
                  f"LR schedule RESTART from zero")
            restored = ckpt_lib.load_checkpoint(
                path, {"params": params, "batch_stats": stats})
            return restored["params"], restored["batch_stats"], None

    # ---- jitted steps ----
    def _build_steps(self):
        model, cfg = self.model, self.cfg
        # sort-free windowed bond ranking bound (0 before setup_data)
        bond_window = getattr(getattr(self, "spec", None),
                              "max_graph_bonds", 0)
        # corpus-derived BFS horizon (setup_data; explicit cfg wins)
        max_waves = getattr(self, "_max_waves", 0) or cfg.max_waves or 0

        from molclr_tpu.parallel.dp import resolve_ntxent

        # 'auto' resolves at trace time from the ACTUAL per-call pair
        # count (the units path trains on t*G_t graph slots, not
        # cfg.batch_size — ADVICE r4); single-chip calls carry no
        # axis_name, so n_devices only scales the DP estimate
        loss_impl = resolve_ntxent(
            cfg.ntxent_impl,
            n_devices=jax.device_count() if cfg.data_axis else 1)

        def loss_fn(params, batch_stats, batch, rng, views=None):
            rng_aug, rng_di, rng_dj = jax.random.split(rng, 3)
            if views is not None:
                vi, vj = views
            else:
                vi, vj = paired_augment(batch, rng_aug, cfg.aug,
                                        tile=cfg.model.tile,
                                        bond_window=bond_window,
                                        max_waves=max_waves)
            if cfg.concat_views:
                from molclr_tpu.data.graphs import concat_views

                both = concat_views(vi, vj)
                (_, z), upd = model.apply(
                    {"params": params, "batch_stats": batch_stats}, both,
                    train=True, rngs={"dropout": rng_di},
                    mutable=["batch_stats"])
                g = batch.num_graphs
                zi, zj = z[:g], z[g:]
            else:
                (_, zi), upd = model.apply(
                    {"params": params, "batch_stats": batch_stats}, vi,
                    train=True, rngs={"dropout": rng_di},
                    mutable=["batch_stats"])
                (_, zj), upd = model.apply(
                    {"params": params, "batch_stats": upd["batch_stats"]},
                    vj, train=True, rngs={"dropout": rng_dj},
                    mutable=["batch_stats"])
            loss = loss_impl(zi.astype(jnp.float32),
                             zj.astype(jnp.float32),
                             cfg.temperature, cfg.use_cosine_similarity,
                             cfg.data_axis or None,
                             pair_mask=batch.graph_mask)
            return loss, upd["batch_stats"]

        def train_step(state, batch, rng, views=None):
            rng = jax.random.fold_in(rng, state.step)
            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.batch_stats,
                                       batch, rng, views)
            if cfg.data_axis:
                grads = jax.lax.pmean(grads, cfg.data_axis)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = jax.tree_util.tree_map(
                lambda p, u: p + u, state.params, updates)
            return TrainState(params=params, batch_stats=new_stats,
                              opt_state=opt_state, step=state.step + 1), loss

        from molclr_tpu.data.augment import (
            apply_view_delta,
            precompute_deltas_for,
        )

        aug_pre = cfg.aug_precompute and cfg.aug != "none"

        def _deltas_for(get_batch, n, start_step, rng):
            """Both views' augmented-field deltas for scan steps 0..n-1 in
            one batched (chunk-vmapped) computation — augmentation is
            train-state independent, and in-step it is overhead-bound
            (~0.40 ms standalone vs ~0.29 ms marginal at B=512 on v5e;
            runs/r4_experiments.json A). The rng protocol matches
            train_step exactly: step i augments with
            split(fold_in(rng, start_step + i), 3)[0]."""
            return precompute_deltas_for(
                get_batch,
                lambda i: jax.random.split(
                    jax.random.fold_in(rng, start_step + i), 3)[0],
                n, cfg.aug, tile=cfg.model.tile, bond_window=bond_window,
                max_waves=max_waves)

        def _scan_with_deltas(state, get_batch, n, rng):
            deltas = _deltas_for(get_batch, n, state.step, rng)

            def body(st, i):
                b = get_batch(i)
                di, dj = jax.tree_util.tree_map(lambda x: x[i], deltas)
                views = (apply_view_delta(b, di), apply_view_delta(b, dj))
                return train_step(st, b, rng, views)

            return jax.lax.scan(body, state,
                                jnp.arange(n, dtype=jnp.int32))

        def multi_step(state, stacked_batches, rng):
            """S train steps in one dispatch: real data per step via a scan
            over the stacked batch axis (amortizes the per-dispatch overhead
            of the TPU runtime)."""
            if aug_pre:
                n = jax.tree_util.tree_leaves(
                    stacked_batches)[0].shape[0]
                get_batch = lambda i: jax.tree_util.tree_map(
                    lambda x: x[i], stacked_batches)
                return _scan_with_deltas(state, get_batch, n, rng)
            return jax.lax.scan(
                lambda s, b: train_step(s, b, rng), state, stacked_batches)

        def multi_step_resident(state, stack, idxs, rng):
            """Scan over the DEVICE-RESIDENT batch cache: `stack` is the
            whole epoch's packed batches stacked on HBM; `idxs` selects this
            dispatch's (shuffled) batches. No host->device data movement per
            step — the epoch's only uploads are the index vectors."""
            get_batch = lambda i: jax.tree_util.tree_map(
                lambda x: x[idxs[i]], stack)
            if aug_pre:
                return _scan_with_deltas(state, get_batch,
                                         idxs.shape[0], rng)

            def body(s, i):
                return train_step(s, get_batch(i), rng)
            return jax.lax.scan(body, state,
                                jnp.arange(idxs.shape[0],
                                           dtype=jnp.int32))

        def multi_step_units(state, ustack, idx_mat, rng):
            """Scan over a [F, T] unit-index matrix: each step regroups T
            tile-units from the device-resident unit stack into one fresh
            batch ON-DEVICE (data/regroup.py concat_units) and trains on
            it — per-epoch fresh batch compositions (reference DataLoader
            reshuffle semantics, dataset/dataset.py:179-183) with zero
            host traffic beyond the index matrix."""
            from molclr_tpu.data.regroup import concat_units

            get_batch = lambda i: concat_units(ustack, idx_mat[i])
            if aug_pre:
                return _scan_with_deltas(state, get_batch,
                                         idx_mat.shape[0], rng)

            def body(st, i):
                return train_step(st, get_batch(i), rng)

            return jax.lax.scan(body, state,
                                jnp.arange(idx_mat.shape[0],
                                           dtype=jnp.int32))

        def eval_multi(state, stack, rng):
            """All validation batches in one dispatch over the device-
            resident eval stack (same per-batch rng stream as the loop)."""
            n = jax.tree_util.tree_leaves(stack)[0].shape[0]

            def body(_, i):
                b = jax.tree_util.tree_map(lambda x: x[i], stack)
                return None, eval_step(state, b, jax.random.fold_in(rng, i))

            return jax.lax.scan(body, None,
                                jnp.arange(n, dtype=jnp.int32))[1]

        def eval_step(state, batch, rng):
            vi, vj = paired_augment(batch, rng, cfg.aug,
                                    tile=cfg.model.tile,
                                    bond_window=bond_window,
                                    max_waves=max_waves)
            _, zi = model.apply({"params": state.params,
                                 "batch_stats": state.batch_stats}, vi,
                                train=False)
            _, zj = model.apply({"params": state.params,
                                 "batch_stats": state.batch_stats}, vj,
                                train=False)
            return nt_xent_loss(zi.astype(jnp.float32),
                                zj.astype(jnp.float32),
                                cfg.temperature, cfg.use_cosine_similarity,
                                pair_mask=batch.graph_mask)

        if cfg.data_axis:
            # data-parallel: the per-device step runs under shard_map with
            # psum/all_gather bound to the mesh axis (plain jit would hit
            # unbound axis names)
            from molclr_tpu.parallel import (
                build_dp_pretrain_step,
                make_mesh,
            )

            self.mesh = make_mesh(axis=cfg.data_axis)
            self._dp_step = build_dp_pretrain_step(
                model, self.tx, self.mesh, aug=cfg.aug,
                temperature=cfg.temperature,
                use_cosine=cfg.use_cosine_similarity, axis=cfg.data_axis,
                tile=cfg.model.tile, bond_window=bond_window,
                max_waves=max_waves, ntxent_impl=cfg.ntxent_impl)
            from molclr_tpu.parallel import build_dp_multi_step_resident

            self._dp_multi_resident = build_dp_multi_step_resident(
                model, self.tx, self.mesh, aug=cfg.aug,
                temperature=cfg.temperature,
                use_cosine=cfg.use_cosine_similarity, axis=cfg.data_axis,
                tile=cfg.model.tile, bond_window=bond_window,
                max_waves=max_waves, ntxent_impl=cfg.ntxent_impl,
                aug_precompute=cfg.aug_precompute)
            if cfg.model.tile > 0:
                from molclr_tpu.parallel import build_dp_multi_step_units

                self._dp_multi_units = build_dp_multi_step_units(
                    model, self.tx, self.mesh, aug=cfg.aug,
                    temperature=cfg.temperature,
                    use_cosine=cfg.use_cosine_similarity,
                    axis=cfg.data_axis, tile=cfg.model.tile,
                    bond_window=bond_window, max_waves=max_waves,
                    ntxent_impl=cfg.ntxent_impl,
                    aug_precompute=cfg.aug_precompute)
            else:
                self._dp_multi_units = None
            self._train_step = None
            self._multi_step = None
        else:
            self._train_step = jax.jit(train_step, donate_argnums=(0,))
            self._multi_step = jax.jit(multi_step, donate_argnums=(0,))
            wire_dtypes = (self._wire_dtypes(self.spec)
                           if getattr(self, "spec", None) else None)
            if wire_dtypes is not None:
                widen = self._widen_fn(wire_dtypes)

                def multi_step_wire(state, wire, rng):
                    return multi_step(state, widen(wire), rng)

                self._multi_step_wire = jax.jit(multi_step_wire,
                                                donate_argnums=(0,))
            else:
                self._multi_step_wire = None
            self._multi_step_resident = jax.jit(multi_step_resident,
                                                donate_argnums=(0,))
            self._multi_step_units = jax.jit(multi_step_units,
                                             donate_argnums=(0,))
        self._eval_step = jax.jit(eval_step)
        self._eval_multi = jax.jit(eval_multi)
        self._eval_stack = None
        self._device_stack = None
        self._unit_stack = None
        self._n_units = 0
        self._units_per_batch = 0
        self._dp_unit_stack = None
        self._dp_shard_size = 0
        self._device_cache_used_mb = 0.0

    # ---- loops ----
    def _dispatch(self, batches, rng, log, epoch, cfg):
        if cfg.data_axis:
            from molclr_tpu.parallel import stack_batches

            n_dev = self.mesh.shape[cfg.data_axis]
            losses = []
            for lo in range(0, len(batches) - n_dev + 1, n_dev):
                stacked = stack_batches(batches[lo : lo + n_dev])
                self.state, loss = self._dp_step(self.state, stacked, rng)
                losses.append(float(loss))
            return losses
        if len(batches) == 1:
            self.state, loss = self._train_step(self.state, batches[0], rng)
            losses = [float(loss)]
        else:
            stacked = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs, axis=0), *batches)
            self.state, loss_arr = self._multi_step(self.state, stacked, rng)
            losses = [float(x) for x in np.asarray(loss_arr)]
        step = int(self.state.step)
        if step % cfg.log_every_steps < len(batches):
            log(f"epoch {epoch} step {step} loss {losses[-1]:.4f} "
                f"lr {float(self.schedule(step)):.6f}")
        return losses

    def _host_superbatches(self, s_fold: int):
        """Generator of device-resident stacked superbatches (or a final
        remainder list) for one epoch — runs inside the prefetch thread so
        packing, stacking and the host->device transfer all overlap the
        previous dispatch."""
        fast = self._native_superbatches(s_fold)
        if fast is not None:
            yield from fast
            return
        pending = []
        for batch, _, _ in self.train_iter:
            pending.append(batch)
            if len(pending) < s_fold:
                continue
            stacked = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs, axis=0), *pending)
            yield jax.device_put(stacked)
            pending = []
        if pending:
            yield pending

    @staticmethod
    def _wire_dtypes(spec):
        """Narrow per-field wire dtypes for streaming uploads: every index
        field's bound is known from the PadSpec, so node/bond indices ship
        as int16 and categorical codes as int8 when they fit (2.4x fewer
        bytes over the relay tunnel — the streaming path's bottleneck).
        Returns None when the spec exceeds int16 range (fall back to
        full-width uploads)."""
        if max(spec.n_nodes, spec.n_edges, spec.n_bonds + 1) >= (1 << 15):
            return None
        return {
            "atom_type": np.int8, "chirality": np.int8,       # <= 118 / 2
            "node_graph": np.int16, "node_mask": np.uint8,
            "src": np.int16, "dst": np.int16,
            "bond_type": np.int8, "bond_dir": np.int8,
            "edge_bond": np.int16, "edge_mask": np.uint8,
            "nbr": np.int16, "nbr_bond_type": np.int8,
            "nbr_bond_dir": np.int8, "nbr_bond": np.int16,
            "nbr_mask": np.uint8,
            "bond_graph": np.int16, "bond_mask": np.uint8,
            "graph_mask": np.uint8, "graph_n_nodes": np.int16,
            "graph_n_bonds": np.int16,
        }

    def _widen_fn(self, wire_dtypes):
        """Jit-side inverse of the wire narrowing: rebuild the int32/bool
        GraphBatch the model expects (one fused convert per superbatch)."""
        from molclr_tpu.data.graphs import GraphBatch

        def widen(wire):
            return GraphBatch(**{
                k: (v.astype(jnp.bool_) if wire_dtypes[k] == np.uint8
                    else v.astype(jnp.int32))
                for k, v in wire.items()})

        return widen

    def _native_superbatches(self, s_fold: int):
        """Streaming fast path for DiskCorpus-backed training too large for
        the packed-batch caches: the whole superbatch is assembled by ONE
        native call per batch straight from the memory-mapped corpus
        (native.pack_superbatch_indexed — no Python object per molecule,
        no per-batch concatenation, no np.stack; 0.75 ms/batch vs 16.4 ms
        through BatchIterator on the 2M-molecule soak corpus). Returns
        None when inapplicable (in-memory graphs, native unavailable, or
        cache_packed corpora where the resident-HBM path is better)."""
        it = self.train_iter
        from molclr_tpu.data.corpus import CorpusSubset

        if it.cache_packed or not isinstance(it.graphs, CorpusSubset):
            return None
        corpus = it.graphs.corpus
        if not hasattr(corpus, "_node"):
            return None
        from molclr_tpu import native

        if not native.native_available():
            return None
        sub = it.graphs
        b = it.batch_size
        spec = self.spec

        def gen():
            # identical shuffle stream to BatchIterator.__iter__ (epoch
            # counter advances the same way, keeping resume semantics)
            rng = np.random.RandomState(it.seed + it._epoch)
            it.set_epoch(it._epoch + 1)
            order = rng.permutation(len(sub))
            stop = len(sub) - len(sub) % b        # drop_last
            gids = np.asarray(sub.ids)[order[:stop]].reshape(-1, b)
            n_batches = gids.shape[0]
            wire = self._wire_dtypes(spec)
            full = n_batches - n_batches % s_fold
            for lo in range(0, full, s_fold):
                sb = native.pack_superbatch_indexed(
                    corpus, gids[lo: lo + s_fold], spec)
                if wire is None:
                    yield jax.device_put(sb)
                else:
                    # narrow to the wire dtypes on the host (cheap astype
                    # in the prefetch thread) -> 2.4x fewer tunnel bytes;
                    # widened back on-device by _multi_step_wire
                    yield jax.device_put(
                        {k: np.asarray(getattr(sb, k)).astype(d)
                         for k, d in wire.items()})
            if full < n_batches:
                rest = []
                for r in range(full, n_batches):
                    one = native.pack_superbatch_indexed(
                        corpus, gids[r: r + 1], spec)
                    rest.append(jax.tree_util.tree_map(
                        lambda x: x[0], one))
                yield rest

        return gen()

    def _log_step(self, log, epoch, losses, cfg):
        step = int(self.state.step)
        if losses and step % cfg.log_every_steps < len(losses):
            log(f"epoch {epoch} step {step} loss {losses[-1]:.4f} "
                f"lr {float(self.schedule(step)):.6f}")

    def _maybe_upload_cache(self, log):
        """Once the host batch cache exists (after the first full epoch),
        stack it and upload to HBM if it fits the device_cache_mb budget.
        Under data parallelism the cache is SHARDED across the mesh (each
        device holds 1/n_dev of the epoch; per-shard shuffling thereafter),
        so the budget check is per-device.

        With cfg.fresh_compositions (single-chip, tile > 0) the upload is
        a TILE-UNIT stack instead of frozen packed batches: every epoch
        thereafter re-draws batch membership on-device
        (data/regroup.py)."""
        cfg = self.cfg
        if (self._device_stack is not None
                or self._unit_stack is not None
                or not cfg.device_cache_mb):
            return
        cache = getattr(self.train_iter, "cache", None)
        if not cache:
            return
        if (cfg.fresh_compositions and not cfg.data_axis
                and cfg.model.tile > 0):
            if self._maybe_upload_units(log):
                return
        if (cfg.fresh_compositions and cfg.data_axis
                and cfg.model.tile > 0
                and self._dp_multi_units is not None):
            if self._maybe_upload_units_dp(log):
                return
        batches = [gb for gb, _, _ in cache]
        per = sum(np.asarray(x).nbytes
                  for x in jax.tree_util.tree_leaves(batches[0]))
        total_mb = per * len(batches) / 2**20
        n_dev = self.mesh.shape[cfg.data_axis] if cfg.data_axis else 1
        # batches are process-LOCAL: per-device budget divides by the
        # local device count (== n_dev when single-process)
        per_dev_mb = total_mb / min(n_dev, jax.local_device_count())
        if self._device_cache_used_mb + per_dev_mb > cfg.device_cache_mb:
            log(f"packed-batch cache {per_dev_mb:.0f} MB/device exceeds "
                f"device_cache_mb={cfg.device_cache_mb}; staying host-side")
            return
        if cfg.data_axis:
            from molclr_tpu.parallel import (
                shard_batch_cache,
                shard_batch_cache_global,
            )

            multihost = jax.process_count() > 1
            n_dev_local = jax.local_device_count() if multihost else n_dev
            if len(batches) < n_dev_local:
                log(f"{len(batches)} cached batches < {n_dev_local} local "
                    f"devices; staying host-side")
                return
            if multihost:
                # each process contributes its LOCAL batches; the global
                # cache array is assembled without any host holding it
                self._device_stack, self._dp_shard_size, dropped = (
                    shard_batch_cache_global(batches, self.mesh,
                                             cfg.data_axis))
            else:
                self._device_stack, self._dp_shard_size, dropped = (
                    shard_batch_cache(batches, self.mesh, cfg.data_axis))
            self._device_cache_used_mb += per_dev_mb
            msg = (f" ({dropped} remainder batches dropped at device "
                   f"granularity)" if dropped else "")
            log(f"uploaded {len(batches) - dropped}-batch cache sharded "
                f"over {n_dev} devices ({per_dev_mb:.0f} MB/device); "
                f"epochs are now transfer-free{msg}")
            return
        self._device_cache_used_mb += total_mb
        stacked = jax.tree_util.tree_map(
            lambda *xs: np.stack(xs, axis=0), *batches)
        self._device_stack = jax.device_put(stacked)
        log(f"uploaded {len(batches)}-batch cache ({total_mb:.0f} MB) to "
            f"device; epochs are now transfer-free")

    def _unit_narrow_map(self, uspec):
        """Narrow wire dtypes for a unit stack, or None. cfg.narrow_cache:
        'auto'/'on' narrow whenever the unit spec fits the wire dtypes —
        narrow is a PURE win on TPU: 2.4x fewer HBM bytes (what makes a
        PubChem-10M unit stack fit one v5e) AND the per-step unit-row
        takes move fewer bytes (measured 2.3x faster than full width,
        runs/r5_experiments.json concat_units_{narrow,wide}_ms); the
        widen-after-take is exact. 'off' forces full width."""
        cfg = self.cfg
        if cfg.narrow_cache == "off":
            return None
        return self._wire_dtypes(uspec)

    def _maybe_upload_units(self, log, plan_seed=None) -> bool:
        """Pack the train split into tile-units and upload the [U, ...]
        stack (one-time host work + one transfer). Units per step is
        chosen as U // steps_per_epoch so the number of optimizer steps
        per epoch — and therefore the baked LR schedule — is unchanged
        from the packed-batch path. Returns True when the units path is
        active.

        plan_seed overrides the shuffle seed that groups molecules into
        units (cfg.replan_units_every: periodic re-planning dissolves
        the within-unit co-batching that otherwise persists across
        epochs — ADVICE r4 low #4; a replan replaces the resident stack
        and its budget accounting).

        Corpus-scale path: when the train split is a DiskCorpus subset
        and the native packer is available, units are planned from the
        vectorized counts and packed straight from the memory-mapped
        buffers (no Python MolGraph per molecule), optionally in NARROW
        wire dtypes (int8/int16; concat_units widens on-device after the
        per-step row take) — at PubChem-10M the narrow stack is what
        makes the whole corpus HBM-resident (VERDICT r4 weak #1)."""
        cfg = self.cfg
        from molclr_tpu.data.corpus import CorpusSubset
        from molclr_tpu.data.regroup import (
            pack_unit_stack,
            plan_corpus_units,
            unit_stack_bytes,
        )

        graphs = self.train_iter.graphs
        if len(graphs) > cfg.pack_cache_max_mols:
            return False
        seed = cfg.seed if plan_seed is None else plan_seed
        # replan: the WORKING stack is kept until its replacement passes
        # every check below — a failed replan (budget, packer, planner)
        # must leave the old stack installed, not degrade a running
        # campaign to host streaming. Its budget share is treated as
        # already released for the new stack's budget check.
        replan_mb = (getattr(self, "_unit_stack_mb", 0.0)
                     if self._unit_stack is not None else 0.0)
        s_epoch = max(1, len(self.train_iter))
        corpus_path = isinstance(graphs, CorpusSubset)
        try:
            if corpus_path:
                from molclr_tpu import native

                if not native.native_available():
                    corpus_path = False
            if corpus_path:
                id_groups, uspec = plan_corpus_units(
                    graphs, cfg.model.tile, cfg.max_degree, seed=seed)
                u = len(id_groups)
                t = u // s_epoch
                if t < 1:
                    log(f"{u} tile-units < {s_epoch} steps/epoch; "
                        f"falling back to the frozen batch cache")
                    return False
                wide_mb = unit_stack_bytes(uspec, u) / 2**20
                narrow = self._unit_narrow_map(uspec)
                total_mb = unit_stack_bytes(uspec, u, narrow) / 2**20
                if (self._device_cache_used_mb - replan_mb + total_mb
                        > cfg.device_cache_mb):
                    log(f"tile-unit stack {total_mb:.0f} MB "
                        f"({'narrow' if narrow else 'full-width'}) "
                        f"exceeds device_cache_mb={cfg.device_cache_mb}; "
                        f"staying host-side")
                    return False
                t0 = time.time()
                stack = native.pack_unit_stack_indexed(
                    graphs.corpus, id_groups, uspec, narrow=narrow)
                if stack is None:
                    return False
                log(f"packed {u} units from the mmap'd corpus in "
                    f"{time.time() - t0:.1f} s"
                    + (f" (narrow wire dtypes, {total_mb:.0f} MB vs "
                       f"{wide_mb:.0f} full-width)" if narrow else ""))
            else:
                stack, uspec, units = pack_unit_stack(
                    graphs, cfg.model.tile, cfg.max_degree, seed=seed)
                u = len(units)
                t = u // s_epoch
                if t < 1:
                    log(f"{u} tile-units < {s_epoch} steps/epoch; "
                        f"falling back to the frozen batch cache")
                    return False
                narrow = self._unit_narrow_map(uspec)
                if narrow is not None:
                    stack = {f: np.asarray(getattr(stack, f)).astype(d)
                             for f, d in narrow.items()}
                total_mb = sum(np.asarray(x).nbytes for x in
                               jax.tree_util.tree_leaves(stack)) / 2**20
                if (self._device_cache_used_mb - replan_mb + total_mb
                        > cfg.device_cache_mb):
                    log(f"tile-unit stack {total_mb:.0f} MB exceeds "
                        f"device_cache_mb={cfg.device_cache_mb}; staying "
                        f"host-side")
                    return False
        except ValueError as e:
            log(f"fresh-compositions unit packing unavailable ({e}); "
                f"falling back to the frozen batch cache")
            return False
        if self._unit_stack is not None:  # replan passed: release old
            self._device_cache_used_mb -= replan_mb
            self._unit_stack = None
        self._unit_stack = jax.device_put(stack)
        self._unit_stack_mb = total_mb
        self._n_units, self._units_per_batch = u, t
        # the baked LR schedule's epoch length: every epoch runs EXACTLY
        # this many steps (the permutation's surplus rows — at most
        # t-1 units' worth — rotate out per epoch)
        self._units_s_epoch = s_epoch
        self._device_cache_used_mb += total_mb
        # throughput accounting: per-step real content is T/U of the corpus
        if corpus_path:
            n_edges = int(np.asarray(graphs.edge_counts).sum())
            n_nodes = int(np.asarray(graphs.atom_counts).sum())
        else:
            n_edges = sum(int(g.edge_src.shape[0]) for g in graphs)
            n_nodes = sum(int(g.n_atoms) for g in graphs)
        self._mean_real_edges = n_edges * t / u
        self._mean_real_nodes = n_nodes * t / u
        log(f"uploaded {u}-unit stack ({total_mb:.0f} MB"
            + (", narrow" if isinstance(stack, dict) else "")
            + f", {t} units x {cfg.model.tile} nodes per step, "
            f"{s_epoch} steps/epoch); epochs re-draw batch compositions "
            f"on-device")
        return True

    def _maybe_upload_units_dp(self, log) -> bool:
        """DP analog of _maybe_upload_units: shard the tile-unit stack
        across the mesh; every epoch each device regroups fresh batches
        from ITS OWN units (build_dp_multi_step_units). Units per device
        per step = U_dev // optimizer-steps-per-epoch, so the baked LR
        schedule's epoch length is unchanged.

        Multi-process pods: each process packs only ITS corpus shard's
        units with a cross-process AGREED unit spec (agree_ints over the
        local specs' dims — SPMD needs identical shapes) and the global
        stack assembles via make_array (shard_unit_stack_global); no
        host ever holds global data."""
        cfg = self.cfg
        from molclr_tpu.data.regroup import (
            pack_unit_stack,
            plan_units,
            unit_spec_for,
        )
        from molclr_tpu.data.graphs import PadSpec
        from molclr_tpu.parallel import shard_unit_stack
        from molclr_tpu.parallel.multihost import (
            agree_ints,
            shard_unit_stack_global,
        )

        graphs = self.train_iter.graphs
        if len(graphs) > cfg.pack_cache_max_mols:
            return False
        multihost = jax.process_count() > 1
        seed = cfg.seed + 7 * jax.process_index()
        try:
            uspec = None
            if multihost:
                order = np.random.RandomState(seed).permutation(
                    len(graphs))
                local = unit_spec_for(
                    plan_units([graphs[i] for i in order],
                               cfg.model.tile), cfg.model.tile,
                    cfg.max_degree)
                g_t, e_t, mb = agree_ints(
                    (local.n_graphs, local.n_edges,
                     local.max_graph_bonds),
                    self.mesh, cfg.data_axis, op="max")
                uspec = PadSpec(n_graphs=g_t, n_nodes=cfg.model.tile,
                                n_edges=e_t, max_degree=cfg.max_degree,
                                tile=cfg.model.tile, max_graph_bonds=mb)
            stack, uspec, units = pack_unit_stack(
                graphs, cfg.model.tile, cfg.max_degree, seed=seed,
                uspec=uspec)
        except ValueError as e:
            log(f"DP fresh-compositions unit packing unavailable ({e}); "
                f"falling back to the frozen sharded cache")
            return False
        u = len(units)
        n_dev = self.mesh.shape[cfg.data_axis]
        s_dp = self._sched_steps_per_epoch
        if multihost:
            (s_dp,) = agree_ints((s_dp,), self.mesh, cfg.data_axis,
                                 op="min")
        n_local = jax.local_device_count() if multihost else n_dev
        t = (u // n_local) // max(1, s_dp)
        if t < 1:
            log(f"{u} local tile-units over {n_local} local devices < "
                f"{s_dp} steps/epoch; falling back to the frozen "
                f"sharded cache")
            return False
        total_mb = sum(x.nbytes for x in
                       jax.tree_util.tree_leaves(stack)) / 2**20
        per_dev_mb = total_mb / n_local
        if self._device_cache_used_mb + per_dev_mb > cfg.device_cache_mb:
            log(f"tile-unit stack {per_dev_mb:.0f} MB/device exceeds "
                f"device_cache_mb={cfg.device_cache_mb}; staying "
                f"host-side")
            return False
        if multihost:
            self._dp_unit_stack, u_dev, dropped = shard_unit_stack_global(
                stack, self.mesh, cfg.data_axis)
            # t must be identical everywhere: derive from the agreed u_dev
            t = u_dev // max(1, s_dp)
            if t < 1:
                log(f"agreed {u_dev} units/device < {s_dp} steps/epoch; "
                    f"falling back to the frozen sharded cache")
                self._dp_unit_stack = None
                return False
        else:
            self._dp_unit_stack, u_dev, dropped = shard_unit_stack(
                stack, self.mesh, cfg.data_axis)
        self._dp_units_local = u_dev
        self._dp_units_per_batch = t
        self._dp_units_s_epoch = s_dp
        self._device_cache_used_mb += per_dev_mb
        n_edges = sum(int(g.edge_src.shape[0]) for g in graphs)
        n_nodes = sum(int(g.n_atoms) for g in graphs)
        self._mean_real_edges = n_edges * (n_local * t) / u
        self._mean_real_nodes = n_nodes * (n_local * t) / u
        log(f"uploaded {u_dev}-unit/device stack sharded over "
            f"{n_dev} devices ({per_dev_mb:.0f} MB/device, "
            f"{t} units x {cfg.model.tile} nodes per device-step, "
            f"{s_dp} steps/epoch); DP epochs re-draw batch compositions "
            f"on-device{f' ({dropped} local remainder units dropped)' if dropped else ''}")
        return True

    def _dp_epoch_orders(self):
        """Per-device local batch orders [n_dev, S] for one epoch over the
        sharded cache, derived from the iterator's global shuffle stream
        (device d's row is a permutation of its own shard in the relative
        order the global permutation induces)."""
        order = self.train_iter.cached_epoch_order()
        # the iterator (and hence `order`) covers this PROCESS's batches:
        # rows here are the local devices' shards; multihost assembles the
        # global index matrix per dispatch (assemble_rows)
        n_dev = min(self.mesh.shape[self.cfg.data_axis],
                    jax.local_device_count())
        s = self._dp_shard_size
        per_dev = np.zeros((n_dev, s), dtype=np.int32)
        pos = np.zeros(n_dev, dtype=np.int64)
        for o in order:
            if o >= s * n_dev:
                continue    # remainder batch not in the sharded stack
            d = o // s
            per_dev[d, pos[d]] = o % s
            pos[d] += 1
        return per_dev

    def validate(self, rng) -> float:
        if self._eval_stack is not None:
            losses = self._eval_multi(self.state, self._eval_stack, rng)
            return float(np.mean(np.asarray(losses)))
        losses = []
        for i, (batch, _, _) in enumerate(self.valid_iter):
            losses.append(float(self._eval_step(
                self.state, batch, jax.random.fold_in(rng, i))))
        # after a full pass the iterator's cache exists; keep eval batches
        # on device from now on (validation runs every epoch, and per-epoch
        # uploads over the tunnel otherwise dominate the short epochs)
        cache = getattr(self.valid_iter, "cache", None)
        if (cache and not self.cfg.data_axis and self.cfg.device_cache_mb
                and self._eval_stack is None):
            per = sum(np.asarray(x).nbytes
                      for x in jax.tree_util.tree_leaves(cache[0][0]))
            total_mb = per * len(cache) / 2**20
            over = (self._device_cache_used_mb + total_mb
                    > self.cfg.device_cache_mb)
            if over:
                return (float(np.float32(np.mean(losses))) if losses
                        else float("nan"))
            self._device_cache_used_mb += total_mb
            stacked = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs, axis=0),
                *[gb for gb, _, _ in cache])
            self._eval_stack = jax.device_put(stacked)
        # float32 cast: the resident path (_eval_multi) reduces in f32 on
        # device; casting the host path's f64 mean keeps a process's
        # FIRST validation (cache not yet resident — epoch 0, or the
        # first epoch after a resume) bit-comparable with steady-state
        # records
        return (float(np.float32(np.mean(losses))) if losses
                else float("nan"))

    def train(self, log=print):
        cfg = self.cfg
        if self._train_step is None:
            self._build_steps()
        # multi-process runs: process 0 owns metrics + checkpoints (params
        # and opt state are replicated, so its bytes are everyone's)
        is_main = jax.process_index() == 0
        from molclr_tpu.train.logging_util import MetricWriter, NullWriter

        if is_main:
            os.makedirs(cfg.ckpt_dir, exist_ok=True)
            with open(os.path.join(cfg.ckpt_dir, "config.json"), "w") as f:
                json.dump(to_dict(cfg), f, indent=2, default=str)
            writer = MetricWriter(cfg.ckpt_dir, tensorboard=cfg.tensorboard)
        else:
            writer = NullWriter()
        rng = jax.random.PRNGKey(cfg.seed + 1)
        best_val = float("inf")
        history = []
        # steps_per_dispatch == 0 -> AUTO: 8 on the host/streaming paths
        # (prefetch overlap granularity), the whole epoch on the
        # device-resident paths (resolved below where the epoch length is
        # known; each extra dispatch costs ~26 ms of relay latency)
        auto_fold = cfg.steps_per_dispatch == 0
        s_fold = max(1, cfg.steps_per_dispatch) if not auto_fold else 8
        if cfg.data_axis:
            # DP dispatches consume device-count groups: round the fold up
            # to a mesh multiple or an under-full group would never
            # dispatch (silently dropping every batch)
            n_dev = self.mesh.shape[cfg.data_axis]
            s_fold = n_dev * max(1, -(-s_fold // n_dev))
        # UPFRONT fresh-compositions activation: the tile-unit stack
        # packs straight from the featurized corpus, so there is no
        # reason to stream epoch 0 host-side first (that also made a
        # resumed run's first epoch diverge from the uninterrupted
        # stream); ineligible configs fall through to the usual paths
        if (cfg.fresh_compositions and cfg.model.tile > 0
                and cfg.device_cache_mb):
            if (not cfg.data_axis and self._unit_stack is None):
                # resume into a replanned stream: pack ONCE with the
                # seed of the last replan epoch <= start_epoch so the
                # resumed compositions match the uninterrupted run's
                # (packing with cfg.seed first and re-packing would cost
                # a second ~75 s pack + multi-GB upload at 10M)
                n = cfg.replan_units_every
                last = ((getattr(self, "_start_epoch", 0) // n) * n
                        if n else 0)
                if last > 0:
                    if self._maybe_upload_units(
                            log, plan_seed=cfg.seed + 7919 * last):
                        self._units_plan_epoch = last
                else:
                    self._maybe_upload_units(log)
            elif (cfg.data_axis and self._dp_unit_stack is None
                  and self._dp_multi_units is not None):
                if cfg.replan_units_every:
                    log("replan_units_every is not implemented for the "
                        "DP units path; training on the epoch-0 unit "
                        "plan (compositions still re-draw per epoch at "
                        "tile-unit granularity)")
                self._maybe_upload_units_dp(log)
        profiler_active = False
        if cfg.profile_dir:
            jax.profiler.start_trace(cfg.profile_dir)
            profiler_active = True
        from molclr_tpu.data.loader import prefetch_iter

        try:
            for epoch in range(getattr(self, "_start_epoch", 0), cfg.epochs):
                t0 = time.time()
                losses = []
                pending = []
                n_rp = cfg.replan_units_every
                if (self._unit_stack is not None and n_rp and epoch > 0
                        and epoch % n_rp == 0
                        and getattr(self, "_units_plan_epoch", 0)
                        != epoch):
                    # periodic unit RE-PLANNING: a fresh molecule shuffle
                    # dissolves within-unit co-batching (the reference
                    # DataLoader reshuffles at MOLECULE granularity;
                    # ADVICE r4 low #4). Off by default — a replan costs
                    # one host repack + upload (75 s + ~2 min at 10M).
                    if self._maybe_upload_units(
                            log, plan_seed=cfg.seed + 7919 * epoch):
                        self._units_plan_epoch = epoch
                if self._dp_unit_stack is not None:
                    # DP fresh-composition epoch: per-device unit
                    # selections, one [n_dev, S, T] index upload per
                    # dispatch (LOCAL rows assembled globally on pods)
                    from molclr_tpu.data.regroup import epoch_unit_orders

                    multihost = jax.process_count() > 1
                    n_local = (jax.local_device_count() if multihost
                               else self.mesh.shape[cfg.data_axis])
                    base = jax.process_index() * n_local
                    per_dev = np.stack([
                        epoch_unit_orders(
                            self._dp_units_local,
                            self._dp_units_per_batch,
                            cfg.seed + 104729 * (base + d + 1), epoch,
                        )[: self._dp_units_s_epoch]
                        for d in range(n_local)])    # [n_local, S, T]
                    fold = (per_dev.shape[1] if auto_fold
                            else max(1, cfg.steps_per_dispatch))
                    if multihost:
                        from molclr_tpu.parallel import assemble_rows
                    for lo in range(0, per_dev.shape[1], fold):
                        sl = np.ascontiguousarray(
                            per_dev[:, lo : lo + fold])
                        idxs = (assemble_rows(sl, self.mesh,
                                              cfg.data_axis)
                                if multihost else jnp.asarray(sl))
                        self.state, loss_arr = self._dp_multi_units(
                            self.state, self._dp_unit_stack, idxs, rng)
                        losses.extend(float(x)
                                      for x in np.asarray(loss_arr))
                    self._log_step(log, epoch, losses, cfg)
                elif self._unit_stack is not None:
                    # fresh-composition resident epoch: scan-folded
                    # dispatches regroup tile-units on-device; only the
                    # [S, T] unit-index matrix is uploaded per epoch
                    from molclr_tpu.data.regroup import epoch_unit_orders

                    orders = epoch_unit_orders(
                        self._n_units, self._units_per_batch, cfg.seed,
                        epoch)[: self._units_s_epoch]
                    fold = (orders.shape[0] if auto_fold
                            else max(1, cfg.steps_per_dispatch))
                    for lo in range(0, orders.shape[0], fold):
                        idxs = jnp.asarray(orders[lo : lo + fold])
                        self.state, loss_arr = self._multi_step_units(
                            self.state, self._unit_stack, idxs, rng)
                        losses.extend(float(x)
                                      for x in np.asarray(loss_arr))
                    self._log_step(log, epoch, losses, cfg)
                elif self._device_stack is not None and cfg.data_axis:
                    # DP device-resident epoch: scan-folded dispatches over
                    # the SHARDED HBM cache; the only upload per dispatch is
                    # the [n_dev, S] index matrix
                    per_dev = self._dp_epoch_orders()
                    fold = (per_dev.shape[1] if auto_fold
                            else max(1, cfg.steps_per_dispatch))
                    multihost = jax.process_count() > 1
                    if multihost:
                        from molclr_tpu.parallel import assemble_rows
                    for lo in range(0, per_dev.shape[1], fold):
                        if multihost:
                            idxs = assemble_rows(per_dev[:, lo : lo + fold],
                                                 self.mesh, cfg.data_axis)
                        else:
                            idxs = jnp.asarray(per_dev[:, lo : lo + fold])
                        self.state, loss_arr = self._dp_multi_resident(
                            self.state, self._device_stack, idxs, rng)
                        losses.extend(float(x) for x in np.asarray(loss_arr))
                    self._log_step(log, epoch, losses, cfg)
                elif self._device_stack is not None:
                    # device-resident epoch: dispatch scans over index vectors
                    # into the HBM batch cache; nothing but indices is uploaded
                    order = self.train_iter.cached_epoch_order()
                    fold = len(order) if auto_fold else s_fold
                    for lo in range(0, len(order), fold):
                        idxs = jnp.asarray(order[lo : lo + fold],
                                           dtype=jnp.int32)
                        self.state, loss_arr = self._multi_step_resident(
                            self.state, self._device_stack, idxs, rng)
                        losses.extend(float(x) for x in np.asarray(loss_arr))
                    self._log_step(log, epoch, losses, cfg)
                elif cfg.data_axis:
                    epoch_iter = (prefetch_iter(iter(self.train_iter),
                                                cfg.prefetch)
                                  if cfg.prefetch else self.train_iter)
                    for batch, _, _ in epoch_iter:
                        pending.append(batch)
                        if len(pending) < s_fold:
                            continue
                        losses.extend(self._dispatch(pending, rng, log, epoch,
                                                     cfg))
                        pending = []
                    # remainder smaller than one device-group is dropped
                    # (drop_last at superbatch granularity)
                    losses.extend(self._dispatch(pending, rng, log, epoch, cfg))
                    self._maybe_upload_cache(log)
                else:
                    # host path (corpus exceeds the HBM cache budget or first
                    # epoch): the prefetch thread packs, STACKS and UPLOADS the
                    # next superbatch while the device runs the current one
                    sb = self._host_superbatches(s_fold)
                    sb_iter = (prefetch_iter(sb, cfg.prefetch) if cfg.prefetch
                               else sb)
                    for item in sb_iter:
                        if isinstance(item, list):   # epoch remainder
                            for batch in item:
                                self.state, loss = self._train_step(
                                    self.state, batch, rng)
                                losses.append(float(loss))
                            continue
                        if isinstance(item, dict):   # narrow wire format
                            self.state, loss_arr = self._multi_step_wire(
                                self.state, item, rng)
                        else:
                            self.state, loss_arr = self._multi_step(
                                self.state, item, rng)
                        losses.extend(float(x) for x in np.asarray(loss_arr))
                    self._log_step(log, epoch, losses, cfg)
                    self._maybe_upload_cache(log)
                if profiler_active:
                    jax.block_until_ready(self.state.params)
                    jax.profiler.stop_trace()
                    profiler_active = False
                    log(f"profiler trace written to {cfg.profile_dir}")
                train_loss = float(np.mean(losses)) if losses else float("nan")
                # throughput accounting (SURVEY §5.1): message edges processed =
                # 2 views x layers x (real directed edges + self-loops) per step
                n_steps = len(losses)
                epoch_s = time.time() - t0
                edges_per_step = (2 * cfg.model.num_layers
                                  * (self._mean_real_edges
                                     + self._mean_real_nodes))
                record = {"epoch": epoch, "train_loss": train_loss,
                          "time_s": round(epoch_s, 2),
                          "steps": n_steps,
                          "edges_per_sec": round(
                              edges_per_step * n_steps / max(epoch_s, 1e-9))}
                if (epoch + 1) % cfg.eval_every_epochs == 0:
                    val = self.validate(jax.random.fold_in(rng, 10_000 + epoch))
                    record["valid_loss"] = val
                    if val < best_val and is_main:
                        best_val = val
                        ckpt_lib.save_checkpoint(
                            os.path.join(cfg.ckpt_dir, "best"), 0,
                            {"params": self.state.params,
                             "batch_stats": self.state.batch_stats},
                            force=True)
                stopping = (cfg.stop_after_epochs
                            and epoch + 1 >= cfg.stop_after_epochs
                            and epoch + 1 < cfg.epochs)
                if ((epoch + 1) % cfg.save_every_epochs == 0 or stopping) \
                        and is_main:
                    # periodic checkpoints carry the FULL train state so resume
                    # continues the optimizer/schedule (unlike the reference);
                    # a planned stop (cfg.stop_after_epochs) always saves
                    saved = ckpt_lib.save_checkpoint(
                        cfg.ckpt_dir, int(self.state.step),
                        {"params": self.state.params,
                         "batch_stats": self.state.batch_stats,
                         "opt_state": self.state.opt_state,
                         "step": int(self.state.step), "epoch": epoch})
                    # sidecar stamp: which optimizer impl shaped opt_state
                    # (resume validates it — see _resume)
                    with open(os.path.join(saved, "train_meta.json"),
                              "w") as f:
                        json.dump({"adam_impl": cfg.adam_impl}, f)
                history.append(record)
                writer.record(record)
                if stopping:
                    log(f"stop_after_epochs={cfg.stop_after_epochs}: "
                        f"breaking at epoch {epoch} (schedule baked for "
                        f"{cfg.epochs} epochs; resume continues it)")
                writer.scalars(int(self.state.step),
                               train_loss=train_loss,
                               cosine_lr_decay=float(
                                   self.schedule(int(self.state.step))),
                               validation_loss=record.get("valid_loss",
                                                          float("nan")),
                               edges_per_sec=record["edges_per_sec"])
                log(f"epoch {epoch}: {record}")
                if stopping:
                    break
        finally:
            if profiler_active:
                # pair start_trace even if the loop body raised
                # or never ran (resume past the last epoch)
                jax.profiler.stop_trace()
                log(f"profiler trace written to {cfg.profile_dir}")
            writer.close()
        return history
