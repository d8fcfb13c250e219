"""Worker for the REAL 2-process jax.distributed integration test
(tests/test_multihost.py::TestTwoProcessIntegration; VERDICT r3 weak #2).

Each process: init_distributed over a TCP coordinator -> keeps its
corpus_shard_range slice of the global packed-batch list ->
shard_batch_cache_global assembles the device-resident cache without any
host holding global data -> one scanned DP epoch (cross-replica BN psum,
global NT-Xent all_gather, grad pmean — all over gloo CPU collectives) ->
writes the per-step losses to a JSON file for the parent to compare
against the single-process 2-device run.

Usage: python multihost_worker.py <pid> <nproc> <port> <outdir> [mode]

mode 'dp' (default): hand-built DP resident epoch (loss parity with the
single-process 2-device run). mode 'pretrainer-units': the FULL
Pretrainer under data_axis with fresh_compositions — per-process unit
packing with a cross-process agreed spec, global stack assembly, and
per-epoch on-device regroup; asserts the units path activated and
writes the (replicated) loss history.
"""

import json
import sys


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]
    mode = sys.argv[5] if len(sys.argv) > 5 else "dp"

    import jax

    # CPU backend BEFORE any device touch (the axon plugin would grab the
    # TPU tunnel otherwise); one local device per process -> 2 global
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)

    from molclr_tpu.parallel import init_distributed

    init_distributed(coordinator=f"127.0.0.1:{port}", num_processes=nproc,
                     process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 1
    assert jax.device_count() == nproc

    import numpy as np

    if mode == "pretrainer-units":
        from molclr_tpu.data.synthetic import synthetic_corpus
        from molclr_tpu.train.config import ModelConfig, PretrainConfig
        from molclr_tpu.train.pretrain import Pretrainer

        cfg = PretrainConfig(
            batch_size=8, epochs=3, warm_up=1, aug="node",
            valid_size=0.1, seed=0, featurize_processes=0,
            eval_every_epochs=100, save_every_epochs=100,
            ckpt_dir=f"{outdir}/pre{pid}", device_cache_mb=512,
            data_axis="data",
            model=ModelConfig(gnn_type="gin", num_layers=2, emb_dim=32,
                              feat_dim=64, tile=64, drop_ratio=0.0))
        smiles = synthetic_corpus(900, seed=9)
        pre = Pretrainer(cfg).setup_data(smiles)
        pre.setup_state(next(iter(pre.train_iter))[0])
        history = pre.train(log=lambda *_: None)
        with open(f"{outdir}/worker{pid}.json", "w") as f:
            json.dump({"pid": pid, "mode": mode,
                       "process_count": jax.process_count(),
                       "units_active": pre._dp_unit_stack is not None,
                       "units_per_batch": int(pre._dp_units_per_batch
                                              or 0),
                       "steps": [h["steps"] for h in history],
                       "losses": [round(h["train_loss"], 6)
                                  for h in history]}, f)
        return

    from molclr_tpu.data import featurize_smiles, pack_batch
    from molclr_tpu.data.graphs import PadSpec
    from molclr_tpu.data.synthetic import synthetic_corpus
    from molclr_tpu.models import MolCLRNet
    from molclr_tpu.parallel import (
        assemble_rows,
        build_dp_multi_step_resident,
        shard_batch_cache_global,
    )
    from molclr_tpu.parallel.multihost import corpus_shard_range, \
        global_mesh
    from molclr_tpu.train.optim import adam_torch
    from molclr_tpu.train.state import TrainState

    # identical global corpus on every process; each keeps only its slice
    # of the BATCH list (batch granularity == the reference loader's unit)
    n_batches = 8
    smiles = synthetic_corpus(4 * n_batches, seed=3)
    graphs = [g for g in (featurize_smiles(s) for s in smiles)
              if g is not None and g.max_degree <= 6]
    max_bonds = max(g.edge_src.shape[0] // 2 for g in graphs)
    spec = PadSpec(n_graphs=4, n_nodes=128, n_edges=224, max_degree=6,
                   tile=32, max_graph_bonds=max_bonds)
    all_batches = [pack_batch(graphs[4 * i : 4 * i + 4], spec)
                   for i in range(n_batches)]
    r = corpus_shard_range(n_batches)
    local_batches = all_batches[r.start : r.stop]

    mesh = global_mesh("data")
    stack, s, dropped = shard_batch_cache_global(local_batches, mesh,
                                                 "data")
    assert s == n_batches // nproc and dropped == 0, (s, dropped)

    model = MolCLRNet(gnn_type="gin", num_layers=2, emb_dim=32,
                      feat_dim=64, bn_axis_name="data", tile=32)
    init_model = MolCLRNet(gnn_type="gin", num_layers=2, emb_dim=32,
                           feat_dim=64, tile=32)
    variables = init_model.init(jax.random.PRNGKey(0), local_batches[0],
                                train=False)
    tx = adam_torch(1e-3, 1e-5)
    host = jax.tree_util.tree_map(np.asarray, variables)
    state = TrainState(params=host["params"],
                       batch_stats=host.get("batch_stats", {}),
                       opt_state=tx.init(host["params"]), step=0)

    multi = build_dp_multi_step_resident(model, tx, mesh, aug="node",
                                         temperature=0.1, axis="data",
                                         tile=32)
    idxs = assemble_rows(np.arange(s, dtype=np.int32)[None, :], mesh,
                         "data")
    new_state, loss_arr = multi(state, stack, idxs, jax.random.PRNGKey(1))
    losses = np.asarray(jax.device_get(loss_arr)).tolist()
    step = int(np.asarray(jax.device_get(new_state.step)))

    with open(f"{outdir}/worker{pid}.json", "w") as f:
        json.dump({"pid": pid, "process_count": jax.process_count(),
                   "device_count": jax.device_count(),
                   "s_local": s, "losses": losses, "final_step": step}, f)


if __name__ == "__main__":
    main()
