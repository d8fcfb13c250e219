"""Regression tests for code-review findings: BFS key overflow on
disconnected molecules, concat_views sentinel aliasing, and the Pretrainer
data-parallel path."""

import jax
import numpy as np

from molclr_tpu.data import (
    MASK_ATOM_TYPE,
    PadSpec,
    featurize_smiles,
    pack_batch,
)
from molclr_tpu.data.augment import _apply_bond_drop, subgraph_augment
from molclr_tpu.data.graphs import concat_views
from molclr_tpu.data.synthetic import synthetic_corpus
from molclr_tpu.train.config import ModelConfig, PretrainConfig
from molclr_tpu.train.pretrain import Pretrainer


def test_subgraph_removal_on_disconnected_salt():
    """Sort-key overflow made unreached nodes rank first, silently
    disabling removal for multi-fragment molecules (salts)."""
    batch = pack_batch([featurize_smiles("c1ccccc1.[Na+]")],
                       PadSpec(1, 8, 16, max_degree=6))
    removed_any = 0
    for seed in range(20):
        aug = subgraph_augment(batch, jax.random.PRNGKey(seed))
        removed_any += int(
            ((np.asarray(aug.atom_type) == MASK_ATOM_TYPE)
             & np.asarray(batch.node_mask)).sum())
    # floor(0.25*7) = 1 atom per draw (when the start fragment has >= 1
    # reachable node, which is always true)
    assert removed_any == 20


def test_concat_views_sentinel_isolation():
    """View a's sentinel bond ids must NOT alias view b's bond 0: dropping
    b's bond 0 on the concatenated batch must never kill a's self-loops."""
    import jax.numpy as jnp

    batch = pack_batch([featurize_smiles("CCO")],
                       PadSpec(1, 8, 16, max_degree=6))
    both = concat_views(batch, batch)
    drop = jnp.zeros(both.num_bonds, bool).at[batch.num_bonds].set(True)
    # ^ drops the concatenated view-b bond 0
    _, nbr_mask = _apply_bond_drop(both, drop)
    n = batch.num_nodes
    # view a self-loops untouched
    assert np.asarray(nbr_mask)[:n][np.asarray(batch.node_mask), 0].all()
    # view a real bonds untouched
    assert (np.asarray(nbr_mask)[:n] == np.asarray(batch.nbr_mask)).all()


def test_pretrainer_data_axis_runs():
    """cfg.data_axis must route through the shard_map DP step, not crash
    with unbound axis names."""
    cfg = PretrainConfig(batch_size=8, epochs=1, warm_up=1,
                         model=ModelConfig(gnn_type="gin", num_layers=2,
                                           emb_dim=32, feat_dim=64),
                         aug="node", valid_size=0.2, data_axis="data",
                         ckpt_dir="/tmp/dp_test_run", seed=0,
                         featurize_processes=0, save_every_epochs=100,
                         eval_every_epochs=1, steps_per_dispatch=16)
    pre = Pretrainer(cfg).setup_data(synthetic_corpus(200, seed=4))
    first = next(iter(pre.train_iter))[0]
    pre.setup_state(first)
    history = pre.train(log=lambda *_: None)
    assert np.isfinite(history[0]["train_loss"])
    assert history[0]["steps"] >= 1
