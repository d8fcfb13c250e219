"""concat_views: a doubled batch must reproduce the two separate forwards
exactly in eval mode (running BN stats), and pretraining with
concat_views=True must train."""

import jax
import numpy as np

from molclr_tpu.data import PadSpec, featurize_smiles, pack_batch
from molclr_tpu.data.augment import paired_augment
from molclr_tpu.data.graphs import concat_views
from molclr_tpu.data.synthetic import synthetic_corpus
from molclr_tpu.models import MolCLRNet
from molclr_tpu.train.config import ModelConfig, PretrainConfig
from molclr_tpu.train.pretrain import Pretrainer

SMILES = ["CC(=O)Oc1ccccc1C(=O)O", "CCO", "CN1CCC[C@H]1c1cccnc1", "C"]
SPEC = PadSpec(n_graphs=4, n_nodes=64, n_edges=160, max_degree=6)


def test_eval_equivalence():
    batch = pack_batch([featurize_smiles(s) for s in SMILES], SPEC)
    vi, vj = paired_augment(batch, jax.random.PRNGKey(0), "node")
    model = MolCLRNet(gnn_type="gin", num_layers=3, emb_dim=48, feat_dim=96)
    v = model.init(jax.random.PRNGKey(1), batch, train=False)
    hi, zi = model.apply(v, vi, train=False)
    hj, zj = model.apply(v, vj, train=False)
    hb, zb = model.apply(v, concat_views(vi, vj), train=False)
    g = batch.num_graphs
    np.testing.assert_allclose(np.asarray(zb[:g]), np.asarray(zi),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(zb[g:]), np.asarray(zj),
                               rtol=2e-4, atol=2e-4)


def test_pretrain_concat_views_learns(tmp_path):
    cfg = PretrainConfig(batch_size=16, epochs=3, warm_up=1,
                         model=ModelConfig(gnn_type="gin", num_layers=2,
                                           emb_dim=48, feat_dim=96),
                         aug="node", valid_size=0.1, concat_views=True,
                         ckpt_dir=str(tmp_path / "pre"), seed=0,
                         featurize_processes=0, save_every_epochs=100,
                         eval_every_epochs=100, steps_per_dispatch=4)
    pre = Pretrainer(cfg).setup_data(synthetic_corpus(200, seed=3))
    first = next(iter(pre.train_iter))[0]
    pre.setup_state(first)
    history = pre.train(log=lambda *_: None)
    assert history[-1]["train_loss"] < history[0]["train_loss"]
