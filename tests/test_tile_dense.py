"""Tile-dense aggregation path: packer alignment invariants and exact
parity (forward + gradients) against the ELL gather path, for both GIN and
GCN, through augmentation and the full pretrain loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molclr_tpu.data import featurize_smiles, pack_batch
from molclr_tpu.data.augment import paired_augment
from molclr_tpu.data.graphs import PadSpec
from molclr_tpu.data.loader import spec_for_graphs
from molclr_tpu.data.synthetic import synthetic_corpus
from molclr_tpu.losses import nt_xent_loss
from molclr_tpu.models import MolCLRNet
from molclr_tpu.ops.scatter_free import gine_aggregate
from molclr_tpu.ops.tile_dense import (
    build_tile_adjacency,
    gine_tile_aggregate,
    tile_matmul,
)

TILE = 32


def graphs(n=24, seed=3):
    out = [featurize_smiles(s) for s in synthetic_corpus(n, seed=seed)]
    return [g for g in out if g is not None and g.max_degree <= 6]


def tiled_batch(n=24):
    gs = graphs(n)
    spec = spec_for_graphs(gs, len(gs), tile=TILE)
    return pack_batch(gs, spec), spec


class TestTilePacking:
    def test_spec_is_tile_multiple(self):
        _, spec = tiled_batch()
        assert spec.tile == TILE
        assert spec.n_nodes % TILE == 0

    def test_no_molecule_crosses_tile_boundary(self):
        batch, _ = tiled_batch()
        node_graph = np.asarray(batch.node_graph)
        node_mask = np.asarray(batch.node_mask)
        for g in np.unique(node_graph[node_mask]):
            rows = np.flatnonzero(node_mask & (node_graph == g))
            assert rows.min() // TILE == rows.max() // TILE, f"graph {g}"

    def test_all_neighbors_in_tile(self):
        batch, _ = tiled_batch()
        nbr = np.asarray(batch.nbr)
        mask = np.asarray(batch.nbr_mask)
        rows = np.arange(nbr.shape[0])[:, None] // TILE
        assert (nbr[mask] // TILE == np.broadcast_to(
            rows, nbr.shape)[mask]).all()

    def test_padspec_rejects_misaligned(self):
        with pytest.raises(ValueError):
            PadSpec(4, 100, 64, 6, tile=32)

    def test_oversized_molecule_overflows(self):
        from molclr_tpu.data.graphs import PackOverflow

        g = featurize_smiles("C" * 40)  # 40-atom chain > tile 32
        with pytest.raises(PackOverflow):
            pack_batch([g], PadSpec(1, 64, 160, 6, tile=32))


class TestAdjacency:
    def test_matches_gather_aggregate(self):
        batch, _ = tiled_batch()
        rng = np.random.RandomState(0)
        n = batch.num_nodes
        h = jnp.array(rng.randn(n, 16), jnp.float32)
        t_type = jnp.array(rng.randn(5, 16), jnp.float32)
        t_dir = jnp.array(rng.randn(3, 16), jnp.float32)
        adj = build_tile_adjacency(batch.nbr, batch.nbr_mask, TILE,
                                   dtype=jnp.float32)
        got = gine_tile_aggregate(h, t_type, t_dir, adj,
                                  batch.nbr_bond_type, batch.nbr_bond_dir,
                                  batch.nbr_mask)
        want = gine_aggregate(h, t_type, t_dir, batch.nbr,
                              batch.nbr_bond_type, batch.nbr_bond_dir,
                              batch.nbr_mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_adjacency_symmetric(self):
        batch, _ = tiled_batch()
        adj = np.asarray(build_tile_adjacency(batch.nbr, batch.nbr_mask,
                                              TILE, dtype=jnp.float32))
        np.testing.assert_allclose(adj, adj.transpose(0, 2, 1))

    def test_tile_matmul_grad_is_adjoint(self):
        batch, _ = tiled_batch()
        rng = np.random.RandomState(1)
        n = batch.num_nodes
        h = jnp.array(rng.randn(n, 8), jnp.float32)
        cot = jnp.array(rng.randn(n, 8), jnp.float32)
        adj = build_tile_adjacency(batch.nbr, batch.nbr_mask, TILE,
                                   dtype=jnp.float32)
        g = jax.grad(lambda x: (tile_matmul(adj, x) * cot).sum())(h)
        np.testing.assert_allclose(np.asarray(g),
                                   np.asarray(tile_matmul(adj, cot)),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("gnn", ["gin", "gcn"])
@pytest.mark.parametrize("normalize", [False, True])
def test_model_parity_tile_vs_gather(gnn, normalize):
    if gnn == "gin" and normalize:
        pytest.skip("normalize only affects gcn")
    batch, _ = tiled_batch()
    kw = dict(num_layers=3, emb_dim=24, feat_dim=32, gnn_type=gnn,
              normalize_gcn=normalize)
    m_gather = MolCLRNet(**kw, tile=0)
    m_tile = MolCLRNet(**kw, tile=TILE)
    variables = m_gather.init(jax.random.PRNGKey(0), batch, train=False)

    def loss(model, params):
        hg, z = model.apply({"params": params,
                             "batch_stats": variables["batch_stats"]},
                            batch, train=False)
        return (z ** 2).sum() + hg.sum(), (hg, z)

    (l0, (h0, z0)), g0 = jax.value_and_grad(
        lambda p: loss(m_gather, p), has_aux=True)(variables["params"])
    (l1, (h1, z1)), g1 = jax.value_and_grad(
        lambda p: loss(m_tile, p), has_aux=True)(variables["params"])
    np.testing.assert_allclose(np.asarray(z0), np.asarray(z1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4), g0, g1)


def test_pretrain_step_parity_through_augmentation():
    """Full contrastive loss + grads agree between paths on augmented views
    (adjacency rebuilt from the augmented masks)."""
    batch, _ = tiled_batch()
    kw = dict(num_layers=2, emb_dim=16, feat_dim=16, gnn_type="gin")
    m0 = MolCLRNet(**kw, tile=0)
    m1 = MolCLRNet(**kw, tile=TILE)
    variables = m0.init(jax.random.PRNGKey(0), batch, train=False)
    vi, vj = paired_augment(batch, jax.random.PRNGKey(7), "node")

    def loss(model, params):
        stats = variables["batch_stats"]
        (_, zi), upd = model.apply({"params": params, "batch_stats": stats},
                                   vi, train=True,
                                   rngs={"dropout": jax.random.PRNGKey(1)},
                                   mutable=["batch_stats"])
        (_, zj), _ = model.apply(
            {"params": params, "batch_stats": upd["batch_stats"]}, vj,
            train=True, rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        return nt_xent_loss(zi, zj, 0.1, pair_mask=batch.graph_mask)

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(variables["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(variables["params"])
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3), g0, g1)


class TestTileBFS:
    """Tile-matmul BFS must produce identical wave times / augmented views
    to the gather-based BFS on tile-aligned batches."""

    def test_bfs_times_identical(self):
        from molclr_tpu.data.augment import _bfs_times

        batch, _ = tiled_batch()
        rng = jax.random.PRNGKey(9)
        # one random start atom per graph
        from molclr_tpu.data.augment import _rand_keys, _segment_ranks

        ranks = _segment_ranks(_rand_keys(rng, batch.num_nodes),
                               batch.node_graph, batch.node_mask,
                               batch.graph_n_nodes)
        start = batch.node_mask & (ranks == 0)
        t_gather = np.asarray(_bfs_times(batch, start, 32, tile=0))
        t_tile = np.asarray(_bfs_times(batch, start, 32, tile=TILE))
        mask = np.asarray(batch.node_mask)
        np.testing.assert_array_equal(t_gather[mask], t_tile[mask])

    @pytest.mark.parametrize("kind", ["subgraph", "mix"])
    def test_augmented_views_identical(self, kind):
        from molclr_tpu.data.augment import paired_augment

        batch, _ = tiled_batch()
        rng = jax.random.PRNGKey(4)
        vi0, vj0 = paired_augment(batch, rng, kind, tile=0)
        vi1, vj1 = paired_augment(batch, rng, kind, tile=TILE)
        for a, b in ((vi0, vi1), (vj0, vj1)):
            np.testing.assert_array_equal(np.asarray(a.atom_type),
                                          np.asarray(b.atom_type))
            np.testing.assert_array_equal(np.asarray(a.nbr_mask),
                                          np.asarray(b.nbr_mask))
            np.testing.assert_array_equal(np.asarray(a.edge_mask),
                                          np.asarray(b.edge_mask))


@pytest.mark.parametrize("kind", ["node", "subgraph", "mix"])
def test_tile_ranks_give_identical_augmentations(kind):
    """Compare-count node ranking (tile fast path) must reproduce the
    lexsort path bit-for-bit across all augmentation kinds."""
    from molclr_tpu.data.augment import paired_augment

    batch, _ = tiled_batch()
    rng = jax.random.PRNGKey(11)
    a0 = paired_augment(batch, rng, kind, tile=0)
    a1 = paired_augment(batch, rng, kind, tile=TILE)
    for v0, v1 in zip(a0, a1):
        np.testing.assert_array_equal(np.asarray(v0.atom_type),
                                      np.asarray(v1.atom_type))
        np.testing.assert_array_equal(np.asarray(v0.nbr_mask),
                                      np.asarray(v1.nbr_mask))
        np.testing.assert_array_equal(np.asarray(v0.edge_mask),
                                      np.asarray(v1.edge_mask))
