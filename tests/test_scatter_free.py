"""Gradient-correctness tests for the scatter-free custom VJPs against plain
autodiff through independent reference implementations."""

import jax
import jax.numpy as jnp
import numpy as np

from molclr_tpu.data import PadSpec, featurize_smiles, pack_batch
from molclr_tpu.ops.scatter_free import (
    embed_lookup,
    gcn_aggregate,
    gine_aggregate,
)

SMILES = ["CC(=O)Oc1ccccc1C(=O)O", "CCO", "C", "CN1CCC[C@H]1c1cccnc1"]
SPEC = PadSpec(n_graphs=5, n_nodes=64, n_edges=160, max_degree=6)


def batch():
    return pack_batch([featurize_smiles(s) for s in SMILES], SPEC)


def tree_close(a, b, rtol=1e-4, atol=1e-4):
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x),
                                                np.asarray(y),
                                                rtol=rtol, atol=atol), a, b)


class TestEmbedLookup:
    def test_grad_matches_take(self):
        rng = np.random.RandomState(0)
        table = jnp.array(rng.randn(7, 16), jnp.float32)
        idx = jnp.array(rng.randint(0, 7, (30,)), jnp.int32)
        cot = jnp.array(rng.randn(30, 16), jnp.float32)

        def via_custom(t):
            return (embed_lookup(t, idx) * cot).sum()

        def via_take(t):
            return (jnp.take(t, idx, axis=0) * cot).sum()

        tree_close(jax.grad(via_custom)(table), jax.grad(via_take)(table))

    def test_2d_indices(self):
        rng = np.random.RandomState(1)
        table = jnp.array(rng.randn(5, 8), jnp.float32)
        idx = jnp.array(rng.randint(0, 5, (6, 3)), jnp.int32)
        cot = jnp.array(rng.randn(6, 3, 8), jnp.float32)
        g1 = jax.grad(lambda t: (embed_lookup(t, idx) * cot).sum())(table)
        g2 = jax.grad(lambda t: (jnp.take(t, idx, axis=0) * cot).sum())(table)
        tree_close(g1, g2)


class TestGineAggregate:
    def test_grads_match_autodiff(self):
        b = batch()
        rng = np.random.RandomState(2)
        h = jnp.array(rng.randn(b.num_nodes, 12)
                      * np.asarray(b.node_mask)[:, None], jnp.float32)
        t1 = jnp.array(rng.randn(5, 12), jnp.float32)
        t2 = jnp.array(rng.randn(3, 12), jnp.float32)
        cot = jnp.array(rng.randn(b.num_nodes, 12), jnp.float32)

        def ref(h, t1, t2):
            e = (jnp.take(t1, b.nbr_bond_type, axis=0)
                 + jnp.take(t2, b.nbr_bond_dir, axis=0))
            msg = jnp.take(h, b.nbr, axis=0) + e
            out = jnp.where(b.nbr_mask[..., None], msg, 0).sum(axis=1)
            return (out * cot).sum()

        def custom(h, t1, t2):
            out = gine_aggregate(h, t1, t2, b.nbr, b.nbr_bond_type,
                                 b.nbr_bond_dir, b.nbr_mask)
            return (out * cot).sum()

        # forward identical
        np.testing.assert_allclose(float(ref(h, t1, t2)),
                                   float(custom(h, t1, t2)), rtol=1e-5)
        g_ref = jax.grad(ref, argnums=(0, 1, 2))(h, t1, t2)
        g_cus = jax.grad(custom, argnums=(0, 1, 2))(h, t1, t2)
        tree_close(g_cus, g_ref)

    def test_grads_after_bond_deletion(self):
        """Symmetry must hold for augmented masks too (paired deletion)."""
        from molclr_tpu.data.augment import node_augment

        b0 = batch()
        b = node_augment(b0, jax.random.PRNGKey(0))
        rng = np.random.RandomState(3)
        h = jnp.array(rng.randn(b.num_nodes, 8), jnp.float32)
        t1 = jnp.array(rng.randn(5, 8), jnp.float32)
        t2 = jnp.array(rng.randn(3, 8), jnp.float32)
        cot = jnp.array(rng.randn(b.num_nodes, 8), jnp.float32)

        def ref(h):
            msg = jnp.take(h, b.nbr, axis=0) + (
                jnp.take(t1, b.nbr_bond_type, axis=0)
                + jnp.take(t2, b.nbr_bond_dir, axis=0))
            return (jnp.where(b.nbr_mask[..., None], msg, 0).sum(1)
                    * cot).sum()

        def custom(h):
            return (gine_aggregate(h, t1, t2, b.nbr, b.nbr_bond_type,
                                   b.nbr_bond_dir, b.nbr_mask) * cot).sum()

        tree_close(jax.grad(custom)(h), jax.grad(ref)(h))


class TestGcnAggregate:
    def test_grads_match_autodiff(self):
        b = batch()
        rng = np.random.RandomState(4)
        x = jnp.array(rng.randn(b.num_nodes, 10), jnp.float32)
        t1 = jnp.array(rng.randn(5, 1), jnp.float32)
        t2 = jnp.array(rng.randn(3, 1), jnp.float32)
        cot = jnp.array(rng.randn(b.num_nodes, 10), jnp.float32)
        deg = b.nbr_mask.sum(axis=1).astype(jnp.float32)
        dis = jax.lax.rsqrt(jnp.maximum(deg, 1.0))
        norm = jnp.take(dis, b.nbr, axis=0) * dis[:, None]

        for nrm in [None, norm]:
            def ref(x, t1, t2, nrm=nrm):
                e = (jnp.take(t1[:, 0], b.nbr_bond_type)
                     + jnp.take(t2[:, 0], b.nbr_bond_dir))[..., None]
                msg = jnp.take(x, b.nbr, axis=0) + e
                if nrm is not None:
                    msg = msg * nrm[..., None]
                return (jnp.where(b.nbr_mask[..., None], msg, 0).sum(1)
                        * cot).sum()

            def custom(x, t1, t2, nrm=nrm):
                return (gcn_aggregate(x, t1, t2, b.nbr, b.nbr_bond_type,
                                      b.nbr_bond_dir, b.nbr_mask, nrm)
                        * cot).sum()

            np.testing.assert_allclose(float(ref(x, t1, t2)),
                                       float(custom(x, t1, t2)), rtol=1e-5)
            tree_close(jax.grad(custom, argnums=(0, 1, 2))(x, t1, t2),
                       jax.grad(ref, argnums=(0, 1, 2))(x, t1, t2))
