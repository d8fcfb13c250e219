"""Parity tests for the fused Pallas GINE layer (ops/fused_layer.py).

The kernel runs in interpreter mode on CPU (GINEConv selects it
automatically off-TPU), so these tests execute the same model code the TPU
compiles. Semantics are pinned against the unfused tile-dense path, which
is itself oracle-pinned (tests/test_models.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molclr_tpu.data import featurize_smiles, pack_batch
from molclr_tpu.data.loader import spec_for_graphs
from molclr_tpu.data.synthetic import synthetic_corpus
from molclr_tpu.models import MolCLRNet
from molclr_tpu.ops.fused_layer import (
    CNT_PAD,
    fused_gine_layer,
    pack_cnt,
    pack_etab,
)


def _random_problem(rng, t=3, s=8, d=12):
    n, d2 = t * s, 2 * d
    h = jnp.asarray(rng.randn(n, d).astype(np.float32))
    blocks = []
    for _ in range(t):
        a = (rng.rand(s, s) < 0.3).astype(np.float32)
        a = np.maximum(a, a.T)
        np.fill_diagonal(a, 1.0)
        blocks.append(a)
    adj = jnp.asarray(np.stack(blocks))
    cnt_t = jnp.asarray(rng.randint(0, 3, (n, 5)).astype(np.float32))
    cnt_d = jnp.asarray(rng.randint(0, 2, (n, 3)).astype(np.float32))
    e1 = jnp.asarray(rng.randn(5, d).astype(np.float32))
    e2 = jnp.asarray(rng.randn(3, d).astype(np.float32))
    w1 = jnp.asarray(rng.randn(d, d2).astype(np.float32)) * 0.1
    b1 = jnp.asarray(rng.randn(d2).astype(np.float32)) * 0.1
    w2 = jnp.asarray(rng.randn(d2, d).astype(np.float32)) * 0.1
    b2 = jnp.asarray(rng.randn(d).astype(np.float32)) * 0.1
    return h, adj, cnt_t, cnt_d, e1, e2, w1, b1, w2, b2


def _unfused(h, adj, cnt_t, cnt_d, e1, e2, w1, b1, w2, b2):
    t, s, _ = adj.shape
    n, d = h.shape
    agg = jnp.einsum("tij,tjd->tid",
                     adj, h.reshape(t, s, d)).reshape(n, d)
    agg = agg + cnt_t @ e1 + cnt_d @ e2
    return jnp.maximum(agg @ w1 + b1, 0) @ w2 + b2


class TestKernelParity:
    def test_forward(self):
        rng = np.random.RandomState(0)
        h, adj, cnt_t, cnt_d, e1, e2, w1, b1, w2, b2 = _random_problem(rng)
        ref = _unfused(h, adj, cnt_t, cnt_d, e1, e2, w1, b1, w2, b2)
        out = fused_gine_layer(
            h, adj, pack_cnt(cnt_t, cnt_d), pack_etab(e1, e2, h.dtype),
            w1, b1, w2, b2, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_all_inputs(self):
        rng = np.random.RandomState(1)
        h, adj, cnt_t, cnt_d, e1, e2, w1, b1, w2, b2 = _random_problem(rng)

        def loss_u(h, e1, e2, w1, b1, w2, b2):
            return (_unfused(h, adj, cnt_t, cnt_d,
                             e1, e2, w1, b1, w2, b2) ** 2).sum()

        def loss_f(h, e1, e2, w1, b1, w2, b2):
            return (fused_gine_layer(
                h, adj, pack_cnt(cnt_t, cnt_d), pack_etab(e1, e2, h.dtype),
                w1, b1, w2, b2, True) ** 2).sum()

        args = (h, e1, e2, w1, b1, w2, b2)
        gu = jax.grad(loss_u, argnums=tuple(range(7)))(*args)
        gf = jax.grad(loss_f, argnums=tuple(range(7)))(*args)
        for name, a, b in zip("h e1 e2 w1 b1 w2 b2".split(), gu, gf):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4,
                err_msg=f"grad mismatch for {name}")

    def test_padded_rows_inert(self):
        """Zero adjacency rows + zero counts (padding) must produce the
        same constant output as the unfused path and zero dh."""
        rng = np.random.RandomState(2)
        h, adj, cnt_t, cnt_d, e1, e2, w1, b1, w2, b2 = _random_problem(rng)
        adj = np.array(adj)                 # writable copy (asarray of a
        adj[1] = 0.0                        # jax array is read-only)
        #                                     tile 1 entirely padding
        adj = jnp.asarray(adj)
        cnt_t = cnt_t.at[8:16].set(0.0)
        cnt_d = cnt_d.at[8:16].set(0.0)
        ref = _unfused(h, adj, cnt_t, cnt_d, e1, e2, w1, b1, w2, b2)
        out = fused_gine_layer(
            h, adj, pack_cnt(cnt_t, cnt_d), pack_etab(e1, e2, h.dtype),
            w1, b1, w2, b2, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        dh = jax.grad(lambda h: (fused_gine_layer(
            h, adj, pack_cnt(cnt_t, cnt_d), pack_etab(e1, e2, h.dtype),
            w1, b1, w2, b2, True) ** 2).sum())(h)
        assert float(jnp.abs(dh[8:16]).max()) == 0.0

    def test_cnt_pad_shapes(self):
        rng = np.random.RandomState(3)
        h, adj, cnt_t, cnt_d, e1, e2, *_ = _random_problem(rng)
        cnt = pack_cnt(cnt_t, cnt_d)
        assert cnt.shape == (h.shape[0], CNT_PAD)
        etab = pack_etab(e1, e2, jnp.float32)
        assert etab.shape == (CNT_PAD, h.shape[1])
        np.testing.assert_array_equal(np.asarray(etab[8:]), 0.0)


class TestGCNKernel:
    """ops/fused_gcn.py: A @ (x @ W) pinned against the two-GEMM form."""

    def _problem(self, rng, t=3, s=8, d=12):
        n = t * s
        x = jnp.asarray(rng.randn(n, d).astype(np.float32))
        blocks = []
        for _ in range(t):
            a = (rng.rand(s, s) < 0.3).astype(np.float32)
            a = np.maximum(a, a.T)
            np.fill_diagonal(a, 1.0)
            blocks.append(a)
        adj = jnp.asarray(np.stack(blocks))
        w = jnp.asarray(rng.randn(d, d).astype(np.float32)) * 0.2
        return x, adj, w

    def test_forward_and_grads(self):
        from molclr_tpu.ops.fused_gcn import fused_gcn_layer

        rng = np.random.RandomState(5)
        x, adj, w = self._problem(rng)
        t, s, _ = adj.shape
        n, d = x.shape

        def ref(x, w):
            xw = (x @ w).reshape(t, s, d)
            return jnp.einsum("tij,tjd->tid", adj, xw).reshape(n, d)

        out = fused_gcn_layer(x, adj, w, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref(x, w)),
                                   rtol=1e-5, atol=1e-5)
        gu = jax.grad(lambda x, w: (ref(x, w) ** 2).sum(), (0, 1))(x, w)
        gf = jax.grad(lambda x, w: (fused_gcn_layer(x, adj, w, True)
                                    ** 2).sum(), (0, 1))(x, w)
        for name, a, b in zip(("x", "w"), gu, gf):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-4,
                                       err_msg=f"grad mismatch for {name}")

    @pytest.mark.parametrize("normalize", [False, True])
    def test_gcn_model_parity(self, packed_batch, normalize):
        kw = dict(num_layers=3, emb_dim=32, feat_dim=64, gnn_type="gcn",
                  tile=64, normalize_gcn=normalize)
        m0 = MolCLRNet(**kw)
        m1 = MolCLRNet(**kw, fused=True)
        v = m0.init(jax.random.PRNGKey(0), packed_batch, train=False)
        v1 = m1.init(jax.random.PRNGKey(0), packed_batch, train=False)
        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(v1))
        _, z0 = m0.apply(v, packed_batch, train=False)
        _, z1 = m1.apply(v, packed_batch, train=False)
        np.testing.assert_allclose(np.asarray(z1), np.asarray(z0),
                                   rtol=1e-5, atol=1e-5)

        def loss(m, params):
            (_, z), _ = m.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                packed_batch, train=True, mutable=["batch_stats"])
            return (z.astype(jnp.float32) ** 2).mean()

        g0 = jax.tree_util.tree_leaves(jax.grad(
            lambda p: loss(m0, p))(v["params"]))
        g1 = jax.tree_util.tree_leaves(jax.grad(
            lambda p: loss(m1, p))(v["params"]))
        for a, b in zip(g0, g1):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("normalize", [False, True])
    def test_gcn_bn_chain_batch_stats_and_eval(self, packed_batch,
                                               normalize):
        """GCN BN-chained fused path (drop 0): running-stat updates from
        the kernel's moment sums must match the unfused path's, and eval
        mode must agree on outputs."""
        kw = dict(num_layers=3, emb_dim=32, feat_dim=64, gnn_type="gcn",
                  tile=64, normalize_gcn=normalize)
        m0 = MolCLRNet(**kw)
        m1 = MolCLRNet(**kw, fused=True)
        v = m0.init(jax.random.PRNGKey(0), packed_batch, train=False)
        (_, z0), u0 = m0.apply(v, packed_batch, train=True,
                               mutable=["batch_stats"])
        (_, z1), u1 = m1.apply(v, packed_batch, train=True,
                               mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(z1), np.asarray(z0),
                                   rtol=1e-4, atol=1e-5)
        jax.tree_util.tree_map(
            lambda s0, s1: np.testing.assert_allclose(
                np.asarray(s1), np.asarray(s0), rtol=1e-5, atol=1e-6),
            u0["batch_stats"], u1["batch_stats"])
        v_run = {"params": v["params"], "batch_stats": u0["batch_stats"]}
        _, e0 = m0.apply(v_run, packed_batch, train=False)
        _, e1 = m1.apply(v_run, packed_batch, train=False)
        np.testing.assert_allclose(np.asarray(e1), np.asarray(e0),
                                   rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def packed_batch():
    smiles = synthetic_corpus(32, seed=7)
    graphs = [g for g in (featurize_smiles(s) for s in smiles)
              if g is not None and g.max_degree <= 6][:32]
    spec = spec_for_graphs(graphs, len(graphs), slack=1.1, tile=64,
                           sizing="max")
    return pack_batch(graphs, spec)


class TestModelParity:
    def test_param_tree_identical_and_forward(self, packed_batch):
        kw = dict(num_layers=3, emb_dim=32, feat_dim=64, gnn_type="gin",
                  tile=64)
        m0 = MolCLRNet(**kw)
        m1 = MolCLRNet(**kw, fused=True)
        v = m0.init(jax.random.PRNGKey(0), packed_batch, train=False)
        v1 = m1.init(jax.random.PRNGKey(0), packed_batch, train=False)
        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(v1))
        h0, z0 = m0.apply(v, packed_batch, train=False)
        h1, z1 = m1.apply(v, packed_batch, train=False)
        np.testing.assert_allclose(np.asarray(z1), np.asarray(z0),
                                   rtol=1e-5, atol=1e-5)

    def test_train_mode_gradients(self, packed_batch):
        kw = dict(num_layers=3, emb_dim=32, feat_dim=64, gnn_type="gin",
                  tile=64)
        m0 = MolCLRNet(**kw)
        m1 = MolCLRNet(**kw, fused=True)
        v = m0.init(jax.random.PRNGKey(0), packed_batch, train=False)

        def loss(m, params):
            (_, z), _ = m.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                packed_batch, train=True, mutable=["batch_stats"])
            return (z.astype(jnp.float32) ** 2).mean()

        g0 = jax.grad(lambda p: loss(m0, p))(v["params"])
        g1 = jax.grad(lambda p: loss(m1, p))(v["params"])
        flat0 = jax.tree_util.tree_leaves(g0)
        flat1 = jax.tree_util.tree_leaves(g1)
        for a, b in zip(flat0, flat1):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)

    def test_bn_chain_batch_stats_and_eval(self, packed_batch):
        """BN-chained fused path: running-stat updates from the kernel's
        moment sums must match the unfused path's, and eval mode (running
        stats -> prologue coefficients) must agree on outputs."""
        kw = dict(num_layers=3, emb_dim=32, feat_dim=64, gnn_type="gin",
                  tile=64)
        m0 = MolCLRNet(**kw)
        m1 = MolCLRNet(**kw, fused=True)
        v = m0.init(jax.random.PRNGKey(0), packed_batch, train=False)
        (_, z0), u0 = m0.apply(v, packed_batch, train=True,
                               mutable=["batch_stats"])
        (_, z1), u1 = m1.apply(v, packed_batch, train=True,
                               mutable=["batch_stats"])
        jax.tree_util.tree_map(
            lambda s0, s1: np.testing.assert_allclose(
                np.asarray(s1), np.asarray(s0), rtol=1e-5, atol=1e-6),
            u0["batch_stats"], u1["batch_stats"])
        v_run = {"params": v["params"], "batch_stats": u0["batch_stats"]}
        _, e0 = m0.apply(v_run, packed_batch, train=False)
        _, e1 = m1.apply(v_run, packed_batch, train=False)
        np.testing.assert_allclose(np.asarray(e1), np.asarray(e0),
                                   rtol=1e-5, atol=1e-5)

    def test_fused_requires_gin_tile(self, packed_batch):
        m = MolCLRNet(num_layers=2, emb_dim=32, feat_dim=64,
                      gnn_type="gin", tile=0, fused=True)
        with pytest.raises(AssertionError):
            m.init(jax.random.PRNGKey(0), packed_batch, train=False)
