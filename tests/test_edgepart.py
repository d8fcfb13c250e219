"""Edge-partitioned aggregation: sharded result and gradients must match
the single-device scatter-free op on an 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molclr_tpu.data import PadSpec, featurize_smiles, pack_batch
from molclr_tpu.ops.scatter_free import gine_aggregate
from molclr_tpu.parallel.dp import make_mesh
from molclr_tpu.parallel.edgepart import (
    build_sharded_layer,
    gine_aggregate_sharded,
    shard_ell_rows,
)

SMILES = ["CC(=O)Oc1ccccc1C(=O)O", "Cn1cnc2c1c(=O)n(C)c(=O)n2C",
          "CCO", "CN1CCC[C@H]1c1cccnc1", "O=S(=O)(N)c1ccccc1",
          "CCCCCCCC", "c1ccc2ccccc2c1", "C"]
# 128 nodes -> 16 per shard on 8 devices
SPEC = PadSpec(n_graphs=8, n_nodes=128, n_edges=288, max_degree=6)
N_SHARDS = 8


@pytest.fixture(scope="module")
def setup():
    batch = pack_batch([featurize_smiles(s) for s in SMILES], SPEC)
    shards = shard_ell_rows(batch, N_SHARDS)
    rng = np.random.RandomState(0)
    d = 24
    h = jnp.array(rng.randn(batch.num_nodes, d)
                  * np.asarray(batch.node_mask)[:, None], jnp.float32)
    t1 = jnp.array(rng.randn(5, d), jnp.float32)
    t2 = jnp.array(rng.randn(3, d), jnp.float32)
    return batch, shards, h, t1, t2


class TestForward:
    def test_matches_single_device(self, setup):
        batch, shards, h, t1, t2 = setup
        mesh = make_mesh(N_SHARDS, axis="shard")
        layer = build_sharded_layer(mesh, axis="shard")
        h_sh = np.asarray(h).reshape(N_SHARDS, -1, h.shape[-1])
        out_sh = np.asarray(layer(
            h_sh, t1, t2, shards["nbr"], shards["nbr_bond_type"],
            shards["nbr_bond_dir"], shards["nbr_mask"]))
        ref = np.asarray(gine_aggregate(
            h, t1, t2, batch.nbr, batch.nbr_bond_type, batch.nbr_bond_dir,
            batch.nbr_mask))
        np.testing.assert_allclose(out_sh.reshape(ref.shape), ref,
                                   rtol=1e-5, atol=1e-5)


class TestBackward:
    def test_grads_match_single_device(self, setup):
        batch, shards, h, t1, t2 = setup
        mesh = make_mesh(N_SHARDS, axis="shard")
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        cot = jnp.array(np.random.RandomState(1).randn(
            batch.num_nodes, h.shape[-1]), jnp.float32)
        cot_sh = np.asarray(cot).reshape(N_SHARDS, -1, h.shape[-1])

        def local(h_s, t1_, t2_, nbr, bt, bd, mask, cot_s):
            sq = lambda x: x.reshape((-1,) + x.shape[2:])
            out = gine_aggregate_sharded(
                sq(h_s), t1_, t2_, sq(nbr), sq(bt), sq(bd), sq(mask),
                "shard")
            # per-shard partial of the global scalar loss <out, cot>
            return (out * sq(cot_s)).sum()

        a = P("shard")
        loss_fn = shard_map(
            lambda *args: jax.lax.psum(local(*args), "shard"),
            mesh=mesh,
            in_specs=(a, P(), P(), a, a, a, a, a),
            out_specs=P(),
            check_vma=False)

        def full(h_s, t1_, t2_):
            return loss_fn(h_s, t1_, t2_, shards["nbr"],
                           shards["nbr_bond_type"], shards["nbr_bond_dir"],
                           shards["nbr_mask"], cot_sh)

        h_sh = jnp.asarray(np.asarray(h).reshape(N_SHARDS, -1, h.shape[-1]))
        gh, gt1, gt2 = jax.grad(full, argnums=(0, 1, 2))(h_sh, t1, t2)

        def ref_loss(h_, t1_, t2_):
            out = gine_aggregate(h_, t1_, t2_, batch.nbr,
                                 batch.nbr_bond_type, batch.nbr_bond_dir,
                                 batch.nbr_mask)
            return (out * cot).sum()

        rh, rt1, rt2 = jax.grad(ref_loss, argnums=(0, 1, 2))(h, t1, t2)
        np.testing.assert_allclose(np.asarray(gh).reshape(rh.shape),
                                   np.asarray(rh), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gt1), np.asarray(rt1),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gt2), np.asarray(rt2),
                                   rtol=1e-4, atol=1e-4)


class TestHaloVariant:
    def test_forward_matches_single_device(self, setup):
        batch, shards, h, t1, t2 = setup
        mesh = make_mesh(N_SHARDS, axis="shard")
        # halo = per-shard row count (16) >= max molecule size in SMILES
        layer = build_sharded_layer(mesh, axis="shard", variant="halo",
                                    halo=16)
        h_sh = np.asarray(h).reshape(N_SHARDS, -1, h.shape[-1])
        out_sh = np.asarray(layer(
            h_sh, t1, t2, shards["nbr"], shards["nbr_bond_type"],
            shards["nbr_bond_dir"], shards["nbr_mask"]))
        ref = np.asarray(gine_aggregate(
            h, t1, t2, batch.nbr, batch.nbr_bond_type, batch.nbr_bond_dir,
            batch.nbr_mask))
        np.testing.assert_allclose(out_sh.reshape(ref.shape), ref,
                                   rtol=1e-5, atol=1e-5)

    def test_grads_match_single_device(self, setup):
        batch, shards, h, t1, t2 = setup
        mesh = make_mesh(N_SHARDS, axis="shard")
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        from molclr_tpu.parallel.edgepart import gine_aggregate_halo

        cot = jnp.array(np.random.RandomState(3).randn(
            batch.num_nodes, h.shape[-1]), jnp.float32)
        cot_sh = np.asarray(cot).reshape(N_SHARDS, -1, h.shape[-1])

        def local(h_s, t1_, t2_, nbr, bt, bd, mask, cot_s):
            sq = lambda x: x.reshape((-1,) + x.shape[2:])
            out = gine_aggregate_halo(
                sq(h_s), t1_, t2_, sq(nbr), sq(bt), sq(bd), sq(mask),
                "shard", 16)
            return (out * sq(cot_s)).sum()

        a = P("shard")
        loss_fn = shard_map(
            lambda *args: jax.lax.psum(local(*args), "shard"),
            mesh=mesh, in_specs=(a, P(), P(), a, a, a, a, a),
            out_specs=P(), check_vma=False)

        def full(h_s, t1_, t2_):
            return loss_fn(h_s, t1_, t2_, shards["nbr"],
                           shards["nbr_bond_type"], shards["nbr_bond_dir"],
                           shards["nbr_mask"], cot_sh)

        h_sh = jnp.asarray(np.asarray(h).reshape(N_SHARDS, -1, h.shape[-1]))
        gh, gt1, gt2 = jax.grad(full, argnums=(0, 1, 2))(h_sh, t1, t2)

        def ref_loss(h_, t1_, t2_):
            out = gine_aggregate(h_, t1_, t2_, batch.nbr,
                                 batch.nbr_bond_type, batch.nbr_bond_dir,
                                 batch.nbr_mask)
            return (out * cot).sum()

        rh, rt1, rt2 = jax.grad(ref_loss, argnums=(0, 1, 2))(h, t1, t2)
        np.testing.assert_allclose(np.asarray(gh).reshape(rh.shape),
                                   np.asarray(rh), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gt1), np.asarray(rt1),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gt2), np.asarray(rt2),
                                   rtol=1e-4, atol=1e-4)


class TestTileVariant:
    """Tile-aligned packing -> collective-free sharded aggregation."""

    def _tiled_setup(self):
        spec = PadSpec(n_graphs=8, n_nodes=128, n_edges=288, max_degree=6,
                       tile=16)
        batch = pack_batch([featurize_smiles(s) for s in SMILES], spec)
        shards = shard_ell_rows(batch, N_SHARDS)
        rng = np.random.RandomState(5)
        d = 24
        h = jnp.array(rng.randn(batch.num_nodes, d)
                      * np.asarray(batch.node_mask)[:, None], jnp.float32)
        t1 = jnp.array(rng.randn(5, d), jnp.float32)
        t2 = jnp.array(rng.randn(3, d), jnp.float32)
        return batch, shards, h, t1, t2

    def test_no_molecule_crosses_shard(self):
        batch, _, _, _, _ = self._tiled_setup()
        node_graph = np.asarray(batch.node_graph)
        mask = np.asarray(batch.node_mask)
        per_shard = batch.num_nodes // N_SHARDS
        for g in np.unique(node_graph[mask]):
            rows = np.flatnonzero(mask & (node_graph == g))
            assert rows.min() // per_shard == rows.max() // per_shard

    def test_forward_matches_single_device(self):
        batch, shards, h, t1, t2 = self._tiled_setup()
        mesh = make_mesh(N_SHARDS, axis="shard")
        layer = build_sharded_layer(mesh, axis="shard", variant="tile",
                                    tile=16)
        h_sh = np.asarray(h).reshape(N_SHARDS, -1, h.shape[-1])
        out_sh = np.asarray(layer(
            h_sh, t1, t2, shards["nbr"], shards["nbr_bond_type"],
            shards["nbr_bond_dir"], shards["nbr_mask"]))
        ref = np.asarray(gine_aggregate(
            h, t1, t2, batch.nbr, batch.nbr_bond_type, batch.nbr_bond_dir,
            batch.nbr_mask))
        np.testing.assert_allclose(out_sh.reshape(ref.shape), ref,
                                   rtol=1e-5, atol=1e-5)

    def test_compiled_module_has_no_collectives(self):
        """The tile variant's aggregation must compile to zero cross-device
        communication ops."""
        batch, shards, h, t1, t2 = self._tiled_setup()
        mesh = make_mesh(N_SHARDS, axis="shard")
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        from molclr_tpu.parallel.edgepart import local_tile_aggregate

        def local(h_s, t1_, t2_, nbr, bt, bd, mask):
            sq = lambda x: x.reshape((-1,) + x.shape[2:])
            return local_tile_aggregate(
                sq(h_s), t1_, t2_, sq(nbr), sq(bt), sq(bd), sq(mask),
                "shard", 16)[None]

        a = P("shard")
        fn = jax.jit(shard_map(local, mesh=mesh,
                               in_specs=(a, P(), P(), a, a, a, a),
                               out_specs=a, check_vma=False))
        h_sh = jnp.asarray(np.asarray(h).reshape(N_SHARDS, -1, h.shape[-1]))
        hlo = fn.lower(h_sh, t1, t2, shards["nbr"],
                       shards["nbr_bond_type"], shards["nbr_bond_dir"],
                       shards["nbr_mask"]).compile().as_text()
        for coll in ("all-gather", "all-reduce", "collective-permute",
                     "all-to-all"):
            assert coll not in hlo, f"unexpected {coll} in tile variant"
