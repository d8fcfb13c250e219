"""Data-parallel contrastive pretraining over a device mesh.

Design (SURVEY §2.5): each device owns one packed GraphBatch shard; the
train step runs under shard_map with
  - cross-replica BatchNorm statistics (psum inside MaskedBatchNorm via
    bn_axis_name),
  - an all-gather of both views' projections so NT-Xent negatives span the
    GLOBAL batch (the reference's in-batch-negative semantics,
    utils/nt_xent.py:48-57, made into a collective),
  - gradient pmean before the (replicated) optimizer update.

Collectives ride ICI via XLA; no NCCL analog exists or is needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from molclr_tpu.data.augment import paired_augment
from molclr_tpu.losses import nt_xent_loss
from molclr_tpu.train.state import TrainState


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis,))


def stack_batches(batches) -> object:
    """Stack per-device GraphBatches along a new leading device axis; the
    result is sharded on that axis across the mesh."""
    return jax.tree_util.tree_map(
        lambda *xs: np.stack(xs, axis=0), *batches)


def build_dp_pretrain_step(model, tx, mesh: Mesh, *, aug: str = "node",
                           temperature: float = 0.1,
                           use_cosine: bool = True, axis: str = "data",
                           tile: int = 0, bond_window: int = 0):
    """Jitted data-parallel train step: (state, stacked_batch, rng) ->
    (state, loss). `stacked_batch` has a leading device axis of size
    mesh.shape[axis]; state is replicated."""

    def local_step(state, stacked_batch, rng):
        batch = jax.tree_util.tree_map(lambda x: x[0], stacked_batch)
        dev = jax.lax.axis_index(axis)
        rng = jax.random.fold_in(jax.random.fold_in(rng, state.step), dev)

        def loss_fn(params, batch_stats):
            rng_aug, rng_di, rng_dj = jax.random.split(rng, 3)
            vi, vj = paired_augment(batch, rng_aug, aug, tile=tile,
                                    bond_window=bond_window)
            (_, zi), upd = model.apply(
                {"params": params, "batch_stats": batch_stats}, vi,
                train=True, rngs={"dropout": rng_di},
                mutable=["batch_stats"])
            (_, zj), upd = model.apply(
                {"params": params, "batch_stats": upd["batch_stats"]}, vj,
                train=True, rngs={"dropout": rng_dj},
                mutable=["batch_stats"])
            loss = nt_xent_loss(zi.astype(jnp.float32),
                                zj.astype(jnp.float32), temperature,
                                use_cosine, axis_name=axis,
                                pair_mask=batch.graph_mask)
            return loss, upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats)
        grads = jax.lax.pmean(grads, axis)
        # BN stats were already psum-synced inside the model; average the
        # replicas' running stats to keep them bit-identical.
        new_stats = jax.lax.pmean(new_stats, axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params,
                                        updates)
        new_state = TrainState(params=params, batch_stats=new_stats,
                               opt_state=opt_state, step=state.step + 1)
        return new_state, loss

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(mesh.axis_names[0]), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))
