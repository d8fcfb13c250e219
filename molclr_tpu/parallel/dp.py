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

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from molclr_tpu.data.augment import paired_augment
from molclr_tpu.losses import nt_xent_loss
from molclr_tpu.train.state import TrainState


def resolve_ntxent(impl: str, interpret: bool = False,
                   n_devices: int = 1):
    """'xla' -> closed-form losses.nt_xent_loss; 'pallas' -> the fused
    blockwise kernel (ops/pallas_ntxent.py), the right choice at pod-
    scale global batches, where the XLA path materializes a [2B, 2B]
    similarity matrix (1 GiB fp32 at 2B=16384) and the kernel is
    1.29x whole-step / 4.75x loss-only faster (docs/DESIGN.md
    "NT-Xent impls inside the REAL train step").

    'auto' defers the choice to TRACE time: the returned callable picks
    the kernel on a real TPU when the ACTUAL global 2B — 2 x the
    per-call pair count x n_devices (the mesh axis size when the call
    gathers over one) — is past the measured crossover (2B >= 4096).
    A config-derived static resolution is wrong on the default
    fresh-compositions units path, whose batches carry t*G_t graph
    slots, not cfg.batch_size (ADVICE r4). The kernel pads pair arrays
    to a legal multiple of 64 pairs itself, so legality never gates the
    choice. interpret=True runs the kernel in Pallas interpreter mode
    (CPU parity tests only)."""
    import functools

    if impl == "xla":
        return nt_xent_loss
    if impl == "pallas":
        from molclr_tpu.ops.pallas_ntxent import nt_xent_pallas

        return functools.partial(nt_xent_pallas, interpret=interpret)
    if impl != "auto":
        raise ValueError(f"unknown ntxent_impl {impl!r}")

    def auto_loss(zis, zjs, temperature=0.1, use_cosine=True,
                  axis_name=None, pair_mask=None):
        two_b = 2 * zis.shape[0] * (n_devices if axis_name else 1)
        if two_b >= 4096 and (interpret
                              or jax.default_backend() == "tpu"):
            from molclr_tpu.ops.pallas_ntxent import nt_xent_pallas

            return nt_xent_pallas(zis, zjs, temperature, use_cosine,
                                  axis_name=axis_name,
                                  pair_mask=pair_mask,
                                  interpret=interpret)
        return nt_xent_loss(zis, zjs, temperature, use_cosine,
                            axis_name=axis_name, pair_mask=pair_mask)

    return auto_loss


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis,))


def stack_batches(batches) -> object:
    """Stack per-device GraphBatches along a new leading device axis; the
    result is sharded on that axis across the mesh."""
    return jax.tree_util.tree_map(
        lambda *xs: np.stack(xs, axis=0), *batches)


def _make_local_step(model, tx, *, aug, temperature, use_cosine, axis,
                     tile, bond_window, max_waves=0, ntxent_impl="xla",
                     ntxent_interpret=False, n_devices=1):
    """Per-device train step body shared by the one-shot and the
    device-resident multi-step DP paths. `batch` is this device's LOCAL
    GraphBatch (no leading device axis); must run inside shard_map.
    `views` (optional) carries precomputed augmented views (the batched
    per-dispatch augmentation of train/pretrain.py, same rng contract)."""

    ntxent = resolve_ntxent(ntxent_impl, ntxent_interpret,
                            n_devices=n_devices)

    def local_step(state, batch, rng, views=None):
        dev = jax.lax.axis_index(axis)
        rng = jax.random.fold_in(jax.random.fold_in(rng, state.step), dev)

        def loss_fn(params, batch_stats):
            rng_aug, rng_di, rng_dj = jax.random.split(rng, 3)
            if views is not None:
                vi, vj = views
            else:
                vi, vj = paired_augment(batch, rng_aug, aug, tile=tile,
                                        bond_window=bond_window,
                                        max_waves=max_waves)
            (_, zi), upd = model.apply(
                {"params": params, "batch_stats": batch_stats}, vi,
                train=True, rngs={"dropout": rng_di},
                mutable=["batch_stats"])
            (_, zj), upd = model.apply(
                {"params": params, "batch_stats": upd["batch_stats"]}, vj,
                train=True, rngs={"dropout": rng_dj},
                mutable=["batch_stats"])
            loss = ntxent(zi.astype(jnp.float32),
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

    return local_step


def build_dp_pretrain_step(model, tx, mesh: Mesh, *, aug: str = "node",
                           temperature: float = 0.1,
                           use_cosine: bool = True, axis: str = "data",
                           tile: int = 0, bond_window: int = 0,
                           max_waves: int = 0,
                           ntxent_impl: str = "xla",
                           ntxent_interpret: bool = False):
    """Jitted data-parallel train step: (state, stacked_batch, rng) ->
    (state, loss). `stacked_batch` has a leading device axis of size
    mesh.shape[axis]; state is replicated. ntxent_impl='pallas' computes
    the global-negative loss with the fused kernel (each replica runs it
    on the all-gathered [2B_global, D] projections)."""
    step = _make_local_step(model, tx, aug=aug, temperature=temperature,
                            use_cosine=use_cosine, axis=axis, tile=tile,
                            bond_window=bond_window, max_waves=max_waves,
                            ntxent_impl=ntxent_impl,
                            ntxent_interpret=ntxent_interpret,
                            n_devices=mesh.shape[axis])

    def local_step(state, stacked_batch, rng):
        batch = jax.tree_util.tree_map(lambda x: x[0], stacked_batch)
        return step(state, batch, rng)

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(mesh.axis_names[0]), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))


def shard_batch_cache(batches, mesh: Mesh, axis: str = "data"):
    """Stack an epoch's packed batches into a [n_dev, S, ...] tree sharded
    across the mesh on the leading device axis (one device_put for the
    whole epoch). Device d owns batches[d*S : (d+1)*S]; a trailing
    remainder of len(batches) % n_dev is dropped (drop_last at device
    granularity). Thereafter epochs shuffle WITHIN each device's shard —
    the standard DP data-sharding relaxation of global shuffling (each
    step still draws one batch per device, every batch is seen once per
    epoch)."""
    from jax.sharding import NamedSharding

    n_dev = mesh.shape[axis]
    s = len(batches) // n_dev
    if s == 0:
        raise ValueError(f"{len(batches)} batches < {n_dev} devices")
    kept = batches[: s * n_dev]
    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs, axis=0).reshape(
            (n_dev, s) + np.asarray(xs[0]).shape), *kept)
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(stacked, sharding), s, len(batches) - s * n_dev


def build_dp_multi_step_resident(model, tx, mesh: Mesh, *,
                                 aug: str = "node",
                                 temperature: float = 0.1,
                                 use_cosine: bool = True,
                                 axis: str = "data", tile: int = 0,
                                 bond_window: int = 0, max_waves: int = 0,
                                 ntxent_impl: str = "xla",
                                 ntxent_interpret: bool = False,
                                 aug_precompute: bool = True):
    """Scan-folded DP dispatch over the DEVICE-RESIDENT sharded batch
    cache: (state, stack, idxs, rng) -> (state, losses[S]).

    `stack` is the [n_dev, S_total, ...] tree from shard_batch_cache;
    `idxs` is [n_dev, S] — per-device batch indices for this dispatch's S
    steps (each row a slice of that device's per-epoch shard permutation).
    No host->device data movement per step: the only per-dispatch upload
    is the index matrix. This is the DP analog of the single-chip
    multi_step_resident (train/pretrain.py) — it closes the gap VERDICT r1
    flagged where the DP path forfeited the resident-cache campaign."""
    step = _make_local_step(model, tx, aug=aug, temperature=temperature,
                            use_cosine=use_cosine, axis=axis, tile=tile,
                            bond_window=bond_window, max_waves=max_waves,
                            ntxent_impl=ntxent_impl,
                            ntxent_interpret=ntxent_interpret,
                            n_devices=mesh.shape[axis])

    def local_multi(state, stack, idxs, rng):
        local = jax.tree_util.tree_map(lambda x: x[0], stack)  # [S_tot,...]
        my_idxs = idxs[0]                                      # [S]
        n = my_idxs.shape[0]
        get_batch = lambda i: jax.tree_util.tree_map(
            lambda x: x[my_idxs[i]], local)

        if aug_precompute and aug != "none":
            # batched per-dispatch augmentation: same per-device rng
            # contract as local_step (shared engine, data/augment.py)
            deltas = _dp_deltas(get_batch, n, state.step, rng, axis, aug,
                                tile, bond_window, max_waves)
            return _scan_with_dp_deltas(step, state, get_batch, deltas,
                                        n, rng)

        def body(s, i):
            return step(s, get_batch(i), rng)

        return jax.lax.scan(body, state,
                            jnp.arange(n, dtype=jnp.int32))

    a = P(mesh.axis_names[0])
    sharded = shard_map(
        local_multi, mesh=mesh,
        in_specs=(P(), a, a, P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))


def _dp_deltas(get_batch, n, start_step, rng, axis, aug, tile,
               bond_window, max_waves=0):
    """Per-device batched augmentation deltas for a DP scan: step i on
    device d augments with split(fold_in(fold_in(rng, start+i), d), 3)[0]
    — the exact _make_local_step rng contract. Must run inside
    shard_map."""
    from molclr_tpu.data.augment import precompute_deltas_for

    dev = jax.lax.axis_index(axis)
    return precompute_deltas_for(
        get_batch,
        lambda i: jax.random.split(jax.random.fold_in(
            jax.random.fold_in(rng, start_step + i), dev), 3)[0],
        n, aug, tile=tile, bond_window=bond_window,
        max_waves=max_waves)


def _scan_with_dp_deltas(step, state, get_batch, deltas, n, rng):
    from molclr_tpu.data.augment import apply_view_delta

    def body(s, i):
        b = get_batch(i)
        di, dj = jax.tree_util.tree_map(lambda x: x[i], deltas)
        return step(s, b, rng,
                    (apply_view_delta(b, di), apply_view_delta(b, dj)))

    return jax.lax.scan(body, state, jnp.arange(n, dtype=jnp.int32))


def shard_unit_stack(stack, mesh: Mesh, axis: str = "data"):
    """Distribute a [U, ...] tile-unit stack (data/regroup.py) across the
    mesh: [n_dev, U_local, ...] sharded on the leading device axis.
    Device d owns units [d*U_local, (d+1)*U_local); the U % n_dev
    remainder is dropped (drop_last at unit granularity). Returns
    (sharded_stack, u_local, n_dropped)."""
    from jax.sharding import NamedSharding

    n_dev = mesh.shape[axis]
    u = jax.tree_util.tree_leaves(stack)[0].shape[0]
    u_local = u // n_dev
    if u_local == 0:
        raise ValueError(f"{u} units < {n_dev} devices")
    sharding = NamedSharding(mesh, P(axis))
    out = jax.tree_util.tree_map(
        lambda x: jax.device_put(
            np.asarray(x)[: u_local * n_dev].reshape(
                (n_dev, u_local) + x.shape[1:]), sharding), stack)
    return out, u_local, u - u_local * n_dev


def build_dp_multi_step_units(model, tx, mesh: Mesh, *,
                              aug: str = "node", temperature: float = 0.1,
                              use_cosine: bool = True,
                              axis: str = "data", tile: int = 0,
                              bond_window: int = 0, max_waves: int = 0,
                              ntxent_impl: str = "xla",
                              ntxent_interpret: bool = False,
                              aug_precompute: bool = True):
    """DP fresh-composition epochs: (state, sharded_unit_stack, idx_mat,
    rng) -> (state, losses[S]). `idx_mat` is [n_dev, S, T] — per-device,
    per-step unit selections; each device regroups T of ITS OWN tile-
    units into a fresh local batch ON-DEVICE (data/regroup.concat_units)
    every step, so batch membership re-draws per epoch at unit
    granularity with zero host traffic beyond the index tensor — the DP
    analog of the single-chip units path (reference DataLoader reshuffle
    semantics)."""
    if tile <= 0:
        raise ValueError("fresh-composition DP epochs need tile > 0")
    step = _make_local_step(model, tx, aug=aug, temperature=temperature,
                            use_cosine=use_cosine, axis=axis, tile=tile,
                            bond_window=bond_window, max_waves=max_waves,
                            ntxent_impl=ntxent_impl,
                            ntxent_interpret=ntxent_interpret,
                            n_devices=mesh.shape[axis])

    def local_multi(state, ustack, idx_mat, rng):
        from molclr_tpu.data.regroup import concat_units

        units = jax.tree_util.tree_map(lambda x: x[0], ustack)
        my_idx = idx_mat[0]                          # [S, T]
        n = my_idx.shape[0]
        get_batch = lambda i: concat_units(units, my_idx[i])

        if aug_precompute and aug != "none":
            deltas = _dp_deltas(get_batch, n, state.step, rng, axis, aug,
                                tile, bond_window, max_waves)
            return _scan_with_dp_deltas(step, state, get_batch, deltas,
                                        n, rng)

        def body(s, i):
            return step(s, get_batch(i), rng)

        return jax.lax.scan(body, state,
                            jnp.arange(n, dtype=jnp.int32))

    a = P(mesh.axis_names[0])
    sharded = shard_map(
        local_multi, mesh=mesh,
        in_specs=(P(), a, a, P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))
