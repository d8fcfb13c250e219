"""Multi-host (multi-process) data-parallel pretraining support.

The reference is strictly single-process/single-GPU (SURVEY §2.5;
/root/reference/molclr.py:45-53); pod-scale runs are net-new design. The
model here is the standard JAX multi-controller recipe:

  1. every host process calls `init_distributed(...)` (jax.distributed)
     before touching devices;
  2. each process featurizes/packs ONLY its slice of the corpus
     (`corpus_shard_range`) — host work scales out with hosts;
  3. each process stacks its local packed batches and the global
     device-resident cache array is assembled with
     `jax.make_array_from_process_local_data` (`shard_batch_cache_global`)
     — no host ever materializes the global corpus;
  4. the existing shard_map DP step (parallel/dp.py) runs unchanged over
     the GLOBAL mesh: XLA routes the NT-Xent all_gather / grad psum over
     ICI within a slice and DCN across slices.

Single-process correctness is pinned by tests/test_multihost.py (the
helpers degenerate exactly to parallel/dp.shard_batch_cache semantics
when process_count == 1), and the true multi-process path EXECUTES in
tests/test_multihost.py::TestTwoProcessIntegration: two OS processes
under jax.distributed (TCP coordinator, gloo CPU collectives) drive
init_distributed -> corpus_shard_range -> shard_batch_cache_global -> a
scanned DP epoch whose losses match the single-process 2-device run.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize the JAX multi-controller runtime.

    On TPU pods with standard env (TPU_WORKER_HOSTNAMES etc.) all three
    args may be None and autodetection applies. No-op when already
    initialized or when nothing indicates a multi-process run.

    Must run before anything touches the XLA backend — including
    jax.devices()/jax.process_count() — so the already-initialized check
    uses jax.distributed.is_initialized(), which does not boot XLA."""
    if jax.distributed.is_initialized():
        return  # already initialized
    if coordinator is None and num_processes is None:
        import os

        if not any(k in os.environ for k in
                   ("COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
                    "MEGASCALE_COORDINATOR_ADDRESS")):
            return  # single-process run
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def corpus_shard_range(n_items: int, process_index: int | None = None,
                       process_count: int | None = None) -> range:
    """This process's contiguous slice of an n_items corpus.

    Contiguous (not strided) so a memory-mapped corpus (data/corpus.py)
    reads one dense region per host. Remainder items go to the first
    processes, so all slices differ by at most one."""
    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    base, rem = divmod(n_items, n)
    start = p * base + min(p, rem)
    return range(start, start + base + (1 if p < rem else 0))


def global_mesh(axis: str = "data") -> Mesh:
    """One-axis mesh over ALL devices of ALL processes."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def shard_batch_cache_global(batches, mesh: Mesh, axis: str = "data"):
    """Multi-host analog of parallel/dp.shard_batch_cache.

    `batches` are THIS process's packed GraphBatches. Each process stacks
    its batches into a [n_local_dev, S, ...] block; the blocks are
    assembled into one global [n_global_dev, S, ...] jax.Array sharded on
    the leading axis without any host holding the global data. S (steps
    per device per epoch) is the MINIMUM across processes so every device
    scans the same trip count (SPMD requires identical programs); the
    per-process remainder is dropped, mirroring drop_last.

    Returns (global_stack_tree, s_local, n_dropped_local)."""
    n_local = jax.local_device_count()
    s_all = len(batches) // n_local
    # all processes must agree on S: min over processes
    if jax.process_count() > 1:
        import jax.numpy as jnp

        s_arr = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(axis)),
            np.full((n_local,), s_all, np.int32))
        s = int(jnp.min(s_arr))
    else:
        s = s_all
    if s == 0:
        raise ValueError(
            f"{len(batches)} local batches < {n_local} local devices")
    kept = batches[: s * n_local]
    sharding = NamedSharding(mesh, P(axis))

    def assemble(*xs):
        local = np.stack(xs, axis=0).reshape(
            (n_local, s) + np.asarray(xs[0]).shape)
        return jax.make_array_from_process_local_data(sharding, local)

    stack = jax.tree_util.tree_map(assemble, *kept)
    return stack, s, len(batches) - s * n_local


def assemble_rows(local_rows: np.ndarray, mesh: Mesh, axis: str = "data"):
    """Global [n_global_dev, ...] array from this process's
    [n_local_dev, ...] block, sharded on the leading axis (used for the
    per-dispatch batch-index matrices of the DP resident path). Degenerate
    single-process case: equivalent to device_put with the same
    sharding."""
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(axis)), np.ascontiguousarray(local_rows))


def replicate_to_mesh(tree, mesh: Mesh):
    """Fully-replicated global arrays from process-local host values
    (params / optimizer state: every process holds the same bytes)."""
    sharding = NamedSharding(mesh, P())

    def rep(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])

    return jax.tree_util.tree_map(rep, tree)


def agree_ints(vals, mesh: Mesh, axis: str = "data", op: str = "max"):
    """Cross-process agreement on small host integers (max or min).

    SPMD requires identical static shapes/specs on every process; each
    process contributes its local values and all adopt the elementwise
    max/min. Uses the same make_array assembly as the cache builders —
    no separate coordination channel. Single-process: identity."""
    vals = tuple(int(v) for v in vals)
    if jax.process_count() <= 1:
        return vals
    import jax.numpy as jnp

    n_local = jax.local_device_count()
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(axis)),
        np.tile(np.asarray(vals, np.int32)[None, :], (n_local, 1)))
    red = (jnp.max if op == "max" else jnp.min)(arr, axis=0)
    return tuple(int(x) for x in jax.device_get(red))


def shard_unit_stack_global(stack, mesh: Mesh, axis: str = "data"):
    """Multi-host analog of parallel/dp.shard_unit_stack: each process
    contributes ITS tile-unit stack (packed from its corpus shard with
    the cross-process AGREED unit spec); the global
    [n_global_dev, U_dev, ...] array is assembled without any host
    holding global data. U_dev (units per device) is the MIN across
    processes so every device scans identical shapes. Returns
    (global_stack, u_dev, n_dropped_local)."""
    n_local = jax.local_device_count()
    u_proc = jax.tree_util.tree_leaves(stack)[0].shape[0]
    (u_dev,) = agree_ints((u_proc // n_local,), mesh, axis, op="min")
    if u_dev == 0:
        raise ValueError(f"{u_proc} local units < {n_local} local devices")
    sharding = NamedSharding(mesh, P(axis))

    def assemble(x):
        x = np.asarray(x)[: u_dev * n_local]
        return jax.make_array_from_process_local_data(
            sharding, x.reshape((n_local, u_dev) + x.shape[1:]))

    out = jax.tree_util.tree_map(assemble, stack)
    return out, u_dev, u_proc - u_dev * n_local
