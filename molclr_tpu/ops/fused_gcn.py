"""Fused tile-dense GCN layer as Pallas TPU kernels.

One grid step processes one 256-node tile and keeps the per-layer GEMM
chain in VMEM:

    out = A[t] @ (x[t] @ W)

XLA runs this as two GEMMs with the [N, D] intermediate x@W
round-tripping HBM between them. The scalar edge-embedding term
(cnt @ etab, a [N, 1] column) and the bias stay in XLA — they are
elementwise on the output and fuse into the following BatchNorm pass.

Backward exploits the same symmetry as ops/fused_layer.py: per-tile
adjacency blocks are symmetric (undirected bonds + slot-0 self-loop;
with GCN normalization the dis_i * dis_j weights are symmetric too), so
dxw = A @ g is the forward's batched matmul. dW accumulates across the
sequential TPU grid into a full-array output block zeroed at tile 0; no
residuals are needed (x is an autodiff input and xw is recomputed).

Semantics pinned to GCNConv's unfused tile-dense path (tile_matmul of
adj with x @ weight, reference models/gcn_molclr.py:62-91) by
tests/test_fused_layer.py::TestGCNKernel in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(x_ref, adj_ref, w_ref, out_ref):
    xw = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x_ref.dtype)
    out_ref[:] = jax.lax.dot_general(
        adj_ref[0], xw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x_ref.dtype)


def _bwd_kernel(g_ref, x_ref, adj_ref, w_ref, dx_ref, dw_ref):
    i = pl.program_id(0)
    # adjacency blocks are symmetric: adjoint of A @ . is the same matmul
    dxw = jax.lax.dot_general(
        adj_ref[0], g_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(g_ref.dtype)
    dx_ref[:] = jax.lax.dot_general(
        dxw, w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(g_ref.dtype)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dw_ref[:] += jax.lax.dot_general(
        x_ref[:], dxw, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _specs(t, s, d):
    blk = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    full = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return blk, full


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_gcn_layer(x, adj, w, interpret: bool = False):
    """A @ (x @ W) with the x@W intermediate VMEM-resident per tile.

    x   [N, D]     node features (N = T * tile)
    adj [T, S, S]  block-diagonal symmetric adjacency (may carry the GCN
                   dis_i * dis_j normalization weights — still symmetric)
    w   [D, D]     the GCN weight matrix

    Gradients flow to x and w; adj is mask-derived (stop_gradient
    upstream) and gets no cotangent.
    """
    return _run_fwd(x, adj, w, interpret)


def _run_fwd(x, adj, w, interpret):
    n, d = x.shape
    t, s, _ = adj.shape
    blk, full = _specs(t, s, d)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(t,),
        in_specs=[blk(s, d), blk(1, s, s), full(d, d)],
        out_specs=blk(s, d),
        out_shape=jax.ShapeDtypeStruct((n, d), x.dtype),
        interpret=interpret,
    )(x, adj, w)


def _fused_fwd(x, adj, w, interpret):
    return _run_fwd(x, adj, w, interpret), (x, adj, w)


def _fused_bwd(interpret, res, g):
    x, adj, w = res
    n, d = x.shape
    t, s, _ = adj.shape
    blk, full = _specs(t, s, d)
    dx, dw = pl.pallas_call(
        _bwd_kernel,
        grid=(t,),
        in_specs=[blk(s, d), blk(s, d), blk(1, s, s), full(d, d)],
        out_specs=[blk(s, d), full(d, d)],
        out_shape=[jax.ShapeDtypeStruct((n, d), g.dtype),
                   jax.ShapeDtypeStruct((d, d), jnp.float32)],
        interpret=interpret,
    )(g, x, adj, w)
    return dx, None, dw.astype(w.dtype)


fused_gcn_layer.defvjp(_fused_fwd, _fused_bwd)
