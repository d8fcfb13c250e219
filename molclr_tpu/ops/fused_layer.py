"""Fused tile-dense GINE layer as Pallas TPU kernels.

One grid step processes one 256-node tile and keeps the whole per-layer
chain in VMEM:

    agg = A[t] @ h[t] + cnt[t] @ etab          (neighbor sum + edge-emb sum)
    out = relu(agg @ W1 + b1) @ W2 + b2        (the GINE update MLP)

XLA runs this as three separate GEMMs with [N, D] / [N, 2D] intermediates
round-tripping HBM between them (the measured fwd gap over the matmul
roofline, docs/DESIGN.md "Known further levers" #1). The kernel reads h
once and writes out once; `agg` and `mid` are additionally written as
residuals so the backward kernel can skip recomputation.

The backward kernel exploits the same symmetry as ops/tile_dense.py: the
per-tile adjacency block is symmetric (undirected bonds + slot-0 self-loop,
packing contract in data/graphs.py), so dh = A @ dagg is the SAME batched
matmul as the forward aggregation. Weight gradients accumulate across the
sequential TPU grid into full-array output blocks (constant index_map),
zeroed at tile 0.

Semantics are pinned to GINEConv's unfused tile-dense path
(ops/tile_dense.gine_tile_aggregate + the mlp_0/mlp_1 Dense pair,
reference models/ginet_molclr.py:16-47): message x_j + e, sum aggregation
incl. the type-4 self-loop, update MLP d -> 2d -> relu -> d, no epsilon.
Parity and gradients are checked against the unfused path in interpreter
mode (tests/test_fused_layer.py); hardware numbers in docs/DESIGN.md.

A (the adjacency) and cnt (the per-node bond-type/direction count matrix)
derive from integer adjacency + boolean masks and are non-differentiable by
construction (stop_gradient upstream); the VJP returns no cotangent for
them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# cnt is padded to this many columns (bond-type one-hot counts ++ bond-dir
# counts ++ zeros); etab rows beyond the real tables are zero.
CNT_PAD = 16


def _specs(t):
    """Per-tile block spec (leading grid dim) and full-array spec."""
    blk = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    full = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return blk, full


def _fwd_kernel(h_ref, adj_ref, cnt_ref, etab_ref, w1_ref, b1_ref, w2_ref,
                b2_ref, out_ref, agg_ref, mid_ref):
    a = adj_ref[0]                                     # [S, S]
    agg = jax.lax.dot_general(
        a, h_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    agg = agg + jax.lax.dot_general(
        cnt_ref[:], etab_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    aggc = agg.astype(h_ref.dtype)
    agg_ref[:] = aggc
    pre = jax.lax.dot_general(
        aggc, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[0]
    mid = jnp.maximum(pre, 0.0).astype(h_ref.dtype)
    mid_ref[:] = mid
    out = jax.lax.dot_general(
        mid, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[0]
    out_ref[:] = out.astype(h_ref.dtype)


def _bwd_kernel(g_ref, adj_ref, cnt_ref, agg_ref, mid_ref, w1_ref, w2_ref,
                dh_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, detab_ref):
    i = pl.program_id(0)
    g = g_ref[:]                                       # [S, D]
    mid = mid_ref[:]                                   # [S, 2D]
    # dmid = (g @ W2^T) * relu'(pre); mid > 0 <=> pre > 0
    dmid = jax.lax.dot_general(
        g, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # compare in f32: Mosaic on this target rejects bf16 cmpf
    dmid = jnp.where(mid.astype(jnp.float32) > 0.0, dmid, 0.0)
    dmidc = dmid.astype(g.dtype)
    dagg = jax.lax.dot_general(
        dmidc, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    daggc = dagg.astype(g.dtype)
    # adjacency blocks are symmetric: adjoint of A @ . is the same matmul
    dh_ref[:] = jax.lax.dot_general(
        adj_ref[0], daggc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(g.dtype)

    @pl.when(i == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        detab_ref[:] = jnp.zeros_like(detab_ref)

    dw1_ref[:] += jax.lax.dot_general(
        agg_ref[:], dmidc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_ref[0, :] += dmid.sum(axis=0)
    dw2_ref[:] += jax.lax.dot_general(
        mid, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db2_ref[0, :] += g.astype(jnp.float32).sum(axis=0)
    detab_ref[:] += jax.lax.dot_general(
        cnt_ref[:], daggc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _run_fwd(h, adj, cnt, etab, w1, b1, w2, b2, interpret):
    n, d = h.shape
    t, s, _ = adj.shape
    d2 = w1.shape[1]
    blk = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    full = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(t,),
        in_specs=[blk(s, d), blk(1, s, s), blk(s, CNT_PAD),
                  full(CNT_PAD, d), full(d, d2), full(1, d2),
                  full(d2, d), full(1, d)],
        out_specs=[blk(s, d), blk(s, d), blk(s, d2)],
        out_shape=[jax.ShapeDtypeStruct((n, d), h.dtype),
                   jax.ShapeDtypeStruct((n, d), h.dtype),
                   jax.ShapeDtypeStruct((n, d2), h.dtype)],
        interpret=interpret,
    )(h, adj, cnt, etab, w1, b1.reshape(1, d2), w2, b2.reshape(1, d))


def _run_bwd(g, adj, cnt, agg, mid, w1, w2, interpret):
    n, d = g.shape
    t, s, _ = adj.shape
    d2 = w1.shape[1]
    blk = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    full = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(t,),
        in_specs=[blk(s, d), blk(1, s, s), blk(s, CNT_PAD), blk(s, d),
                  blk(s, d2), full(d, d2), full(d2, d)],
        out_specs=[blk(s, d), full(d, d2), full(1, d2), full(d2, d),
                   full(1, d), full(CNT_PAD, d)],
        out_shape=[jax.ShapeDtypeStruct((n, d), g.dtype),
                   jax.ShapeDtypeStruct((d, d2), jnp.float32),
                   jax.ShapeDtypeStruct((1, d2), jnp.float32),
                   jax.ShapeDtypeStruct((d2, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((CNT_PAD, d), jnp.float32)],
        interpret=interpret,
    )(g, adj, cnt, agg, mid, w1, w2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_gine_layer(h, adj, cnt, etab, w1, b1, w2, b2,
                     interpret: bool = False):
    """relu((A @ h + cnt @ etab) @ W1 + b1) @ W2 + b2, one VMEM pass/tile.

    h    [N, D]   node features (N = T * tile)
    adj  [T, S, S] block-diagonal symmetric adjacency (build_tile_adjacency)
    cnt  [N, CNT_PAD] per-node edge-embedding count matrix (zero-padded
         columns; stop_gradient upstream)
    etab [CNT_PAD, D] stacked edge tables (rows beyond the real tables zero)
    w1 [D, 2D], b1 [2D], w2 [2D, D], b2 [D]

    Gradients flow to h, etab and the MLP parameters; adj and cnt are
    integer/mask-derived constants.
    """
    out, _, _ = _run_fwd(h, adj, cnt, etab, w1, b1, w2, b2, interpret)
    return out


def _fused_fwd(h, adj, cnt, etab, w1, b1, w2, b2, interpret):
    out, agg, mid = _run_fwd(h, adj, cnt, etab, w1, b1, w2, b2, interpret)
    return out, (adj, cnt, agg, mid, w1, w2)


def _fused_bwd(interpret, res, g):
    adj, cnt, agg, mid, w1, w2 = res
    dh, dw1, db1, dw2, db2, detab = _run_bwd(
        g, adj, cnt, agg, mid, w1, w2, interpret)
    return (dh, None, None, detab.astype(w1.dtype),
            dw1.astype(w1.dtype), db1.reshape(-1),
            dw2.astype(w2.dtype), db2.reshape(-1))


fused_gine_layer.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# BN-chained variant: the previous layer's BatchNorm affine + relu run as
# this kernel's PROLOGUE (y = relu(h * a + b)), and the kernel's EPILOGUE
# accumulates the masked first/second moments of its own output so the NEXT
# BatchNorm's statistics never re-read the [N, D] activations from HBM.
# The [N, D] normalize pass between conv layers disappears entirely; only
# [D]-sized coefficient math stays in XLA (differentiable, so the full BN
# train-mode backward — including the mean/var terms — composes from this
# kernel's (dout, dsums) cotangents automatically).
# ---------------------------------------------------------------------------


def _adj_diag_mask(adj_block, s):
    """Node mask [S, 1] from the adjacency diagonal: real nodes always
    carry the slot-0 self-loop (packing contract; augmentation never
    drops it), padded rows are all-zero — so diag(A) > 0 IS node_mask.
    Saves shipping a separate [N, 1] mask operand to the kernel."""
    eye = (jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (s, s), 1))
    diag = jnp.where(eye, adj_block.astype(jnp.float32), 0.0).sum(
        axis=1, keepdims=True)
    return (diag > 0.0).astype(jnp.float32)


def _bn_fwd_kernel(relu_in, h_ref, a_ref, b_ref, adj_ref, cnt_ref,
                   etab_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   out_ref, sums_ref, agg_ref, mid_ref):
    i = pl.program_id(0)
    pre_in = h_ref[:].astype(jnp.float32) * a_ref[0] + b_ref[0]
    if relu_in:
        pre_in = jnp.maximum(pre_in, 0.0)
    xc = pre_in.astype(h_ref.dtype)
    agg = jax.lax.dot_general(
        adj_ref[0], xc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    agg = agg + jax.lax.dot_general(
        cnt_ref[:], etab_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    aggc = agg.astype(h_ref.dtype)
    agg_ref[:] = aggc
    pre = jax.lax.dot_general(
        aggc, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[0]
    mid = jnp.maximum(pre, 0.0).astype(h_ref.dtype)
    mid_ref[:] = mid
    out = jax.lax.dot_general(
        mid, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[0]
    outc = out.astype(h_ref.dtype)
    out_ref[:] = outc

    @pl.when(i == 0)
    def _():
        sums_ref[:] = jnp.zeros_like(sums_ref)

    # moments of the CAST output (what the unfused BatchNorm sees), over
    # real rows only
    m = _adj_diag_mask(adj_ref[0], out.shape[0])
    ob = outc.astype(jnp.float32) * m
    sums_ref[0, :] += ob.sum(axis=0)
    sums_ref[1, :] += (ob * outc.astype(jnp.float32)).sum(axis=0)


def _bn_bwd_kernel(relu_in, g_ref, ds_ref, h_ref, a_ref, b_ref,
                   adj_ref, cnt_ref, agg_ref, mid_ref, out_ref, w1_ref,
                   w2_ref, dh_ref, da_ref, db_ref, dw1_ref, db1_ref,
                   dw2_ref, db2_ref, detab_ref):
    i = pl.program_id(0)
    ob = out_ref[:].astype(jnp.float32)
    m = _adj_diag_mask(adj_ref[0], ob.shape[0])
    # total output cotangent: downstream grad + the moment sums' adjoint
    gt = (g_ref[:].astype(jnp.float32)
          + m * (ds_ref[0, :] + 2.0 * ob * ds_ref[1, :]))
    gtc = gt.astype(g_ref.dtype)
    mid = mid_ref[:]
    dmid = jax.lax.dot_general(
        gtc, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dmid = jnp.where(mid.astype(jnp.float32) > 0.0, dmid, 0.0)
    dmidc = dmid.astype(g_ref.dtype)
    dagg = jax.lax.dot_general(
        dmidc, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    daggc = dagg.astype(g_ref.dtype)
    dx = jax.lax.dot_general(
        adj_ref[0], daggc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    hf = h_ref[:].astype(jnp.float32)
    if relu_in:
        dpre = jnp.where(hf * a_ref[0] + b_ref[0] > 0.0, dx, 0.0)
    else:
        dpre = dx
    dh_ref[:] = (dpre * a_ref[0]).astype(g_ref.dtype)

    @pl.when(i == 0)
    def _():
        da_ref[:] = jnp.zeros_like(da_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        detab_ref[:] = jnp.zeros_like(detab_ref)

    da_ref[0, :] += (dpre * hf).sum(axis=0)
    db_ref[0, :] += dpre.sum(axis=0)
    dw1_ref[:] += jax.lax.dot_general(
        agg_ref[:], dmidc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_ref[0, :] += dmid.sum(axis=0)
    dw2_ref[:] += jax.lax.dot_general(
        mid, gtc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db2_ref[0, :] += gt.sum(axis=0)
    detab_ref[:] += jax.lax.dot_general(
        cnt_ref[:], daggc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _bn_run_fwd(h, a, b, adj, cnt, etab, w1, b1, w2, b2, relu_in,
                interpret):
    n, d = h.shape
    t, s, _ = adj.shape
    d2 = w1.shape[1]
    blk, full = _specs(t)
    return pl.pallas_call(
        functools.partial(_bn_fwd_kernel, relu_in),
        grid=(t,),
        in_specs=[blk(s, d), full(1, d), full(1, d),
                  blk(1, s, s), blk(s, CNT_PAD), full(CNT_PAD, d),
                  full(d, d2), full(1, d2), full(d2, d), full(1, d)],
        out_specs=[blk(s, d), full(2, d), blk(s, d), blk(s, d2)],
        out_shape=[jax.ShapeDtypeStruct((n, d), h.dtype),
                   jax.ShapeDtypeStruct((2, d), jnp.float32),
                   jax.ShapeDtypeStruct((n, d), h.dtype),
                   jax.ShapeDtypeStruct((n, d2), h.dtype)],
        interpret=interpret,
    )(h, a.reshape(1, d), b.reshape(1, d), adj, cnt, etab,
      w1, b1.reshape(1, d2), w2, b2.reshape(1, d))


def _bn_run_bwd(g, dsums, h, a, b, adj, cnt, agg, mid, out, w1, w2,
                relu_in, interpret):
    n, d = g.shape
    t, s, _ = adj.shape
    d2 = w1.shape[1]
    blk, full = _specs(t)
    return pl.pallas_call(
        functools.partial(_bn_bwd_kernel, relu_in),
        grid=(t,),
        in_specs=[blk(s, d), full(2, d), blk(s, d), full(1, d), full(1, d),
                  blk(1, s, s), blk(s, CNT_PAD), blk(s, d),
                  blk(s, d2), blk(s, d), full(d, d2), full(d2, d)],
        out_specs=[blk(s, d), full(1, d), full(1, d), full(d, d2),
                   full(1, d2), full(d2, d), full(1, d), full(CNT_PAD, d)],
        out_shape=[jax.ShapeDtypeStruct((n, d), g.dtype),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((d, d2), jnp.float32),
                   jax.ShapeDtypeStruct((1, d2), jnp.float32),
                   jax.ShapeDtypeStruct((d2, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((CNT_PAD, d), jnp.float32)],
        interpret=interpret,
    )(g, dsums, h, a.reshape(1, d), b.reshape(1, d), adj, cnt,
      agg, mid, out, w1, w2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def fused_gine_bn_layer(h, a, b, adj, cnt, etab, w1, b1, w2, b2,
                        relu_in: bool = False, interpret: bool = False):
    """BN-chained fused GINE layer: prologue relu(h * a + b) (the PREVIOUS
    BatchNorm's affine), the conv + MLP chain, and an epilogue accumulating
    the masked (sum, sum-of-squares) moments of the output.

    h     [N, D]  RAW previous conv output (bf16/f32)
    a, b  [D]     fp32 BatchNorm coefficients (inv*scale, bias - mean*inv*
                  scale); identity prologue = (ones, zeros, relu_in=False)
    relu_in       apply relu after the affine (True for all but the first
                  layer, matching the reference's no-relu-on-last chain)

    The node mask is derived in-kernel from the adjacency diagonal
    (_adj_diag_mask — real nodes always carry the slot-0 self-loop).
    Returns (out [N, D], sums [2, D] fp32). Gradients flow to h, a, b,
    etab and the MLP parameters; adj/cnt are mask-derived constants.
    """
    out, sums, _, _ = _bn_run_fwd(h, a, b, adj, cnt, etab, w1, b1,
                                  w2, b2, relu_in, interpret)
    return out, sums


def _bn_fused_fwd(h, a, b, adj, cnt, etab, w1, b1, w2, b2, relu_in,
                  interpret):
    out, sums, agg, mid = _bn_run_fwd(h, a, b, adj, cnt, etab, w1,
                                      b1, w2, b2, relu_in, interpret)
    return (out, sums), (h, a, b, adj, cnt, agg, mid, out, w1, w2)


def _bn_fused_bwd(relu_in, interpret, res, cts):
    g, dsums = cts
    h, a, b, adj, cnt, agg, mid, out, w1, w2 = res
    dh, da, db, dw1, db1, dw2, db2, detab = _bn_run_bwd(
        g, dsums, h, a, b, adj, cnt, agg, mid, out, w1, w2,
        relu_in, interpret)
    return (dh, da.reshape(-1), db.reshape(-1), None, None,
            detab.astype(w1.dtype), dw1.astype(w1.dtype), db1.reshape(-1),
            dw2.astype(w2.dtype), db2.reshape(-1))


fused_gine_bn_layer.defvjp(_bn_fused_fwd, _bn_fused_bwd)


def pack_cnt(cnt_t, cnt_d):
    """[N, 5] bond-type counts ++ [N, 3] bond-dir counts -> [N, CNT_PAD]."""
    n = cnt_t.shape[0]
    pad = CNT_PAD - cnt_t.shape[1] - cnt_d.shape[1]
    return jax.lax.stop_gradient(jnp.concatenate(
        [cnt_t, cnt_d, jnp.zeros((n, pad), cnt_t.dtype)], axis=1))


def pack_etab(e1, e2, dtype):
    """Stack edge tables into [CNT_PAD, D]; grads split back via concat."""
    pad = CNT_PAD - e1.shape[0] - e2.shape[0]
    return jnp.concatenate(
        [e1, e2, jnp.zeros((pad, e1.shape[1]), dtype)], axis=0).astype(dtype)
