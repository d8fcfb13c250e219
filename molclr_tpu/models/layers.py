"""Building blocks: torch-parity initializers, masked BatchNorm, GINE/GCN
convolutions over the ELL adjacency.

Semantics are pinned to the reference:
  GINEConv  message x_j + edge_emb, sum aggregation incl. type-4 self-loop,
            update MLP d->2d->relu->d, NO epsilon term
            (ref models/ginet_molclr.py:16-47).
  GCNConv   x @ W first, scalar edge embeddings, message x_j + e, sum
            aggregation, bias after; symmetric normalization is computed then
            DISCARDED in the reference (quirk Q2, gcn_molclr.py:74) — the
            default here reproduces that (normalize=False) so the shipped
            checkpoint stays a valid parity anchor; normalize=True enables
            the intended D^-1/2 A D^-1/2 weighting.
  BatchNorm torch BatchNorm1d semantics (eps 1e-5, momentum 0.1, biased var
            for normalization, unbiased in running stats), computed over real
            nodes only (padding excluded) and optionally synced across a mesh
            axis for data parallelism.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from molclr_tpu.data.featurize import (
    NUM_BOND_DIRS,
    NUM_BOND_TYPES,
)
from molclr_tpu.ops.scatter_free import gcn_aggregate, gine_aggregate
from molclr_tpu.ops.tile_dense import gcn_tile_aggregate, gine_tile_aggregate


def xavier_uniform_embed(key, shape, dtype=jnp.float32):
    """torch nn.init.xavier_uniform_ on an embedding table [num, dim]:
    bound = sqrt(6 / (num + dim)) (fan_out=num, fan_in=dim for a 2D tensor;
    ref ginet_molclr.py:26-27,70-71)."""
    num, dim = shape
    bound = (6.0 / (num + dim)) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_kernel(key, shape, dtype=jnp.float32):
    """torch nn.Linear default weight init: kaiming_uniform(a=sqrt(5)) ==
    U(+-1/sqrt(fan_in)). Flax kernels are [in, out] so fan_in = shape[0]."""
    fan_in = shape[0]
    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias(fan_in: int) -> Callable:
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def dense(features: int, name: str | None = None,
          in_features: int | None = None, dtype=None):
    """nn.Dense with torch-default init (requires in_features for the bias
    bound, matching torch's fan_in-dependent bias init).

    dtype is the COMPUTE dtype (flax semantics: params stay fp32 storage and
    are cast for the GEMM; autodiff returns fp32 param grads through the
    cast). Without it, flax promotes bf16 activations to fp32 GEMMs — on TPU
    that silently runs every Dense at the fp32 MXU rate, so bf16 models must
    pass their activation dtype here (the apex-O2 analog the reference gets
    from amp, molclr.py:93-96)."""
    assert in_features is not None
    return nn.Dense(
        features,
        name=name,
        dtype=dtype,
        kernel_init=torch_linear_kernel,
        bias_init=torch_linear_bias(in_features),
    )


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over masked rows with optional cross-device stat sync.

    Two call modes sharing one parameter/variable tree:
      y = bn(x, mask, train)            — classic: stats from x, returns
                                          the normalized array
      a, b = bn(None, mask, train,      — coefficient mode for the
                moments=(tot, tot_sq,     BN-chained fused kernels: stats
                count))                   come from externally-accumulated
                                          moments (ops/fused_layer.py
                                          epilogue sums); returns the fp32
                                          affine pair so y = x*a + b.
    The coefficient mode runs the identical stat/running-update flow, so
    DP psums and torch running-stat semantics are preserved."""

    momentum: float = 0.1
    eps: float = 1e-5
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, mask, train: bool, moments=None):
        d = x.shape[-1] if x is not None else moments[0].shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(d, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(d, jnp.float32))

        if train:
            if moments is None:
                m = mask.astype(jnp.float32)[:, None]
                count = m.sum()
                total = (x.astype(jnp.float32) * m).sum(axis=0)
                total_sq = ((x.astype(jnp.float32) ** 2) * m).sum(axis=0)
            else:
                total, total_sq, count = moments
            if self.axis_name is not None:
                count = jax.lax.psum(count, self.axis_name)
                total = jax.lax.psum(total, self.axis_name)
                total_sq = jax.lax.psum(total_sq, self.axis_name)
            count = jnp.maximum(count, 1.0)
            mean = total / count
            var = jnp.maximum(total_sq / count - mean ** 2, 0.0)
            if not self.is_initializing():
                # torch stores the unbiased variance in running stats.
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                mom = self.momentum
                ra_mean.value = (1 - mom) * ra_mean.value + mom * mean
                ra_var.value = (1 - mom) * ra_var.value + mom * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.eps)
        if x is None:
            a = inv * scale
            return a, bias - mean * a
        y = (x - mean.astype(x.dtype)) * (inv.astype(x.dtype) * scale) + bias
        return jnp.where(mask[:, None], y, 0)


class _LinParams(nn.Module):
    """Declares nn.Dense-identical params ({kernel, bias} with torch init)
    without applying them — the fused-kernel path consumes the raw arrays
    while keeping the parameter tree byte-compatible with the Dense path."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", torch_linear_kernel,
                       (self.in_features, self.out_features))
        b = self.param("bias", torch_linear_bias(self.in_features),
                       (self.out_features,))
        return k, b


class GINEConv(nn.Module):
    """GINE convolution (no epsilon) over the ELL view.

    edge_emb = Emb(bond_type)[d] + Emb(bond_dir)[d]; the self-loop lives in
    ELL slot 0 with bond type 4 so no per-layer edge-set surgery is needed
    (the reference rebuilds self-loop tensors every layer,
    ginet_molclr.py:31-37).

    fused=True runs the whole layer (aggregation + edge-embedding counts +
    update MLP) as one Pallas kernel per 256-node tile (ops/fused_layer.py);
    requires the tile-dense path (adj) plus the per-view count matrix cnt
    precomputed by the trunk. Parameter tree is identical either way."""

    emb_dim: int
    fused: bool = False

    @nn.compact
    def __call__(self, h, batch, aug_nbr_mask=None, adj=None, cnt=None,
                 bn_in=None):
        e1 = self.param("edge_embedding1", xavier_uniform_embed,
                        (NUM_BOND_TYPES, self.emb_dim))
        e2 = self.param("edge_embedding2", xavier_uniform_embed,
                        (NUM_BOND_DIRS, self.emb_dim))
        if self.fused:
            assert adj is not None and cnt is not None, \
                "fused GINEConv needs the tile-dense adj + trunk cnt"
            from molclr_tpu.ops.fused_layer import (
                fused_gine_bn_layer,
                fused_gine_layer,
                pack_etab,
            )
            d = self.emb_dim
            w1, b1 = _LinParams(d, 2 * d, name="mlp_0")()
            w2, b2 = _LinParams(2 * d, d, name="mlp_1")()
            etab = pack_etab(e1, e2, h.dtype)
            # interpreter mode off-TPU so the CPU test mesh runs the same
            # model code the TPU compiles (static at trace time)
            interpret = jax.default_backend() != "tpu"
            if bn_in is not None:
                # BN-chained mode: the previous BatchNorm's affine (+relu)
                # is this kernel's prologue; returns (out, moment sums)
                a, b, relu_in = bn_in
                return fused_gine_bn_layer(
                    h, a, b, adj, cnt.astype(h.dtype), etab,
                    w1.astype(h.dtype), b1, w2.astype(h.dtype), b2,
                    relu_in, interpret)
            return fused_gine_layer(
                h, adj, cnt.astype(h.dtype), etab,
                w1.astype(h.dtype), b1, w2.astype(h.dtype), b2,
                interpret)
        nbr_mask = batch.nbr_mask if aug_nbr_mask is None else aug_nbr_mask
        if adj is not None:
            # tile-dense path: block-diagonal adjacency matmul on the MXU
            # (A precomputed once per view by the trunk, ops/tile_dense.py).
            # adj was built from batch.nbr_mask, so a different
            # aug_nbr_mask would silently disagree with it:
            assert aug_nbr_mask is None, \
                "adj is precomputed from batch.nbr_mask; bake augmentation" \
                " into the batch (batch.replace(nbr_mask=...)) instead"
            agg = gine_tile_aggregate(
                h, e1.astype(h.dtype), e2.astype(h.dtype), adj,
                batch.nbr_bond_type, batch.nbr_bond_dir, nbr_mask)
        else:
            agg = gine_aggregate(h, e1.astype(h.dtype), e2.astype(h.dtype),
                                 batch.nbr, batch.nbr_bond_type,
                                 batch.nbr_bond_dir, nbr_mask)
        d = self.emb_dim
        cd = h.dtype if h.dtype != jnp.float32 else None
        out = dense(2 * d, name="mlp_0", in_features=d, dtype=cd)(agg)
        out = nn.relu(out)
        out = dense(d, name="mlp_1", in_features=2 * d, dtype=cd)(out)
        return out


class GCNConv(nn.Module):
    """GCN convolution with scalar edge embeddings over the ELL view.

    Default normalize=False reproduces the reference's discarded gcn_norm
    (quirk Q2); normalize=True applies the intended symmetric normalization
    computed from the (masked) degree including self-loops.

    fused=True (tile only) runs the A @ (x @ W) GEMM chain as one Pallas
    kernel per tile (ops/fused_gcn.py); the scalar edge term and bias stay
    in XLA (elementwise, fused into the following BatchNorm). Parameter
    tree is identical either way."""

    emb_dim: int
    normalize: bool = False
    fused: bool = False

    @nn.compact
    def __call__(self, h, batch, aug_nbr_mask=None, adj=None, cnt=None,
                 bn_in=None):
        d = self.emb_dim
        e1 = self.param("edge_embedding1", xavier_uniform_embed,
                        (NUM_BOND_TYPES, 1))
        e2 = self.param("edge_embedding2", xavier_uniform_embed,
                        (NUM_BOND_DIRS, 1))
        # weight: torch Parameter(emb,emb) with uniform +-sqrt(6/(2*emb))
        # (ref gcn_molclr.py:55-60); stored [in, out] like flax kernels.
        bound = (6.0 / (2 * d)) ** 0.5
        weight = self.param(
            "weight",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (d, d),
        )
        bias = self.param("bias", nn.initializers.zeros, (d,))

        if bn_in is not None:
            # BN-chained fused mode: the previous BatchNorm's affine (+relu)
            # is this kernel's prologue; adj must already carry the
            # normalization weights and cnt the norm-weighted counts
            # (both built once by the trunk). Returns (out, moment sums).
            assert self.fused and adj is not None and cnt is not None, \
                "bn_in needs fused=True plus the trunk's adj + cnt"
            from molclr_tpu.ops.fused_gcn import (
                fused_gcn_bn_layer,
                pack_gcn_etab,
            )
            a, b, relu_in = bn_in
            return fused_gcn_bn_layer(
                h, a, b, adj, cnt.astype(h.dtype),
                pack_gcn_etab(e1, e2, d, h.dtype),
                weight.astype(h.dtype), bias.astype(jnp.float32),
                relu_in, jax.default_backend() != "tpu")

        nbr_mask = batch.nbr_mask if aug_nbr_mask is None else aug_nbr_mask
        x = h @ weight.astype(h.dtype)
        norm = None
        if self.normalize:
            deg = nbr_mask.sum(axis=1).astype(h.dtype)  # includes self-loop
            dis = jax.lax.rsqrt(jnp.maximum(deg, 1.0))
            # dis[n] * dis[j] is symmetric in (n, j), so the scatter-free
            # adjoint of gcn_aggregate stays valid
            norm = jnp.take(dis, batch.nbr, axis=0) * dis[:, None]  # [N,K]
        if adj is not None:
            assert aug_nbr_mask is None, \
                "adj is precomputed from batch.nbr_mask; bake augmentation" \
                " into the batch (batch.replace(nbr_mask=...)) instead"
            # tile-dense path; when normalizing, scale adj by the symmetric
            # dis_i * dis_j here (recomputed per layer from the same mask —
            # XLA CSE dedups the identical subexpression across layers), and
            # weight the scalar edge counts by the same norm
            if self.normalize:
                tile = adj.shape[-1]
                dis_b = dis.reshape(-1, tile)
                adj = adj * jax.lax.stop_gradient(
                    dis_b[:, :, None] * dis_b[:, None, :]).astype(adj.dtype)
            if self.fused:
                from molclr_tpu.ops.fused_gcn import fused_gcn_layer
                from molclr_tpu.ops.tile_dense import gcn_edge_term

                out = fused_gcn_layer(
                    h, adj, weight.astype(h.dtype),
                    jax.default_backend() != "tpu")
                out = out + gcn_edge_term(
                    e1.astype(h.dtype), e2.astype(h.dtype),
                    batch.nbr_bond_type, batch.nbr_bond_dir, nbr_mask,
                    norm, h.dtype)
            else:
                out = gcn_tile_aggregate(x, e1.astype(h.dtype),
                                         e2.astype(h.dtype), adj,
                                         batch.nbr_bond_type,
                                         batch.nbr_bond_dir, nbr_mask, norm)
        else:
            out = gcn_aggregate(x, e1.astype(h.dtype), e2.astype(h.dtype),
                                batch.nbr, batch.nbr_bond_type,
                                batch.nbr_bond_dir, nbr_mask, norm)
        return out + bias.astype(h.dtype)
