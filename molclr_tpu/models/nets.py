"""Encoder trunks and task heads.

Shapes/semantics pinned to the reference:
  trunk    h = Emb_type(x0) + Emb_chir(x1); num_layer x [conv -> BN ->
           dropout(relu) (no relu on last)]; pool; feat_lin
           (ginet_molclr.py:98-114, gcn_molclr.py:139-155)
  MolCLR   projection head 512 -> 512 -> relu -> 256, returns (h, z)
           (ginet_molclr.py:92-96,117)
  FineTune pred head 512 -> 256 -> act [xN] -> out_dim, out_dim 2/1
           (ginet_finetune.py:96-127)
  Motif    motif_embedding(num_motifs, 512); GlobalAttention pool with
           gate = Linear(512, 1) over each molecule's motifs + its own
           pooled feature; motif_lin; pred head on cat(h, hp) [1024]
           (ginet_finetune_mp.py:79,104-107,141-165)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from molclr_tpu.data.featurize import NUM_ATOM_TYPES, NUM_CHIRALITY
from molclr_tpu.models.layers import (
    GCNConv,
    GINEConv,
    MaskedBatchNorm,
    dense,
    xavier_uniform_embed,
)
from molclr_tpu.data.featurize import NUM_BOND_DIRS, NUM_BOND_TYPES
from molclr_tpu.ops.fused_layer import pack_cnt
from molclr_tpu.ops.scatter_free import _counts, embed_lookup
from molclr_tpu.ops.segment import graph_pool
from molclr_tpu.ops.tile_dense import build_tile_adjacency


def resolve_fused(fused: bool | None, gnn_type: str, tile: int) -> bool:
    """Resolve ModelConfig.fused: None = auto (fused Pallas layers on a
    real TPU when the model shape supports them — gin/gcn + tile-dense;
    the interpreter-mode fallback used off-TPU is for parity, not speed)."""
    if fused is None:
        import jax

        return (gnn_type in ("gin", "gcn") and tile > 0
                and jax.default_backend() == "tpu")
    return bool(fused)


class GNNTrunk(nn.Module):
    """Shared encoder trunk producing node embeddings [N, emb_dim].

    tile > 0 selects the tile-dense aggregation path (ops/tile_dense.py):
    the block-diagonal adjacency is built ONCE here from the (augmented)
    masked ELL view and shared by every conv layer and by the backward pass.
    Requires the batch to be packed with PadSpec(tile=tile).

    fused=True (gin + tile only) additionally runs each conv layer as one
    Pallas kernel per tile (ops/fused_layer.py): the per-view edge count
    matrix is built once here and every layer's aggregation + MLP chain
    stays in VMEM instead of round-tripping [N, D] / [N, 2D] intermediates
    through HBM."""

    num_layers: int = 5
    emb_dim: int = 300
    gnn_type: str = "gin"           # 'gin' | 'gcn'
    drop_ratio: float = 0.0
    bn_axis_name: str | None = None
    normalize_gcn: bool = False     # True fixes quirk Q2
    dtype: jnp.dtype = jnp.float32
    tile: int = 0
    fused: bool = False

    @nn.compact
    def __call__(self, batch, train: bool = False):
        emb1 = self.param("x_embedding1", xavier_uniform_embed,
                          (NUM_ATOM_TYPES, self.emb_dim))
        emb2 = self.param("x_embedding2", xavier_uniform_embed,
                          (NUM_CHIRALITY, self.emb_dim))
        h = (embed_lookup(emb1, batch.atom_type)
             + embed_lookup(emb2, batch.chirality)).astype(self.dtype)
        h = jnp.where(batch.node_mask[:, None], h, 0)

        adj = None
        if self.tile:
            adj = build_tile_adjacency(batch.nbr, batch.nbr_mask, self.tile,
                                       dtype=self.dtype)
        cnt = None
        if self.fused:
            assert self.tile and self.gnn_type in ("gin", "gcn"), \
                "fused layers require gnn_type in ('gin','gcn') and tile > 0"
            if self.gnn_type == "gin":
                w = batch.nbr_mask.astype(self.dtype)
                cnt = pack_cnt(
                    _counts(batch.nbr_bond_type, w, NUM_BOND_TYPES),
                    _counts(batch.nbr_bond_dir, w, NUM_BOND_DIRS))

        if self.fused and self.drop_ratio == 0.0:
            # BN-CHAINED fused path: each kernel applies the previous
            # BatchNorm's affine+relu as its prologue and accumulates its
            # own output moments (ops/fused_layer.fused_gine_bn_layer /
            # ops/fused_gcn.fused_gcn_bn_layer), so the [N, D] normalize
            # pass between conv layers never touches HBM. Gated on
            # drop_ratio == 0 (a dropout between BN and the next conv would
            # need mask bits in the prologue); fine-tuning (drop 0.3) takes
            # the per-layer fused path below.
            if self.gnn_type == "gcn":
                # bake the (optional) symmetric normalization into the
                # shared adjacency and the edge-count matrix ONCE
                w = batch.nbr_mask.astype(self.dtype)
                if self.normalize_gcn:
                    deg = batch.nbr_mask.sum(axis=1).astype(self.dtype)
                    dis = jax.lax.rsqrt(jnp.maximum(deg, 1.0))
                    norm = jnp.take(dis, batch.nbr, axis=0) * dis[:, None]
                    dis_b = dis.reshape(-1, self.tile)
                    adj = adj * jax.lax.stop_gradient(
                        dis_b[:, :, None] * dis_b[:, None, :]
                    ).astype(adj.dtype)
                    w = w * norm.astype(self.dtype)
                cnt = pack_cnt(
                    _counts(batch.nbr_bond_type, w, NUM_BOND_TYPES),
                    _counts(batch.nbr_bond_dir, w, NUM_BOND_DIRS))
            count = batch.node_mask.astype(jnp.float32).sum()
            d = self.emb_dim
            a = jnp.ones((d,), jnp.float32)
            b = jnp.zeros((d,), jnp.float32)
            relu_in = False
            for layer in range(self.num_layers):
                if self.gnn_type == "gin":
                    out, sums = GINEConv(
                        self.emb_dim, fused=True, name=f"conv_{layer}")(
                            h, batch, adj=adj, cnt=cnt,
                            bn_in=(a, b, relu_in))
                else:
                    out, sums = GCNConv(
                        self.emb_dim, normalize=self.normalize_gcn,
                        fused=True, name=f"conv_{layer}")(
                            h, batch, adj=adj, cnt=cnt,
                            bn_in=(a, b, relu_in))
                a, b = MaskedBatchNorm(
                    axis_name=self.bn_axis_name, name=f"bn_{layer}")(
                        None, batch.node_mask, train,
                        moments=(sums[0], sums[1], count))
                if layer == self.num_layers - 1:
                    y = out * a.astype(self.dtype) + b.astype(self.dtype)
                    h = jnp.where(batch.node_mask[:, None], y, 0)
                else:
                    h, relu_in = out, True
            return h

        for layer in range(self.num_layers):
            if self.gnn_type == "gin":
                h = GINEConv(self.emb_dim, fused=self.fused,
                             name=f"conv_{layer}")(h, batch, adj=adj,
                                                   cnt=cnt)
            elif self.gnn_type == "gcn":
                h = GCNConv(self.emb_dim, normalize=self.normalize_gcn,
                            fused=self.fused,
                            name=f"conv_{layer}")(h, batch, adj=adj)
            else:
                raise ValueError(f"unknown gnn_type {self.gnn_type!r}")
            h = MaskedBatchNorm(axis_name=self.bn_axis_name,
                                name=f"bn_{layer}")(h, batch.node_mask, train)
            if layer != self.num_layers - 1:
                h = nn.relu(h)
            h = nn.Dropout(self.drop_ratio, deterministic=not train)(h)
        return h


class MolCLRNet(nn.Module):
    """Pretraining network: trunk + pool + feat_lin + projection head."""

    num_layers: int = 5
    emb_dim: int = 300
    feat_dim: int = 512
    gnn_type: str = "gin"
    pool: str = "mean"
    drop_ratio: float = 0.0
    bn_axis_name: str | None = None
    normalize_gcn: bool = False
    dtype: jnp.dtype = jnp.float32
    tile: int = 0
    fused: bool = False

    @nn.compact
    def __call__(self, batch, train: bool = False):
        h = GNNTrunk(self.num_layers, self.emb_dim, self.gnn_type,
                     self.drop_ratio, self.bn_axis_name, self.normalize_gcn,
                     self.dtype, tile=self.tile, fused=self.fused,
                     name="trunk")(batch, train)
        hg = graph_pool(h, batch.node_graph, batch.node_mask,
                        batch.num_graphs, batch.graph_n_nodes, self.pool)
        cd = self.dtype if self.dtype != jnp.float32 else None
        hg = dense(self.feat_dim, name="feat_lin",
                   in_features=self.emb_dim, dtype=cd)(hg)
        z = dense(self.feat_dim, name="out_lin_0",
                  in_features=self.feat_dim, dtype=cd)(hg)
        z = nn.relu(z)
        z = dense(self.feat_dim // 2, name="out_lin_1",
                  in_features=self.feat_dim, dtype=cd)(z)
        return hg, z


def _pred_head(h, feat_in: int, feat_dim: int, out_dim: int,
               pred_n_layer: int, pred_act: str, dtype=None):
    act = {"softplus": nn.softplus, "relu": nn.relu}[pred_act]
    half = feat_dim // 2
    h = dense(half, name="pred_0", in_features=feat_in, dtype=dtype)(h)
    h = act(h)
    for i in range(1, max(1, pred_n_layer)):
        h = dense(half, name=f"pred_{i}", in_features=half, dtype=dtype)(h)
        h = act(h)
    return dense(out_dim, name="pred_out", in_features=half, dtype=dtype)(h)


class FineTuneNet(nn.Module):
    """Fine-tune network: trunk + pool + feat_lin + prediction head."""

    task: str = "classification"    # out_dim 2 (logits) | 'regression' -> 1
    num_layers: int = 5
    emb_dim: int = 300
    feat_dim: int = 512
    gnn_type: str = "gin"
    pool: str = "mean"
    drop_ratio: float = 0.0
    pred_n_layer: int = 2
    pred_act: str = "softplus"
    bn_axis_name: str | None = None
    normalize_gcn: bool = False
    dtype: jnp.dtype = jnp.float32
    tile: int = 0
    fused: bool = False

    @nn.compact
    def __call__(self, batch, train: bool = False):
        h = GNNTrunk(self.num_layers, self.emb_dim, self.gnn_type,
                     self.drop_ratio, self.bn_axis_name, self.normalize_gcn,
                     self.dtype, tile=self.tile, fused=self.fused,
                     name="trunk")(batch, train)
        hg = graph_pool(h, batch.node_graph, batch.node_mask,
                        batch.num_graphs, batch.graph_n_nodes, self.pool)
        cd = self.dtype if self.dtype != jnp.float32 else None
        hg = dense(self.feat_dim, name="feat_lin",
                   in_features=self.emb_dim, dtype=cd)(hg)
        out_dim = 2 if self.task == "classification" else 1
        pred = _pred_head(hg, self.feat_dim, self.feat_dim, out_dim,
                          self.pred_n_layer, self.pred_act, dtype=cd)
        return hg, pred


class LinkFineTuneNet(nn.Module):
    """Label-embedding ("link") fine-tune variant (ref
    models/ginet_finetune_link.py:52-162 — shipped but unused in the
    reference, quirk Q12; provided here for inventory parity).

    Scores both label hypotheses: for each molecule, the pooled feature is
    concatenated with label_lin(label_embedding[y]) for y in {0, 1} and each
    pair runs through the shared pred head; output [G, 2] logits."""

    num_layers: int = 5
    emb_dim: int = 300
    feat_dim: int = 512
    gnn_type: str = "gin"
    pool: str = "mean"
    drop_ratio: float = 0.0
    pred_n_layer: int = 2
    pred_act: str = "softplus"
    bn_axis_name: str | None = None
    normalize_gcn: bool = False
    dtype: jnp.dtype = jnp.float32
    tile: int = 0
    fused: bool = False

    @nn.compact
    def __call__(self, batch, train: bool = False):
        h = GNNTrunk(self.num_layers, self.emb_dim, self.gnn_type,
                     self.drop_ratio, self.bn_axis_name, self.normalize_gcn,
                     self.dtype, tile=self.tile, fused=self.fused,
                     name="trunk")(batch, train)
        hg = graph_pool(h, batch.node_graph, batch.node_mask,
                        batch.num_graphs, batch.graph_n_nodes, self.pool)
        cd = self.dtype if self.dtype != jnp.float32 else None
        hg = dense(self.feat_dim, name="feat_lin",
                   in_features=self.emb_dim, dtype=cd)(hg)

        label_table = self.param("label_embedding",
                                 nn.initializers.normal(1.0),
                                 (2, self.feat_dim))
        lab = nn.Dense(self.feat_dim, name="label_lin",
                       kernel_init=nn.initializers.xavier_uniform())(
            label_table)                                    # [2, F]
        # shared head modules applied to both hypotheses (the reference
        # calls the same pred_head twice)
        act = {"softplus": nn.softplus, "relu": nn.relu}[self.pred_act]
        half = self.feat_dim // 2
        head = [dense(half, name="pred_0", in_features=2 * self.feat_dim)]
        for i in range(1, max(1, self.pred_n_layer)):
            head.append(dense(half, name=f"pred_{i}", in_features=half))
        out_lin = dense(1, name="pred_out", in_features=half)

        g = hg.shape[0]
        scores = []
        for y in range(2):
            z = jnp.concatenate(
                [hg, jnp.broadcast_to(lab[y], (g, self.feat_dim))], axis=-1)
            for layer in head:
                z = act(layer(z))
            scores.append(out_lin(z))
        return hg, jnp.concatenate(scores, axis=-1)         # [G, 2]


class MotifFineTuneNet(nn.Module):
    """Fine-tune network with the fork's motif message-passing head.

    Extra inputs: motif_ids [G, C] (indices into the motif vocabulary) and
    motif_mask [G, C]. Each molecule's attention segment is its C motif
    embeddings plus its own pooled feature (the row the reference appends at
    finetune.py:208), pooled with softmax(gate) weights
    (PyG GlobalAttention semantics, ginet_finetune_mp.py:107,158-161)."""

    num_motifs: int = 1
    task: str = "classification"
    num_layers: int = 5
    emb_dim: int = 300
    feat_dim: int = 512
    gnn_type: str = "gin"
    pool: str = "mean"
    drop_ratio: float = 0.0
    pred_n_layer: int = 2
    pred_act: str = "softplus"
    bn_axis_name: str | None = None
    normalize_gcn: bool = False
    dtype: jnp.dtype = jnp.float32
    tile: int = 0
    fused: bool = False

    @nn.compact
    def __call__(self, batch, motif_ids, motif_mask, train: bool = False):
        h = GNNTrunk(self.num_layers, self.emb_dim, self.gnn_type,
                     self.drop_ratio, self.bn_axis_name, self.normalize_gcn,
                     self.dtype, tile=self.tile, fused=self.fused,
                     name="trunk")(batch, train)
        hg = graph_pool(h, batch.node_graph, batch.node_mask,
                        batch.num_graphs, batch.graph_n_nodes, self.pool)
        cd = self.dtype if self.dtype != jnp.float32 else None
        hg = dense(self.feat_dim, name="feat_lin",
                   in_features=self.emb_dim, dtype=cd)(hg)

        # torch nn.Embedding default init is N(0,1); normally overwritten by
        # init_motif_emb with encoder features of the clique fragments.
        motif_table = self.param("motif_embedding",
                                 nn.initializers.normal(1.0),
                                 (self.num_motifs, self.feat_dim))
        me = embed_lookup(motif_table, motif_ids)           # [G, C, F]
        slots = jnp.concatenate([me, hg[:, None, :]], axis=1)  # [G, C+1, F]
        slot_mask = jnp.concatenate(
            [motif_mask, batch.graph_mask[:, None]], axis=1)   # [G, C+1]

        gate = dense(1, name="motif_gate",
                     in_features=self.feat_dim)(slots)[..., 0]  # [G, C+1]
        gate = jnp.where(slot_mask, gate, -1e30)
        alpha = nn.softmax(gate, axis=-1)
        hp = (alpha[..., None] * slots).sum(axis=1)            # [G, F]
        hp = nn.Dense(self.feat_dim, name="motif_lin",
                      kernel_init=nn.initializers.xavier_uniform())(hp)

        cat = jnp.concatenate([hg, hp], axis=-1)               # [G, 2F]
        out_dim = 2 if self.task == "classification" else 1
        pred = _pred_head(cat, 2 * self.feat_dim, self.feat_dim, out_dim,
                          self.pred_n_layer, self.pred_act, dtype=cd)
        return cat, pred
