"""molclr-tpu: a TPU-native molecular graph contrastive-learning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of MolCLR
(CameronDiao/MolCLR): SimCLR-style contrastive pretraining of GIN/GCN molecular
graph encoders plus MoleculeNet fine-tuning with a BRICS motif attention head.

Subpackages
-----------
chem      Clean-room chemistry: SMILES parser, valence model, ring perception,
          Murcko scaffolds, BRICS-style motif decomposition, canonical SMILES.
          (Replaces the reference's RDKit layer, /root/reference L0.)
data      Featurization (parity with reference dataset/dataset.py:26-109),
          flat-packed padded graph batches with ELL adjacency, augmentations,
          splits, MoleculeNet task registry, synthetic corpora.
ops       TPU aggregation primitives: masked segment ops, ELL gather-aggregate
          (jnp reference path + fused Pallas kernels), segment softmax.
models    GINE / GCN encoders and heads as Flax modules with masked BatchNorm.
losses    NT-Xent contrastive loss (single-device + cross-device all-gather).
train     Optimizers/schedules, pretrain & fine-tune loops, checkpointing
          (Orbax + torch-.pth importer), metrics.
parallel  Mesh setup, data-parallel sharding, edge-partitioned multi-chip
          aggregation via shard_map.
cli       `pretrain` / `finetune` entry points, YAML-compatible configs.
"""

__version__ = "0.1.0"
