"""Data layer: featurization, padded graph batches, augmentations, splits,
task registry, synthetic corpora."""

from molclr_tpu.data.featurize import (
    MolGraph,
    featurize_mol,
    featurize_smiles,
    NUM_ATOM_TYPES,
    NUM_CHIRALITY,
    NUM_BOND_TYPES,
    NUM_BOND_DIRS,
    MASK_ATOM_TYPE,
    SELF_LOOP_BOND_TYPE,
)
from molclr_tpu.data.graphs import GraphBatch, PadSpec, pack_batch

__all__ = [
    "MolGraph", "featurize_mol", "featurize_smiles",
    "NUM_ATOM_TYPES", "NUM_CHIRALITY", "NUM_BOND_TYPES", "NUM_BOND_DIRS",
    "MASK_ATOM_TYPE", "SELF_LOOP_BOND_TYPE",
    "GraphBatch", "PadSpec", "pack_batch",
]
