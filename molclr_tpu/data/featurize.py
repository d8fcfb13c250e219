"""Molecular graph featurization with reference-table parity.

Reproduces the featurization contract of the reference datasets
(dataset/dataset.py:26-43,61-109, identical tables in dataset_subgraph.py,
dataset_mix.py, dataset_test.py, dataset_clique.py):

  - atom type index  = atomic number - 1, over range(1,119); the contrastive
    mask token is index 118 (dataset/dataset.py:123).
  - chirality index  over [UNSPECIFIED, CW, CCW, OTHER]; the reference's
    embedding is sized 3 so OTHER would crash (SURVEY quirk Q1) — here OTHER
    is mapped to UNSPECIFIED and the divergence documented.
  - each bond is emitted in both directions consecutively (2k, 2k+1) with
    edge features [bond_type(0-3), bond_dir(0-2)] (dataset/dataset.py:93-106).
  - self-loops use synthetic bond type 4, dir 0, added by the model layers in
    the reference (models/ginet_molclr.py:31-37); here they live in slot 0 of
    the packed ELL adjacency built by data/graphs.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from molclr_tpu.chem.mol import Chirality, Mol
from molclr_tpu.chem.smiles import parse_smiles

NUM_ATOM_TYPES = 119      # ref models/ginet_molclr.py:9 (118 elements + mask)
NUM_CHIRALITY = 3         # ref models/ginet_molclr.py:10
NUM_BOND_TYPES = 5        # ref models/ginet_molclr.py:12 (4 + self-loop)
NUM_BOND_DIRS = 3         # ref models/ginet_molclr.py:13
MASK_ATOM_TYPE = 118      # ref dataset/dataset.py:123 (len(ATOM_LIST))
SELF_LOOP_BOND_TYPE = 4   # ref models/ginet_molclr.py:35


@dataclass
class MolGraph:
    """One featurized molecule (numpy, host-side).

    Directed edges: bond k occupies rows 2k (a1->a2) and 2k+1 (a2->a1), so
    edge row parity recovers the undirected bond id — the invariant the
    reference's bond-deletion augmentation relies on (dataset/dataset.py:118).
    """

    atom_type: np.ndarray   # int32 [N]
    chirality: np.ndarray   # int32 [N]
    edge_src: np.ndarray    # int32 [2M]
    edge_dst: np.ndarray    # int32 [2M]
    bond_type: np.ndarray   # int32 [2M]
    bond_dir: np.ndarray    # int32 [2M]

    @property
    def n_atoms(self) -> int:
        return int(self.atom_type.shape[0])

    @property
    def n_bonds(self) -> int:
        return int(self.edge_src.shape[0]) // 2

    @property
    def max_degree(self) -> int:
        if self.edge_dst.size == 0:
            return 0
        return int(np.bincount(self.edge_dst, minlength=self.n_atoms).max())


def featurize_mol(mol: Mol) -> MolGraph:
    n = mol.num_atoms
    atom_type = np.empty(n, dtype=np.int32)
    chirality = np.empty(n, dtype=np.int32)
    for i, a in enumerate(mol.atoms):
        atom_type[i] = a.atomic_num - 1
        c = int(a.chirality)
        # Q1 fix: CHI_OTHER (3) would index out of the size-3 embedding in the
        # reference; clamp to UNSPECIFIED.
        chirality[i] = c if c < NUM_CHIRALITY else int(Chirality.UNSPECIFIED)

    m = mol.num_bonds
    edge_src = np.empty(2 * m, dtype=np.int32)
    edge_dst = np.empty(2 * m, dtype=np.int32)
    bond_type = np.empty(2 * m, dtype=np.int32)
    bond_dir = np.empty(2 * m, dtype=np.int32)
    for k, b in enumerate(mol.bonds):
        edge_src[2 * k], edge_dst[2 * k] = b.a1, b.a2
        edge_src[2 * k + 1], edge_dst[2 * k + 1] = b.a2, b.a1
        bt = int(b.bond_type)
        bd = int(b.bond_dir)
        bond_type[2 * k] = bond_type[2 * k + 1] = bt
        bond_dir[2 * k] = bond_dir[2 * k + 1] = bd
    return MolGraph(atom_type, chirality, edge_src, edge_dst, bond_type, bond_dir)


def featurize_smiles(smiles: str, add_hs: bool = False) -> MolGraph | None:
    """SMILES -> MolGraph; None for unparseable input (the reference drops
    such rows, dataset/dataset_test.py:103). add_hs mirrors Chem.AddHs for
    the 'mix' augmentation and fine-tune datasets (dataset_mix.py:88,
    dataset_test.py:127)."""
    mol = parse_smiles(smiles, strict=False)
    if mol is None or mol.num_atoms == 0:
        return None
    if add_hs:
        mol = mol.add_hs()
    return featurize_mol(mol)
