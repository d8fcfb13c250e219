"""Clean-room chemistry layer (no RDKit dependency).

Provides everything the reference obtains from RDKit:
  - SMILES parsing -> Mol graphs           (ref dataset/dataset.py:62 Chem.MolFromSmiles)
  - implicit-H / valence model             (ref dataset/dataset_mix.py:88 Chem.AddHs)
  - ring perception                        (ref utils/clique.py:38 IsInRing)
  - Murcko scaffolds                       (ref dataset/dataset_test.py:42-46)
  - BRICS-style motif decomposition        (ref utils/clique.py:11-90)
  - canonical SMILES writing               (ref utils/clique.py:133-134)
"""

from molclr_tpu.chem.mol import Atom, Bond, Mol, BondType, Chirality, BondDir
from molclr_tpu.chem.smiles import parse_smiles, SmilesError
from molclr_tpu.chem.canon import canonical_smiles, canonical_ranks
from molclr_tpu.chem.scaffold import murcko_scaffold, murcko_scaffold_smiles
from molclr_tpu.chem.brics import find_brics_bonds, brics_decompose, clique_mol_smiles

__all__ = [
    "Atom", "Bond", "Mol", "BondType", "Chirality", "BondDir",
    "parse_smiles", "SmilesError",
    "canonical_smiles", "canonical_ranks",
    "murcko_scaffold", "murcko_scaffold_smiles",
    "find_brics_bonds", "brics_decompose", "clique_mol_smiles",
]
