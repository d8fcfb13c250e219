"""Hückel aromaticity perception (chem/aromatic.py): Kekulé and aromatic
spellings of the same molecule must featurize and canonicalize identically,
as RDKit's sanitization guarantees for the reference (dataset/dataset.py:62).
Also pins Python<->native featurizer parity on Kekulé inputs."""

import numpy as np
import pytest

from molclr_tpu.chem import canonical_smiles, parse_smiles
from molclr_tpu.chem.mol import BondType, mol_formula

EQUIVALENT = [
    ("benzene", "C1=CC=CC=C1", "c1ccccc1"),
    ("pyridine", "C1=CC=NC=C1", "c1ccncc1"),
    ("toluene", "CC1=CC=CC=C1", "Cc1ccccc1"),
    ("pyrrole", "C1=CC=CN1", "c1cc[nH]c1"),
    ("imidazole", "C1=CN=CN1", "c1cnc[nH]1"),
    ("furan", "C1=CC=CO1", "c1ccoc1"),
    ("thiophene", "C1=CC=CS1", "c1ccsc1"),
    ("naphthalene", "C1=CC2=CC=CC=C2C=C1", "c1ccc2ccccc2c1"),
    ("indole", "C1=CC2=C(C=C1)NC=C2", "c1ccc2[nH]ccc2c1"),
    ("caffeine", "CN1C(=O)N(C)c2ncn(C)c2C1=O",
     "Cn1cnc2c1c(=O)n(C)c(=O)n2C"),
    ("2-pyridone", "O=C1C=CC=CN1", "O=c1cccc[nH]1"),
    # fused-envelope Hückel cases (ring-by-ring fails; the UNION is 4n+2 —
    # perceived by _fused_envelope_pass, mirroring RDKit sanitization)
    ("azulene", "C1=CC2=CC=CC=CC2=C1", "c1ccc2cccc2cc1"),
    ("indolizine", "C1=CC2=CC=CN2C=C1", "c1ccn2cccc2c1"),
    ("biphenylene", "C1=CC2=C(C=C1)C1=CC=CC=C1-2",
     "c1ccc2-c3ccccc3-c2c1"),
    # 4n+2 macrocycles (RDKit aromatizes these; cap MAX_AROMATIC_RING=64)
    ("[14]annulene", "C1=C" + "C=C" * 6 + "1", "c1" + "c" * 13 + "1"),
    ("[18]annulene", "C1=C" + "C=C" * 8 + "1", "c1" + "c" * 17 + "1"),
    ("[22]annulene", "C1=C" + "C=C" * 10 + "1", "c1" + "c" * 21 + "1"),
]

NON_AROMATIC = [
    ("cyclohexane", "C1CCCCC1"),
    ("cyclohexene", "C1=CCCCC1"),
    ("cyclobutadiene", "C1=CC=C1"),          # 4 pi e
    ("cyclooctatetraene", "C1=CC=CC=CC=C1"),  # 8 pi e
    ("fulvene", "C=C1C=CC=C1"),               # exocyclic C=C
    ("cyclopentadiene", "C1=CC=CC1"),          # sp3 CH2 breaks the ring
    ("pentalene", "C1=CC2=CC=CC2=C1"),         # union 8 pi e, stays Kekulé
    ("[16]annulene", "C1=C" + "C=C" * 7 + "1"),   # 16 pi e = 4n
    ("[20]annulene", "C1=C" + "C=C" * 9 + "1"),   # 20 pi e = 4n
]


def test_fused_envelope_all_atoms_aromatic():
    """Azulene and indolizine from Kekulé spellings: EVERY ring atom ends
    aromatic (the union pass covers both rings)."""
    for smi, n_atoms in [("C1=CC2=CC=CC=CC2=C1", 10),
                         ("C1=CC2=CC=CN2C=C1", 9)]:
        mol = parse_smiles(smi)
        assert len(mol.atoms) == n_atoms
        assert all(a.is_aromatic for a in mol.atoms), smi
        assert all(b.bond_type == BondType.AROMATIC for b in mol.bonds), smi


def test_biphenylene_bridge_bonds_stay_single():
    """Biphenylene's benzene rings aromatize but the 4-ring's two
    connecting bonds stay SINGLE (the union count is 8 or 12, never
    4n+2) — matching RDKit."""
    mol = parse_smiles("C1=CC2=C(C=C1)C1=CC=CC=C1-2")
    singles = [b for b in mol.bonds if b.bond_type == BondType.SINGLE]
    aroms = [b for b in mol.bonds if b.bond_type == BondType.AROMATIC]
    assert len(singles) == 2
    assert len(aroms) == 12
    assert all(a.is_aromatic for a in mol.atoms)


@pytest.mark.parametrize("name,kekule,aromatic", EQUIVALENT)
def test_kekule_equals_aromatic_spelling(name, kekule, aromatic):
    ck = canonical_smiles(parse_smiles(kekule))
    ca = canonical_smiles(parse_smiles(aromatic))
    assert ck == ca, name
    # round-trip invariance of the canonical form itself
    assert canonical_smiles(parse_smiles(ck)) == ck, name


@pytest.mark.parametrize("name,kekule,aromatic", EQUIVALENT)
def test_hydrogen_counts_preserved(name, kekule, aromatic):
    assert mol_formula(parse_smiles(kekule)) == \
        mol_formula(parse_smiles(aromatic)), name


@pytest.mark.parametrize("name,smiles", NON_AROMATIC)
def test_non_aromatic_rings_stay_kekule(name, smiles):
    mol = parse_smiles(smiles)
    assert not any(a.is_aromatic for a in mol.atoms), name
    assert not any(b.bond_type == BondType.AROMATIC for b in mol.bonds), name


def test_perceived_bond_types_match_rdkit_featurization():
    """Kekulé benzene must featurize with AROMATIC (index 3) ring bonds,
    the values RDKit hands the reference featurizer
    (dataset/dataset.py:96-106)."""
    from molclr_tpu.data.featurize import featurize_smiles

    g = featurize_smiles("C1=CC=CC=C1")
    assert (g.bond_type == 3).all()
    g2 = featurize_smiles("c1ccccc1")
    np.testing.assert_array_equal(g.bond_type, g2.bond_type)
    np.testing.assert_array_equal(g.atom_type, g2.atom_type)


def test_pyrrole_nh_written_bracketed():
    # the frozen H count forces the mandatory [nH] form
    s = canonical_smiles(parse_smiles("C1=CC=CN1"))
    assert "[nH]" in s


def test_native_parity_on_kekule_inputs():
    from molclr_tpu import native

    if not native.native_available():
        pytest.skip("no native featurizer")
    from molclr_tpu.data.featurize import featurize_smiles

    cases = [k for _, k, _ in EQUIVALENT] + [a for _, _, a in EQUIVALENT] \
        + [s for _, s in NON_AROMATIC] \
        + ["O=C1NC(=O)C2=C1C=CC=C2",
           "CC1(C)S[C@@H]2[C@H](NC(=O)Cc3ccccc3)C(=O)N2[C@H]1C(=O)O"]
    for s in cases:
        for add_hs in (False, True):
            py = featurize_smiles(s, add_hs=add_hs)
            out = native.featurize_corpus_native([s], add_hs=add_hs)
            assert out is not None and len(out[0]) == 1, s
            nat = out[0][0]
            for f in ("atom_type", "chirality", "edge_src", "edge_dst",
                      "bond_type", "bond_dir"):
                np.testing.assert_array_equal(
                    getattr(py, f), getattr(nat, f), err_msg=f"{s} {f}")


def test_macrocycle_aromaticity_both_featurizers():
    """4n+2 macrocycles up to MAX_AROMATIC_RING aromatize (like RDKit);
    4n ones and rings beyond the cap stay Kekulé — identically in the
    Python and C++ featurizers."""
    from molclr_tpu import native
    from molclr_tpu.chem.mol import BondType

    def annulene(n):
        return "C1=C" + "C=C" * ((n - 2) // 2) + "1"

    # (ring size, expected aromatic): cap 64 keeps [66]annulene Kekulé
    for n, arom in [(14, True), (18, True), (22, True),
                    (16, False), (20, False), (66, False)]:
        mol = parse_smiles(annulene(n))
        got = all(b.bond_type == BondType.AROMATIC for b in mol.bonds)
        assert got == arom, f"[{n}]annulene aromatic={got}, want {arom}"
        assert all(a.is_aromatic == arom for a in mol.atoms)

    if native.native_available():
        from molclr_tpu.data.featurize import featurize_smiles

        for n in (14, 16, 18, 20, 22, 66):
            s = annulene(n)
            py = featurize_smiles(s)
            out = native.featurize_corpus_native([s])
            assert out is not None and len(out[0]) == 1, s
            np.testing.assert_array_equal(py.bond_type, out[0][0].bond_type,
                                          err_msg=s)


class TestExocyclicCC:
    """Exocyclic C=C to an acyclic carbon contributes 0 pi electrons
    (sp2-capable atom, RDKit semantics) instead of disqualifying the
    ring; fulvene-class rings still fail on the COUNT (4 electrons)."""

    def test_fulvene_stays_kekule_by_count(self):
        mol = parse_smiles("C=C1C=CC=C1")
        assert not any(a.is_aromatic for a in mol.atoms)

    def test_heptafulvene_aromatizes(self):
        # 7-ring: 3 ring doubles (6 e) + exo atom (0 e) = 6 = 4n+2
        mol = parse_smiles("C=C1C=CC=CC=C1")
        ring_atoms = [a for a in mol.atoms[1:]]     # atom 0 is the exo CH2
        assert sum(a.is_aromatic for a in mol.atoms) == 7
        assert all(a.is_aromatic for a in ring_atoms)

    def test_benzofulvene_five_ring_stays_kekule(self):
        # the 5-ring counts 4 (2 fusion contributions + 2 ring-double
        # atoms... exo 0) and must NOT aromatize; the benzo ring must
        mol = parse_smiles("C=C1C=Cc2ccccc21")
        assert sum(a.is_aromatic for a in mol.atoms) == 6

    def test_quinone_methide_stays_kekule(self):
        mol = parse_smiles("O=C1C=CC(=C)C=C1")
        assert not any(a.is_aromatic for a in mol.atoms)

    def test_native_parity_exocyclic_cc(self):
        from molclr_tpu import native
        from molclr_tpu.data.featurize import featurize_smiles as feat_py
        from molclr_tpu.native import featurize_smiles_native as feat_cc

        if not native.native_available():
            import pytest

            pytest.skip("no native featurizer")
        for smi in ("C=C1C=CC=C1", "C=C1C=CC=CC=C1", "C=C1C=Cc2ccccc21",
                    "O=C1C=CC(=C)C=C1", "C=C1C=CC(=C)C=C1"):
            py = feat_py(smi)
            cc = feat_cc(smi)
            assert py is not None and cc is not None, smi
            np.testing.assert_array_equal(py.atom_type, cc.atom_type, smi)
            np.testing.assert_array_equal(py.bond_type, cc.bond_type, smi)
            np.testing.assert_array_equal(py.edge_src, cc.edge_src, smi)
