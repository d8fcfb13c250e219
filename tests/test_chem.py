"""Tests for the clean-room chemistry layer (SMILES, valence, rings,
scaffolds, BRICS cliques)."""

import pytest

from molclr_tpu.chem import (
    BondDir,
    BondType,
    Chirality,
    brics_decompose,
    canonical_smiles,
    murcko_scaffold_smiles,
    parse_smiles,
)
from molclr_tpu.chem.mol import mol_formula
from molclr_tpu.chem.smiles import SmilesError


class TestParser:
    def test_ethanol(self):
        m = parse_smiles("CCO")
        assert m.num_atoms == 3
        assert m.num_bonds == 2
        assert [a.atomic_num for a in m.atoms] == [6, 6, 8]
        assert m.implicit_hs(0) == 3
        assert m.implicit_hs(1) == 2
        assert m.implicit_hs(2) == 1

    def test_benzene_aromatic(self):
        m = parse_smiles("c1ccccc1")
        assert m.num_atoms == 6
        assert m.num_bonds == 6
        assert all(a.is_aromatic for a in m.atoms)
        assert all(b.bond_type == BondType.AROMATIC for b in m.bonds)
        assert all(m.implicit_hs(i) == 1 for i in range(6))
        assert all(m.ring_atom_flags())

    def test_pyridine_hs(self):
        m = parse_smiles("c1ccncc1")
        n_idx = [i for i, a in enumerate(m.atoms) if a.atomic_num == 7][0]
        assert m.implicit_hs(n_idx) == 0

    def test_bond_orders(self):
        m = parse_smiles("C=C")
        assert m.bonds[0].bond_type == BondType.DOUBLE
        assert m.implicit_hs(0) == 2
        m = parse_smiles("C#N")
        assert m.bonds[0].bond_type == BondType.TRIPLE
        assert m.implicit_hs(0) == 1
        assert m.implicit_hs(1) == 0

    def test_branches(self):
        m = parse_smiles("CC(C)(C)C")  # neopentane
        assert m.num_atoms == 5
        assert sorted(len(m.neighbors(i)) for i in range(5)) == [1, 1, 1, 1, 4]

    def test_charges(self):
        m = parse_smiles("[NH4+]")
        assert m.atoms[0].formal_charge == 1
        assert m.atoms[0].explicit_hs == 4
        m = parse_smiles("[O-]C")
        assert m.atoms[0].formal_charge == -1
        m = parse_smiles("[Fe+2]")
        assert m.atoms[0].formal_charge == 2
        m = parse_smiles("[O--]")
        assert m.atoms[0].formal_charge == -2

    def test_chirality(self):
        m = parse_smiles("C[C@H](N)C(=O)O")  # L-alanine
        assert m.atoms[1].chirality == Chirality.TETRAHEDRAL_CCW
        m = parse_smiles("C[C@@H](N)C(=O)O")
        assert m.atoms[1].chirality == Chirality.TETRAHEDRAL_CW

    def test_bond_dirs(self):
        m = parse_smiles("F/C=C/F")  # trans-difluoroethene
        dirs = [b.bond_dir for b in m.bonds]
        assert dirs.count(BondDir.ENDUPRIGHT) == 2
        m = parse_smiles(r"F/C=C\F")
        dirs = [b.bond_dir for b in m.bonds]
        assert BondDir.ENDUPRIGHT in dirs and BondDir.ENDDOWNRIGHT in dirs

    def test_ring_closures(self):
        m = parse_smiles("C1CC1")  # cyclopropane
        assert m.num_bonds == 3
        m = parse_smiles("C%10CC%10")
        assert m.num_bonds == 3

    def test_fused_rings(self):
        m = parse_smiles("c1ccc2ccccc2c1")  # naphthalene
        assert m.num_atoms == 10
        assert m.num_bonds == 11
        # fusion carbons have no H
        hs = [m.implicit_hs(i) for i in range(10)]
        assert hs.count(0) == 2 and hs.count(1) == 8

    def test_two_char_elements(self):
        m = parse_smiles("ClCCBr")
        assert [a.atomic_num for a in m.atoms] == [17, 6, 6, 35]
        m = parse_smiles("[Na+].[Cl-]")
        assert m.num_atoms == 2 and m.num_bonds == 0

    def test_isotope_and_map(self):
        m = parse_smiles("[13CH4]")
        assert m.atoms[0].isotope == 13
        assert m.atoms[0].explicit_hs == 4
        m = parse_smiles("[CH3:7]O")
        assert m.atoms[0].atom_map == 7

    def test_errors(self):
        for bad in ["C1CC", "C(", "C)", "[C", "", "Cx", "[Xx]"]:
            with pytest.raises(SmilesError):
                parse_smiles(bad)
        assert parse_smiles("C1CC", strict=False) is None

    def test_real_molecules(self):
        # aspirin
        m = parse_smiles("CC(=O)Oc1ccccc1C(=O)O")
        assert m.num_atoms == 13
        assert mol_formula(m) == "C9H8O4"
        # caffeine
        m = parse_smiles("Cn1cnc2c1c(=O)n(C)c(=O)n2C")
        assert m.num_atoms == 14
        assert mol_formula(m) == "C8H10N4O2"
        # ibuprofen
        m = parse_smiles("CC(C)Cc1ccc(cc1)C(C)C(=O)O")
        assert mol_formula(m) == "C13H18O2"

    def test_add_hs(self):
        m = parse_smiles("CO")
        mh = m.add_hs()
        assert mh.num_atoms == 2 + 4 + 0  # CH3 + OH -> wait: 3 + 1 H
        assert sum(1 for a in mh.atoms if a.atomic_num == 1) == 4
        assert mh.num_bonds == 1 + 4

    def test_ring_flags(self):
        m = parse_smiles("C1CC1CC")  # cyclopropane + ethyl tail
        flags = m.ring_atom_flags()
        assert flags == [True, True, True, False, False]
        bond_flags = m.ring_bond_flags()
        assert sum(bond_flags) == 3


class TestCanonical:
    @pytest.mark.parametrize("variants", [
        ["CCO", "OCC", "C(O)C"],
        ["c1ccccc1", "c1ccccc1"],
        ["CC(=O)Oc1ccccc1C(=O)O", "OC(=O)c1ccccc1OC(C)=O"],
        ["CN1C=NC2=C1C(=O)N(C)C(=O)N2C", "CN1C=NC2=C1C(=O)N(C)C(=O)N2C"],
        ["C1CCCCC1", "C2CCCCC2"],
        ["N[C@@H](C)C(=O)O", "C([C@H](N)C)(=O)O"],  # stereo dropped
    ])
    def test_invariance(self, variants):
        keys = {canonical_smiles(parse_smiles(s)) for s in variants}
        assert len(keys) == 1

    def test_roundtrip(self):
        for s in ["CCO", "c1ccccc1", "CC(=O)Oc1ccccc1C(=O)O",
                  "C1CC2CCC1CC2", "O=C(O)CN", "[O-]S(=O)(=O)c1ccccc1",
                  "FC(F)(F)c1ccc(Cl)cc1"]:
            m = parse_smiles(s)
            c1 = canonical_smiles(m)
            m2 = parse_smiles(c1)
            c2 = canonical_smiles(m2)
            assert c1 == c2, f"round-trip failed for {s}: {c1!r} != {c2!r}"
            assert mol_formula(m) == mol_formula(m2)

    def test_distinct_molecules_distinct_keys(self):
        mols = ["CCO", "CCC", "CCN", "c1ccccc1", "C1CCCCC1", "CC(=O)O"]
        keys = {canonical_smiles(parse_smiles(s)) for s in mols}
        assert len(keys) == len(mols)


class TestAromaticSanitize:
    """RDKit-sanitization parity for aromatic-WRITTEN input
    (chem/aromatic.py sanitize_input_aromaticity)."""

    def test_biphenyl_implicit_linker_is_single(self):
        # RDKit types the bond between two aromatic rings SINGLE even
        # when the SMILES omits the '-'; aromatic bonds exist only
        # inside rings
        from molclr_tpu.chem.mol import BondType

        m = parse_smiles("c1ccc(cc1)c1ccccc1")
        nonring = [b.bond_type
                   for b, rf in zip(m.bonds, m.ring_bond_flags())
                   if not rf]
        assert nonring == [BondType.SINGLE]

    def test_biphenyl_spellings_canonicalize_equal(self):
        keys = {canonical_smiles(parse_smiles(s))
                for s in ["c1ccc(cc1)c1ccccc1", "c1ccc(cc1)-c1ccccc1",
                          "C1=CC=C(C=C1)C1=CC=CC=C1"]}
        assert len(keys) == 1

    @pytest.mark.parametrize("bad", [
        "cc",            # aromatic atoms outside any ring
        "cC",
        "c1ccc1",        # 4 pi electrons: RDKit sanitization fails
        "c1cc1",
        "c1ccccccc1",    # 8 pi
        "c1cc1C",
    ])
    def test_invalid_aromatic_rejected(self, bad):
        assert parse_smiles(bad, strict=False) is None
        with pytest.raises(Exception):
            parse_smiles(bad, strict=True)

    @pytest.mark.parametrize("good", [
        "c1ccccc1",
        "c1ccc2ccccc2c1",              # naphthalene (fused: exempt)
        "c1ccc-2c(c1)-c1ccccc1-2",     # biphenylene envelope
        "c1cc2ccc3cccc4ccc(c1)c2c34",  # pyrene
        "[O-]c1ccccc1",                # charged: exempt from the check
        "c1cc[nH]c1",                  # heteroatom: exempt
        "C1=CC=C1",                    # Kekulé cyclobutadiene stays valid
        "Cc1ccccc1c1ccccc1C",
    ])
    def test_valid_aromatic_kept(self, good):
        assert parse_smiles(good, strict=False) is not None


class TestScaffold:
    def test_toluene_to_benzene(self):
        tol = murcko_scaffold_smiles(parse_smiles("Cc1ccccc1"))
        benz = murcko_scaffold_smiles(parse_smiles("c1ccccc1"))
        assert tol == benz != ""

    def test_acyclic_empty(self):
        assert murcko_scaffold_smiles(parse_smiles("CCCCO")) == ""

    def test_linker_kept(self):
        # benzylbenzene: two rings + CH2 linker kept
        m = parse_smiles("c1ccccc1Cc1ccccc1")
        scaf = murcko_scaffold_smiles(m)
        m2 = parse_smiles("c1ccccc1C(CCC)c1ccccc1")  # side chain dropped
        assert murcko_scaffold_smiles(m2) == scaf

    def test_exocyclic_carbonyl_kept(self):
        a = murcko_scaffold_smiles(parse_smiles("O=C1CCCCC1"))
        b = murcko_scaffold_smiles(parse_smiles("C1CCCCC1"))
        assert a != b

    def test_same_scaffold_groups(self):
        group = ["c1ccccc1CC", "c1ccccc1CCC", "c1ccccc1C(C)C"]
        keys = {murcko_scaffold_smiles(parse_smiles(s)) for s in group}
        assert len(keys) == 1


class TestBrics:
    def test_single_atom(self):
        cliques, edges = brics_decompose(parse_smiles("C"))
        assert cliques == [[0]] and edges == []

    def test_no_cut_whole_molecule(self):
        # ethane: no cleavable bonds -> one clique (ref utils/clique.py:24-25)
        cliques, edges = brics_decompose(parse_smiles("CC"))
        assert cliques == [[0, 1]] and edges == []

    def test_amide_cut(self):
        # N-methylacetamide CC(=O)NC: amide bond cleaved
        cliques, edges = brics_decompose(parse_smiles("CC(=O)NC"))
        assert len(cliques) >= 2
        assert len(edges) >= 1
        # every atom appears exactly once
        flat = sorted(a for c in cliques for a in c)
        assert flat == list(range(5))

    def test_ring_junction(self):
        # ethylbenzene: ring-attachment cut separates ring from ethyl
        m = parse_smiles("CCc1ccccc1")
        cliques, edges = brics_decompose(m)
        ring = {i for i, f in enumerate(m.ring_atom_flags()) if f}
        assert any(set(c) == ring for c in cliques)

    def test_partition_property(self):
        for s in ["CC(=O)Oc1ccccc1C(=O)O", "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
                  "Cn1cnc2c1c(=O)n(C)c(=O)n2C",
                  "CC(=O)Nc1ccc(O)cc1", "O=S(=O)(N)c1ccccc1"]:
            m = parse_smiles(s)
            cliques, edges = brics_decompose(m)
            flat = sorted(a for c in cliques for a in c)
            assert flat == list(range(m.num_atoms)), s
            for c1, c2 in edges:
                assert 0 <= c1 < len(cliques) and 0 <= c2 < len(cliques)


class TestBrics16Environments:
    """The exact 16-environment rule table (Degen et al. 2008), validated
    on RDKit's own BRICS example fragmentations (fragment sets from the
    rdkit.Chem.BRICS module doctests, dummies dropped)."""

    @staticmethod
    def frag_keys(smi, rules="brics16"):
        from molclr_tpu.chem.brics import clique_mol_smiles, find_brics_bonds

        m = parse_smiles(smi)
        cut = {frozenset(b) for b in find_brics_bonds(m, rules=rules)}
        adj = m.adjacency()
        comp = [-1] * m.num_atoms
        parts = []
        for i in range(m.num_atoms):
            if comp[i] != -1:
                continue
            comp[i] = len(parts)
            members, stack = [i], [i]
            while stack:
                u = stack.pop()
                for v, _ in adj[u]:
                    if comp[v] == -1 and frozenset((u, v)) not in cut:
                        comp[v] = comp[i]
                        members.append(v)
                        stack.append(v)
            parts.append(members)
        return len(cut), sorted(clique_mol_smiles(m, p) for p in parts)

    def test_rdkit_doctest_molecule(self):
        # BRICSDecompose('CCCOCc1cc(c2ncccc2)ccc1') ->
        # ['[14*]c1ccccn1','[16*]c1cccc([16*])c1','[3*]O[3*]',
        #  '[4*]CCC','[4*]C[8*]'] — 4 cuts, 5 fragments
        n, frags = self.frag_keys("CCCOCc1cc(-c2ncccc2)ccc1")
        assert n == 4
        assert len(frags) == 5
        assert "CCC" in frags and "O" in frags and "C" in frags

    def test_anisole_aryl_ether(self):
        # (3,16): O-aryl cut; the O-CH3 bond survives (CH3 is D1)
        n, frags = self.frag_keys("COc1ccccc1")
        assert n == 1 and "CO" in frags

    def test_amide_1_5(self):
        n, frags = self.frag_keys("CC(=O)NC")
        assert n == 1 and sorted(frags) == ["CC=O", "CN"]

    def test_ester_both_sides(self):
        # ethyl propanoate: (1,3) acyl-O and (3,4) O-alkyl
        n, frags = self.frag_keys("CCOC(=O)CC")
        assert n == 2 and "O" in frags

    def test_ch2ch2_not_cut(self):
        # no (8,8) pair: the ethano bridge survives, both aryl bonds cut
        n, frags = self.frag_keys("c1ccccc1CCc1ncccc1")
        assert n == 2 and "CC" in frags

    def test_olefin_l7(self):
        # stilbene: only the L7=L7 double-bond cut (vinyl C fails L4/L8)
        n, frags = self.frag_keys("c1ccccc1C=Cc1ccccc1")
        assert n == 1 and len(frags) == 2

    def test_lactam_not_cut_at_n(self):
        # 2-piperidinone N is L10 (lactam), excluded from L5; no acyclic
        # single bond qualifies -> no cuts
        n, _ = self.frag_keys("O=C1CCCCN1")
        assert n == 0

    def test_no_cut_molecules(self):
        for s in ["c1ccccc1", "CCO", "C1CCCCC1", "CC", "C=C"]:
            n, _ = self.frag_keys(s)
            assert n == 0, s

    def test_sulfonamide_5_12(self):
        # N-methylmethanesulfonamide CS(=O)(=O)NC: (5,12) cut at S-N
        n, frags = self.frag_keys("CS(=O)(=O)NC")
        assert n == 1 and "CN" in frags

    def test_approx_rules_still_available(self):
        # the round-1 rule set remains selectable for vocab compatibility
        n16, _ = self.frag_keys("CC(=O)NC", rules="brics16")
        napx, _ = self.frag_keys("CC(=O)NC", rules="approx")
        assert n16 == 1 and napx == 1


class TestCorpusFuzz:
    """Corpus-scale robustness: every synthetic-corpus SMILES must parse,
    canonicalize to a fixpoint, keep its formula through the round-trip,
    and keep its perceived aromaticity stable."""

    def test_canonical_fixpoint_and_formula(self):
        from molclr_tpu.chem import canonical_smiles, parse_smiles
        from molclr_tpu.chem.mol import mol_formula
        from molclr_tpu.data.synthetic import synthetic_corpus

        for s in synthetic_corpus(500, seed=99):
            mol = parse_smiles(s, strict=False)
            assert mol is not None, s
            c1 = canonical_smiles(mol)
            mol2 = parse_smiles(c1, strict=False)
            assert mol2 is not None, (s, c1)
            assert canonical_smiles(mol2) == c1, s
            assert mol_formula(mol2) == mol_formula(mol), s
            arom1 = sum(a.is_aromatic for a in mol.atoms)
            arom2 = sum(a.is_aromatic for a in mol2.atoms)
            assert arom1 == arom2, (s, c1)

    def test_mutated_strings_never_crash(self):
        import random as pyrandom

        from molclr_tpu.chem import parse_smiles
        from molclr_tpu.data.synthetic import synthetic_corpus

        rng = pyrandom.Random(3)
        junk = "()[]=#1234cCnNoO@+-/\\%."
        for s in synthetic_corpus(200, seed=5):
            chars = list(s)
            for _ in range(3):
                op = rng.randrange(3)
                pos = rng.randrange(len(chars)) if chars else 0
                if op == 0 and chars:
                    chars[pos] = rng.choice(junk)
                elif op == 1:
                    chars.insert(pos, rng.choice(junk))
                elif op == 2 and chars:
                    chars.pop(pos)
            # must return a Mol or None — never raise
            parse_smiles("".join(chars), strict=False)
