"""Generated fuzz corpus through Python-vs-C++ featurizer parity
(VERDICT r3 item #8): stereo (@/@@, cis-trans /\\), isotopes, charges,
%nn ring closures, aromatic + Kekulé spellings, fused rings — composed
combinatorially into ~600 molecules; every parseable one must featurize
BIT-IDENTICALLY in both featurizers and canonical-round-trip stably."""

import numpy as np
import pytest

from molclr_tpu.chem import canonical_smiles, parse_smiles
from molclr_tpu.data.featurize import featurize_smiles

# chain pieces: left- and right-extendable fragments
CHAIN = [
    "C", "CC", "N", "O", "S", "CO", "CN(C)", "C(C)(C)", "C(=O)",
    "C(=O)N", "C(=O)O", "S(=O)(=O)", "OC(=O)",
    "[C@H](F)", "[C@@H](Cl)", "[C@](C)(F)", "[C@@](N)(O)",
    "/C=C/", "/C=C\\", "C(/F)=C/", "C=C", "C#C",
    "[13CH2]", "[14C](C)(C)", "[2H]C([2H])",
    "[N+](C)(C)", "C[N+](C)(C)C", "[S+](C)",
    "c1ccc(cc1)", "c1ccc(nc1)", "c1cc(ccc1)", "c1ccc2c(c1)cccc2",
    "C1CCC(CC1)", "C1CC(CC1)", "C1CCN(CC1)",
    "C%10CCC(CC%10)", "c%11ccc(cc%11)",
]
# terminal pieces: right-capped
TERM = [
    "C", "O", "N", "F", "Cl", "Br", "I", "[O-]", "[NH3+]", "[13CH3]",
    "[2H]", "C(F)(F)F", "C#N", "N(=O)=O", "[N+](=O)[O-]", "S(C)(=O)=O",
    "c1ccccc1", "c1ccncc1", "c1cc[nH]c1", "c1ccsc1", "c1ccoc1",
    "C1=CC=CC=C1", "C1=CC=CN=C1", "c1ccc2ccccc2c1", "C1CCCCC1",
    "[C@H](F)Cl", "[C@@H](O)C", "/C=C/C", "/C=C\\Cl",
    "C%22CCCC%22", "n1ccccc1",
]
START = [
    "C", "O", "N", "[13CH3]", "FC(F)(F)", "[NH3+]C", "[O-]C(=O)",
    "c1ccccc1", "C1CCCCC1", "[C@H](F)(Cl)",
]


def fuzz_corpus(n=600, seed=1234):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        parts = [START[rng.randint(len(START))]]
        for _ in range(rng.randint(1, 5)):
            parts.append(CHAIN[rng.randint(len(CHAIN))])
        parts.append(TERM[rng.randint(len(TERM))])
        out.append("".join(parts))
    # fixed exemplars: nested %nn, mixed isotope+stereo+charge
    out += [
        "C%10(CC%11CCC%11)CCCC%10",
        "C%99CCCC%99",
        "[13C@H](F)(Cl)Br",
        "[2H][C@@]([2H])(C)C(=O)[O-]",
        "C[N+]%33(C)CCCC%33",
        "F/C=C/C=C\\Cl",
        "c1ccc2c(c1)[nH]c1ccccc12",
        "[13c]1ccccc1",
    ]
    return out


class TestFuzzParity:
    def test_parse_rate_and_native_parity(self):
        from molclr_tpu import native

        if not native.native_available():
            pytest.skip("no native featurizer")
        from molclr_tpu.native import featurize_smiles_native

        corpus = fuzz_corpus()
        parsed = 0
        for smi in corpus:
            py = featurize_smiles(smi)
            cc = featurize_smiles_native(smi)
            if py is None:
                assert cc is None, f"C++ parsed what Python refused: {smi}"
                continue
            parsed += 1
            assert cc is not None, f"Python parsed what C++ refused: {smi}"
            for f in ("atom_type", "chirality", "edge_src", "edge_dst",
                      "bond_type", "bond_dir"):
                np.testing.assert_array_equal(
                    getattr(py, f), getattr(cc, f),
                    err_msg=f"{smi}: field {f}")
        # the grammar must actually exercise the parser, not die at parse
        assert parsed >= 0.95 * len(corpus), \
            f"only {parsed}/{len(corpus)} fuzz molecules parsed"

    def test_canonical_round_trip_stable(self):
        corpus = fuzz_corpus(n=250, seed=77)
        checked = 0
        for smi in corpus:
            mol = parse_smiles(smi, strict=False)
            if mol is None:
                continue
            c1 = canonical_smiles(mol)
            m2 = parse_smiles(c1, strict=False)
            assert m2 is not None, f"canonical output unparseable: " \
                                   f"{smi} -> {c1}"
            c2 = canonical_smiles(m2)
            assert c1 == c2, f"canonical not stable: {smi}: {c1} != {c2}"
            checked += 1
        assert checked >= 0.95 * len(corpus)

    def test_add_hs_parity(self):
        from molclr_tpu import native

        if not native.native_available():
            pytest.skip("no native featurizer")
        from molclr_tpu.native import featurize_smiles_native

        for smi in fuzz_corpus(n=120, seed=55):
            py = featurize_smiles(smi, add_hs=True)
            cc = featurize_smiles_native(smi, add_hs=True)
            if py is None:
                assert cc is None, smi
                continue
            assert cc is not None, smi
            np.testing.assert_array_equal(py.atom_type, cc.atom_type, smi)
            np.testing.assert_array_equal(py.bond_type, cc.bond_type, smi)
