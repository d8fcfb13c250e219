"""SMILES parser (OpenSMILES subset) producing `Mol` graphs.

Clean-room replacement for Chem.MolFromSmiles as used by the reference
featurizers (dataset/dataset.py:62, dataset/dataset_test.py:126). Supports the
constructs present in PubChem/MoleculeNet SMILES: organic-subset and bracket
atoms, aromatic lowercase forms, charges, isotopes, tetrahedral chirality
(@/@@), directional bonds (/ and \\), branches, ring closures (incl. %nn),
and dot-separated fragments.

Like RDKit's sanitization, Hückel aromaticity perception runs on every parse
(chem/aromatic.py): Kekulé-written rings that satisfy 4n+2 are aromatized, so
`C1=CC=CC=C1` and `c1ccccc1` featurize and canonicalize identically.
Lowercase atoms/bonds are additionally taken as aromatic as written (no
kekulization check is performed on them).
"""

from __future__ import annotations

from molclr_tpu.chem.mol import Atom, Bond, BondDir, BondType, Chirality, Mol
from molclr_tpu.chem.periodic import AROMATIC_SYMBOLS, ORGANIC_SUBSET, SYMBOL_TO_Z


class SmilesError(ValueError):
    pass


_BOND_CHARS = {
    "-": (BondType.SINGLE, BondDir.NONE),
    "=": (BondType.DOUBLE, BondDir.NONE),
    "#": (BondType.TRIPLE, BondDir.NONE),
    ":": (BondType.AROMATIC, BondDir.NONE),
    "/": (BondType.SINGLE, BondDir.ENDUPRIGHT),
    "\\": (BondType.SINGLE, BondDir.ENDDOWNRIGHT),
}

_TWO_CHAR_ORGANIC = {"Cl", "Br"}


def parse_smiles(s: str, strict: bool = True) -> Mol | None:
    """Parse a SMILES string. Returns None on failure if strict=False."""
    try:
        return _parse(s)
    except SmilesError:
        if strict:
            raise
        return None


def _parse(s: str) -> Mol:
    mol = Mol()
    i = 0
    n = len(s)
    prev_atom: int | None = None
    # pending bond between prev atom and next atom
    pend_type: BondType | None = None
    pend_dir: BondDir = BondDir.NONE
    stack: list[int | None] = []
    # ring-closure table: num -> (atom idx, bond type or None, bond dir)
    rings: dict[int, tuple[int, BondType | None, BondDir]] = {}

    def attach(new_idx: int) -> None:
        nonlocal prev_atom, pend_type, pend_dir
        if prev_atom is not None:
            bt = pend_type
            if bt is None:
                a, b = mol.atoms[prev_atom], mol.atoms[new_idx]
                bt = (BondType.AROMATIC
                      if a.is_aromatic and b.is_aromatic else BondType.SINGLE)
            mol.add_bond(prev_atom, new_idx, bt, pend_dir)
        prev_atom = new_idx
        pend_type = None
        pend_dir = BondDir.NONE

    def close_ring(num: int) -> None:
        nonlocal prev_atom, pend_type, pend_dir
        if prev_atom is None:
            raise SmilesError(f"ring closure {num} before any atom in {s!r}")
        if num in rings:
            other, obt, odir = rings.pop(num)
            bt = pend_type if pend_type is not None else obt
            if bt is None:
                a, b = mol.atoms[other], mol.atoms[prev_atom]
                bt = (BondType.AROMATIC
                      if a.is_aromatic and b.is_aromatic else BondType.SINGLE)
            bd = pend_dir if pend_dir != BondDir.NONE else odir
            if other == prev_atom:
                raise SmilesError(f"self ring bond in {s!r}")
            mol.add_bond(other, prev_atom, bt, bd)
        else:
            rings[num] = (prev_atom, pend_type, pend_dir)
        pend_type = None
        pend_dir = BondDir.NONE

    while i < n:
        c = s[i]
        if c in _BOND_CHARS:
            if pend_type is not None and c not in "/\\":
                raise SmilesError(f"double bond symbol at {i} in {s!r}")
            bt, bd = _BOND_CHARS[c]
            pend_type = bt if c not in "/\\" else BondType.SINGLE
            if c in "/\\":
                pend_dir = bd
            i += 1
        elif c == "(":
            stack.append(prev_atom)
            i += 1
        elif c == ")":
            if not stack:
                raise SmilesError(f"unbalanced ')' at {i} in {s!r}")
            prev_atom = stack.pop()
            i += 1
        elif c == ".":
            prev_atom = None
            pend_type = None
            pend_dir = BondDir.NONE
            i += 1
        elif c.isdigit():
            close_ring(int(c))
            i += 1
        elif c == "%":
            if i + 2 >= n or not (s[i + 1].isdigit() and s[i + 2].isdigit()):
                raise SmilesError(f"bad %nn ring closure at {i} in {s!r}")
            close_ring(int(s[i + 1 : i + 3]))
            i += 3
        elif c == "[":
            j = s.find("]", i)
            if j < 0:
                raise SmilesError(f"unclosed bracket at {i} in {s!r}")
            idx = mol.add_atom(_parse_bracket(s[i + 1 : j], s))
            attach(idx)
            i = j + 1
        elif c == "*":
            idx = mol.add_atom(Atom(atomic_num=0, explicit_hs=0))
            attach(idx)
            i += 1
        else:
            # organic-subset atom (possibly two-char, possibly aromatic lowercase)
            sym2 = s[i : i + 2]
            if sym2 in _TWO_CHAR_ORGANIC:
                sym, aromatic = sym2, False
                i += 2
            elif c.upper() in ORGANIC_SUBSET or (
                c.islower() and c in "bcnops"
            ):
                aromatic = c.islower()
                sym = c.upper()
                if sym not in ORGANIC_SUBSET:
                    raise SmilesError(f"unknown atom {c!r} at {i} in {s!r}")
                i += 1
            else:
                raise SmilesError(f"unexpected char {c!r} at {i} in {s!r}")
            idx = mol.add_atom(
                Atom(atomic_num=SYMBOL_TO_Z[sym], is_aromatic=aromatic)
            )
            attach(idx)

    if rings:
        raise SmilesError(f"unclosed ring bond(s) {sorted(rings)} in {s!r}")
    if stack:
        raise SmilesError(f"unclosed branch in {s!r}")
    if mol.num_atoms == 0:
        raise SmilesError(f"empty SMILES {s!r}")
    from molclr_tpu.chem.aromatic import (
        perceive_aromaticity,
        sanitize_input_aromaticity,
    )

    input_aromatic = [a.is_aromatic for a in mol.atoms]
    mol = perceive_aromaticity(mol)
    err = sanitize_input_aromaticity(mol, input_aromatic)
    if err:
        raise SmilesError(f"{err} in {s!r}")
    return mol


def _parse_bracket(body: str, full: str) -> Atom:
    """Parse the inside of a bracket atom: isotope? symbol chiral? hcount?
    charge? (class)?"""
    i = 0
    n = len(body)
    isotope = 0
    while i < n and body[i].isdigit():
        isotope = isotope * 10 + int(body[i])
        i += 1
    if i >= n:
        raise SmilesError(f"bad bracket atom [{body}] in {full!r}")

    # symbol (possibly aromatic lowercase, incl. 'se'/'as'/'te'/'si')
    aromatic = False
    sym = None
    for two in (body[i : i + 2],):
        if two.lower() in AROMATIC_SYMBOLS and two.islower() and len(two) == 2:
            sym, aromatic = two.capitalize(), True
            i += 2
            break
        if two in SYMBOL_TO_Z and len(two) == 2 and two[1].islower() and not two[0].islower():
            sym = two
            i += 2
            break
    if sym is None:
        c = body[i]
        if c == "*":
            i += 1
            a = Atom(atomic_num=0, isotope=isotope)
            sym = "*"
        elif c.islower():
            if c not in "bcnops":
                raise SmilesError(f"bad aromatic symbol in [{body}] of {full!r}")
            sym, aromatic = c.upper(), True
            i += 1
        else:
            sym = c
            i += 1
            if sym not in SYMBOL_TO_Z:
                raise SmilesError(f"unknown element {sym!r} in {full!r}")

    chirality = Chirality.UNSPECIFIED
    if i < n and body[i] == "@":
        if i + 1 < n and body[i + 1] == "@":
            chirality = Chirality.TETRAHEDRAL_CW
            i += 2
        else:
            chirality = Chirality.TETRAHEDRAL_CCW
            i += 1
        # extended chirality classes @TH1/@AL1/@SP...: map to OTHER
        for tag in ("TH", "AL", "SP", "TB", "OH"):
            if body[i : i + 2] == tag:
                chirality = Chirality.OTHER
                i += 2
                while i < n and body[i].isdigit():
                    i += 1
                break

    hcount = 0
    if i < n and body[i] == "H":
        i += 1
        hcount = 1
        num = ""
        while i < n and body[i].isdigit():
            num += body[i]
            i += 1
        if num:
            hcount = int(num)

    charge = 0
    while i < n and body[i] in "+-":
        sign = 1 if body[i] == "+" else -1
        i += 1
        num = ""
        while i < n and body[i].isdigit():
            num += body[i]
            i += 1
        if num:
            charge += sign * int(num)
        else:
            charge += sign
            # allow ++ / -- runs
            while i < n and body[i] in "+-" and (
                (body[i] == "+") == (sign == 1)
            ):
                charge += sign
                i += 1

    atom_map = 0
    if i < n and body[i] == ":":
        i += 1
        num = ""
        while i < n and body[i].isdigit():
            num += body[i]
            i += 1
        if not num:
            raise SmilesError(f"bad atom map in [{body}] of {full!r}")
        atom_map = int(num)

    if i != n:
        raise SmilesError(f"trailing junk in [{body}] of {full!r}")

    if sym == "*":
        return Atom(atomic_num=0, formal_charge=charge, chirality=chirality,
                    is_aromatic=False, explicit_hs=hcount, isotope=isotope,
                    atom_map=atom_map)
    return Atom(
        atomic_num=SYMBOL_TO_Z[sym],
        formal_charge=charge,
        chirality=chirality,
        is_aromatic=aromatic,
        explicit_hs=hcount,
        isotope=isotope,
        atom_map=atom_map,
    )
