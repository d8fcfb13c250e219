"""Molecular graph datatypes and derived chemistry (valence, rings, AddHs).

Clean-room replacement for the RDKit Mol/Atom/Bond objects consumed by the
reference featurizers (dataset/dataset.py:61-109) and the clique decomposition
(utils/clique.py:11-90). Enum integer values are chosen so the featurization
indices match the reference tables exactly (dataset/dataset.py:26-43).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import IntEnum
from typing import Iterable

from molclr_tpu.chem.periodic import (
    SYMBOL_TO_Z,
    Z_TO_SYMBOL,
    default_valence,
)


class BondType(IntEnum):
    """Index-compatible with BOND_LIST, ref dataset/dataset.py:33-38."""
    SINGLE = 0
    DOUBLE = 1
    TRIPLE = 2
    AROMATIC = 3
    SELF_LOOP = 4  # synthetic self-loop type, ref models/ginet_molclr.py:35

    @property
    def order(self) -> float:
        return {0: 1.0, 1: 2.0, 2: 3.0, 3: 1.5, 4: 0.0}[int(self)]


class Chirality(IntEnum):
    """Index-compatible with CHIRALITY_LIST, ref dataset/dataset.py:27-32."""
    UNSPECIFIED = 0
    TETRAHEDRAL_CW = 1   # @@
    TETRAHEDRAL_CCW = 2  # @
    OTHER = 3


class BondDir(IntEnum):
    """Index-compatible with BONDDIR_LIST, ref dataset/dataset.py:39-43."""
    NONE = 0
    ENDUPRIGHT = 1    # '/'
    ENDDOWNRIGHT = 2  # '\\'


@dataclass
class Atom:
    atomic_num: int
    formal_charge: int = 0
    chirality: Chirality = Chirality.UNSPECIFIED
    is_aromatic: bool = False
    explicit_hs: int | None = None  # bracket-atom H count; None => implicit
    isotope: int = 0
    atom_map: int = 0

    @property
    def symbol(self) -> str:
        return Z_TO_SYMBOL.get(self.atomic_num, "*")


@dataclass
class Bond:
    a1: int
    a2: int
    bond_type: BondType = BondType.SINGLE
    bond_dir: BondDir = BondDir.NONE

    def other(self, idx: int) -> int:
        return self.a2 if idx == self.a1 else self.a1


@dataclass
class Mol:
    """A molecular graph. Atom/bond order is preserved from construction
    (SMILES parse order), matching RDKit's behavior that the reference's
    featurization loops rely on (dataset/dataset.py:74, :94)."""

    atoms: list[Atom] = field(default_factory=list)
    bonds: list[Bond] = field(default_factory=list)

    # ---- construction ----
    def add_atom(self, atom: Atom) -> int:
        self.atoms.append(atom)
        return len(self.atoms) - 1

    def add_bond(self, a1: int, a2: int, bond_type: BondType = BondType.SINGLE,
                 bond_dir: BondDir = BondDir.NONE) -> int:
        self.bonds.append(Bond(a1, a2, bond_type, bond_dir))
        return len(self.bonds) - 1

    # ---- basic accessors ----
    @property
    def num_atoms(self) -> int:
        return len(self.atoms)

    @property
    def num_bonds(self) -> int:
        return len(self.bonds)

    def neighbors(self, idx: int) -> list[int]:
        return [b.other(idx) for b in self.bonds if idx in (b.a1, b.a2)]

    def adjacency(self) -> list[list[tuple[int, int]]]:
        """adj[i] = list of (neighbor atom idx, bond idx)."""
        adj: list[list[tuple[int, int]]] = [[] for _ in self.atoms]
        for bi, b in enumerate(self.bonds):
            adj[b.a1].append((b.a2, bi))
            adj[b.a2].append((b.a1, bi))
        return adj

    def bond_between(self, a1: int, a2: int) -> Bond | None:
        for b in self.bonds:
            if (b.a1, b.a2) in ((a1, a2), (a2, a1)):
                return b
        return None

    # ---- valence / hydrogens ----
    def implicit_hs(self, idx: int) -> int:
        """Implicit hydrogen count under the normal-valence model.

        Mirrors what RDKit's sanitization yields for the molecules the
        reference processes; bracket atoms carry explicit H counts instead."""
        atom = self.atoms[idx]
        if atom.explicit_hs is not None:
            return atom.explicit_hs
        return self.valence_model_hs(idx)

    def valence_model_hs(self, idx: int) -> int:
        """H count the normal-valence model would assign, ignoring any
        explicit bracket H count (used by the canonical writer).

        OpenSMILES rule: the normal valence is selected from the sigma-bond
        sum (aromatic bonds count 1), while the aromatic system contributes
        one extra bonding unit when computing the remaining H slots."""
        atom = self.atoms[idx]
        sigma = 0.0
        n_arom = 0
        for b in self.bonds:
            if idx in (b.a1, b.a2):
                if b.bond_type == BondType.AROMATIC:
                    sigma += 1.0
                    n_arom += 1
                else:
                    sigma += b.bond_type.order
        bonus = 1.0 if n_arom > 0 else 0.0
        dv = default_valence(atom.symbol, sigma)
        if dv == 0:
            return 0
        # Formal charge shifts the effective valence (N+ -> 4, O- -> 1, ...).
        eff = dv + atom.formal_charge if atom.symbol in ("N", "P", "B") else dv
        if atom.symbol in ("O", "S", "Se", "Te") and atom.formal_charge != 0:
            eff = dv + atom.formal_charge
        if atom.symbol == "C" and atom.formal_charge != 0:
            eff = dv - abs(atom.formal_charge)
        n = int(round(eff - sigma - bonus))
        return max(0, n)

    def total_hs(self, idx: int) -> int:
        explicit = sum(
            1
            for b in self.bonds
            if idx in (b.a1, b.a2) and self.atoms[b.other(idx)].atomic_num == 1
        )
        return explicit + self.implicit_hs(idx)

    def add_hs(self) -> "Mol":
        """Return a copy with implicit hydrogens materialized as atoms.

        Replaces Chem.AddHs (ref dataset/dataset_mix.py:88,
        dataset/dataset_test.py:127). New H atoms are appended after all heavy
        atoms, bonded in heavy-atom order, matching RDKit's layout."""
        out = Mol(
            atoms=[Atom(a.atomic_num, a.formal_charge, a.chirality,
                        a.is_aromatic, 0 if a.explicit_hs is not None else None,
                        a.isotope, a.atom_map) for a in self.atoms],
            bonds=[Bond(b.a1, b.a2, b.bond_type, b.bond_dir) for b in self.bonds],
        )
        n_heavy = self.num_atoms
        for i in range(n_heavy):
            nh = (self.atoms[i].explicit_hs
                  if self.atoms[i].explicit_hs is not None
                  else self.implicit_hs(i))
            for _ in range(nh):
                h = out.add_atom(Atom(atomic_num=1, explicit_hs=0))
                out.add_bond(i, h, BondType.SINGLE)
        return out

    # ---- ring perception ----
    def ring_bond_flags(self) -> list[bool]:
        """ring_bond[i] is True iff bond i lies on a cycle (i.e. is not a
        bridge). Iterative Tarjan bridge-finding."""
        n = self.num_atoms
        adj = self.adjacency()
        disc = [-1] * n
        low = [0] * n
        is_bridge = [False] * self.num_bonds
        timer = 0
        for root in range(n):
            if disc[root] != -1:
                continue
            # iterative DFS: stack of (node, parent_bond, iterator position)
            stack = [(root, -1, 0)]
            disc[root] = low[root] = timer
            timer += 1
            while stack:
                u, pbond, it = stack[-1]
                if it < len(adj[u]):
                    stack[-1] = (u, pbond, it + 1)
                    v, bi = adj[u][it]
                    if bi == pbond:
                        continue
                    if disc[v] == -1:
                        disc[v] = low[v] = timer
                        timer += 1
                        stack.append((v, bi, 0))
                    else:
                        low[u] = min(low[u], disc[v])
                else:
                    stack.pop()
                    if stack:
                        p = stack[-1][0]
                        low[p] = min(low[p], low[u])
                        if low[u] > disc[p]:
                            is_bridge[pbond] = True
        return [not br for br in is_bridge]

    def ring_atom_flags(self) -> list[bool]:
        """atom_in_ring[i], i.e. RDKit atom.IsInRing() (ref utils/clique.py:38)."""
        flags = [False] * self.num_atoms
        for b, in_ring in zip(self.bonds, self.ring_bond_flags()):
            if in_ring:
                flags[b.a1] = True
                flags[b.a2] = True
        return flags

    def sssr(self) -> list[list[int]]:
        """A smallest-set-of-smallest-rings approximation: for every ring bond,
        the shortest cycle through it (deduplicated). Sufficient for
        aromaticity perception and scaffold logic."""
        from collections import deque

        adj = self.adjacency()
        ring_bonds = self.ring_bond_flags()
        rings: list[list[int]] = []
        seen: set[frozenset[int]] = set()
        for bi, b in enumerate(self.bonds):
            if not ring_bonds[bi]:
                continue
            # BFS from a1 to a2 avoiding bond bi
            prev: dict[int, int] = {b.a1: -1}
            dq = deque([b.a1])
            while dq:
                u = dq.popleft()
                if u == b.a2:
                    break
                for v, bj in adj[u]:
                    if bj == bi or v in prev:
                        continue
                    prev[v] = u
                    dq.append(v)
            if b.a2 not in prev:
                continue
            path = [b.a2]
            while path[-1] != b.a1:
                path.append(prev[path[-1]])
            key = frozenset(path)
            if key not in seen:
                seen.add(key)
                rings.append(path)
        return rings

    # ---- substructure extraction ----
    def extract_atoms(self, atom_ids: Iterable[int]) -> "Mol":
        """Fragment induced by an atom subset, preserving relative order.
        Replaces Chem.MolFragmentToSmiles + re-parse (ref utils/clique.py:92-98)
        for clique-fragment construction."""
        ids = sorted(set(atom_ids))
        remap = {old: new for new, old in enumerate(ids)}
        frag = Mol()
        for old in ids:
            a = self.atoms[old]
            frag.add_atom(Atom(a.atomic_num, a.formal_charge, a.chirality,
                               a.is_aromatic, a.explicit_hs, a.isotope,
                               a.atom_map))
        for b in self.bonds:
            if b.a1 in remap and b.a2 in remap:
                frag.add_bond(remap[b.a1], remap[b.a2], b.bond_type, b.bond_dir)
        # An extracted fragment may break aromatic rings; demote aromatic
        # flags/bonds that are no longer in a ring (mirrors the sanitize()
        # round-trip in ref utils/clique.py:118-124).
        ring = frag.ring_bond_flags()
        for bi, bb in enumerate(frag.bonds):
            if bb.bond_type == BondType.AROMATIC and not ring[bi]:
                bb.bond_type = BondType.SINGLE
        ring_atoms = frag.ring_atom_flags()
        for i, a in enumerate(frag.atoms):
            if a.is_aromatic and not ring_atoms[i]:
                a.is_aromatic = False
        return frag

    def __repr__(self) -> str:  # pragma: no cover
        return f"Mol(atoms={self.num_atoms}, bonds={self.num_bonds})"


def mol_formula(mol: Mol) -> str:
    """Hill-order molecular formula (debugging/tests helper)."""
    from collections import Counter

    counts: Counter[str] = Counter()
    for i, a in enumerate(mol.atoms):
        counts[a.symbol] += 1
        counts["H"] += mol.implicit_hs(i) if a.atomic_num != 1 else 0
    parts = []
    for sym in ["C", "H"] + sorted(k for k in counts if k not in ("C", "H")):
        if counts.get(sym):
            n = counts[sym]
            parts.append(sym + (str(n) if n > 1 else ""))
    return "".join(parts)
