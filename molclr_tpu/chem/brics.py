"""BRICS-style bond cleavage and motif (clique) decomposition.

Clean-room replacement for rdkit.Chem.BRICS.FindBRICSBonds plus the fork's
clique algorithm (ref utils/clique.py:11-90). The decomposition semantics
follow the reference exactly; the *bond-cleavage rule set* is a documented
approximation of the BRICS environments (Degen et al., ChemMedChem 2008):
acyclic single bonds at prototypical synthetically-accessible positions
(amide, ester, amine, ether, sulfonamide, thioether, ring-attachment). Exact
RDKit-BRICS string parity is not a goal (RDKit is unavailable by design);
motif vocabularies built with these rules are internally consistent, which is
what the fine-tune motif subsystem requires.
"""

from __future__ import annotations

from molclr_tpu.chem.canon import canonical_smiles
from molclr_tpu.chem.mol import BondType, Mol


def _env_flags(mol: Mol):
    """Per-atom chemical-environment predicates used by the cut rules."""
    n = mol.num_atoms
    adj = mol.adjacency()
    ring_atom = mol.ring_atom_flags()
    z = [a.atomic_num for a in mol.atoms]

    carbonyl_c = [False] * n   # C with a double bond to O (acyl / carboxyl)
    sulfonyl_s = [False] * n   # S with two double-bonded O
    for i in range(n):
        if z[i] == 6:
            for v, bi in adj[i]:
                if z[v] == 8 and mol.bonds[bi].bond_type == BondType.DOUBLE:
                    carbonyl_c[i] = True
        elif z[i] == 16:
            n_dbl_o = sum(
                1 for v, bi in adj[i]
                if z[v] == 8 and mol.bonds[bi].bond_type == BondType.DOUBLE
            )
            sulfonyl_s[i] = n_dbl_o >= 2
    return adj, ring_atom, z, carbonyl_c, sulfonyl_s


def find_brics_bonds(mol: Mol) -> list[tuple[int, int]]:
    """Return (a1, a2) pairs of cleavable bonds, in bond order.

    Only acyclic SINGLE bonds between heavy atoms are considered, mirroring
    the BRICS constraint that ring bonds and multiple bonds are never cut."""
    adj, ring_atom, z, carbonyl_c, sulfonyl_s = _env_flags(mol)
    ring_bond = mol.ring_bond_flags()
    out: list[tuple[int, int]] = []

    def heavy_degree(i: int) -> int:
        return sum(1 for v, _ in adj[i] if z[v] != 1)

    for bi, b in enumerate(mol.bonds):
        if b.bond_type != BondType.SINGLE or ring_bond[bi]:
            continue
        i, j = b.a1, b.a2
        if z[i] == 1 or z[j] == 1:
            continue
        if heavy_degree(i) < 2 or heavy_degree(j) < 2:
            # Cutting a terminal bond would produce a lone atom; BRICS
            # environments all require substituted partners.
            continue
        cut = False
        for a, c in ((i, j), (j, i)):
            za, zc = z[a], z[c]
            # amide / ester / acyl: C(=O)-N, C(=O)-O, C(=O)-C(ring)
            if carbonyl_c[a] and zc in (7, 8) and not mol.atoms[c].is_aromatic:
                cut = True
            # sulfonamide: S(=O)(=O)-N
            elif sulfonyl_s[a] and zc == 7:
                cut = True
            # amine: C-N with aliphatic N not alpha to carbonyl
            elif (za == 6 and zc == 7 and not carbonyl_c[a]
                  and not mol.atoms[c].is_aromatic
                  and not any(carbonyl_c[v] for v, _ in adj[c])):
                cut = True
            # ether: C-O with aliphatic O, C not acyl
            elif (za == 6 and zc == 8 and not carbonyl_c[a]
                  and not mol.atoms[c].is_aromatic
                  and heavy_degree(c) >= 2):
                cut = True
            # thioether / C-S
            elif za == 6 and zc == 16 and not sulfonyl_s[c]:
                cut = True
            # ring attachment: ring atom to acyclic carbon chain
            elif ring_atom[a] and not ring_atom[c] and zc == 6:
                cut = True
            if cut:
                break
        if cut:
            out.append((i, j))
    return out


def brics_decompose(mol: Mol) -> tuple[list[list[int]], list[tuple[int, int]]]:
    """Motif decomposition with the reference's exact control flow
    (ref utils/clique.py:11-90):

      1. single-atom molecule -> one singleton clique, no edges (:13-14)
      2. no BRICS bonds -> the whole molecule as one clique, no edges (:24-25)
      3. cut BRICS bonds (:27-33), then ring/non-ring junction bonds (:36-45),
         then isolate acyclic atoms with >2 neighbors (:48-58)
      4. merge overlapping cliques (:61-71) == connected components of the
         graph with cut bonds removed
      5. one motif-graph edge per cut bond between the containing cliques
         (:74-89)
    """
    n = mol.num_atoms
    if n == 1:
        return [[0]], []

    brics_bonds = find_brics_bonds(mol)
    if not brics_bonds:
        return [list(range(n))], []

    cut = {frozenset(b) for b in brics_bonds}
    cut_list: list[tuple[int, int]] = list(brics_bonds)

    ring_atom = mol.ring_atom_flags()
    adj = mol.adjacency()

    # ring / non-ring junction bonds (only those not already cut)
    for b in mol.bonds:
        key = frozenset((b.a1, b.a2))
        if key in cut:
            continue
        if ring_atom[b.a1] != ring_atom[b.a2]:
            cut.add(key)
            cut_list.append((b.a1, b.a2))

    # high-degree acyclic atoms become their own motif: cut all their bonds
    for i in range(n):
        if len(adj[i]) > 2 and not ring_atom[i]:
            for v, _ in adj[i]:
                key = frozenset((i, v))
                if key not in cut:
                    cut.add(key)
                    cut_list.append((i, v))

    # connected components after removing cut bonds
    comp = [-1] * n
    n_comp = 0
    for i in range(n):
        if comp[i] != -1:
            continue
        comp[i] = n_comp
        stack = [i]
        while stack:
            u = stack.pop()
            for v, _ in adj[u]:
                if comp[v] == -1 and frozenset((u, v)) not in cut:
                    comp[v] = n_comp
                    stack.append(v)
        n_comp += 1

    cliques: list[list[int]] = [[] for _ in range(n_comp)]
    for i in range(n):
        cliques[comp[i]].append(i)

    edges = [(comp[a], comp[b]) for a, b in cut_list if comp[a] != comp[b]]
    return cliques, edges


def clique_mol_smiles(mol: Mol, atoms: list[int]) -> str:
    """Canonical SMILES key of a clique fragment — the vocabulary key used in
    place of get_clique_mol + get_smiles (ref utils/clique.py:92-98,133-134)."""
    frag = mol.extract_atoms(atoms)
    return canonical_smiles(frag)
