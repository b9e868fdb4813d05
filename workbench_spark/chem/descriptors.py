"""Real 2D molecular descriptors from the pure-Python SMILES graph.

Mirrors the descriptor families of the reference's RDKit/Mordred stage
(``/root/reference/src/workbench/utils/chem_utils/mol_descriptors.py:107-487``)
with exact, published definitions — no RDKit required:

- ``molwt``           average molecular weight (standard atomic weights)
- ``heavyatomcount``  non-H atom count
- ``numheteroatoms``  non-C, non-H atoms
- ``ringcount``       cyclomatic number (== SSSR ring count)
- ``numaromaticrings``SSSR rings whose bonds are all aromatic
- ``numhdonors``      Lipinski donors: N/O atoms bearing ≥1 H
- ``numhacceptors``   Lipinski acceptors: N+O count (documented: RDKit's
                      ``NumHAcceptors`` applies extra exclusions; the
                      N+O count is the published Ro5 definition)
- ``numrotatablebonds`` non-ring single bonds between two non-terminal
                      heavy atoms, excluding bonds to triple-bonded atoms
                      (the RDKit *non-strict* SMARTS definition)
- ``tpsa``            Ertl topological polar surface area (Ertl, Rohde,
                      Selzer, J. Med. Chem. 2000) — N/O contributions,
                      matching RDKit's default (S/P excluded)
- ``fractioncsp3``    sp3 carbons / total carbons
- ``formalcharge``    sum of atomic formal charges
- ``numstereocenters``atoms written with @/@@ parity (defined centers)

``mollogp`` / ``molmr`` (Wildman-Crippen) come from the vendored
published 1999 atom-contribution table (``chem/crippen.py``) — real
values, golden-tested against the verified anchor molecules; see that
module's docstring for the transcription-verification story.
"""

from __future__ import annotations

from workbench_spark.chem.smiles import (
    Mol,
    SmilesError,
    mol_formula_weight,
    parse_smiles,
)

# --------------------------------------------------------------- TPSA
# Ertl 2000 fragment contributions for N and O (the RDKit default set).
# Keys: (symbol, aromatic, h_count, charge, n_single, n_double, n_triple)
# matched in order; None = wildcard. 3-membered-ring variants are matched
# by the `in_3ring` flag where they differ.


def _tpsa_contrib_n(
    h: int, charge: int, ns: int, nd: int, nt: int, aromatic: bool,
    arom_deg: int, in_3ring: bool,
) -> float | None:
    """Nitrogen contribution (Ertl Table 1). ns/nd/nt count σ/π bonds by
    order EXCLUDING aromatic bonds; arom_deg counts aromatic bonds."""
    if aromatic:
        if charge == 0:
            if h == 0 and arom_deg == 2 and ns == 0 and nd == 0:
                return 12.89  # [n](:*):*
            if h == 0 and arom_deg == 3:
                return 4.41  # [n](:*)(:*):*
            if h == 0 and arom_deg == 2 and ns == 1:
                return 4.93  # [n](-*)(:*):*
            if h == 0 and arom_deg == 2 and nd == 1:
                return 8.39  # [n](=*)(:*):*  (N-oxide-like)
            if h == 1 and arom_deg == 2:
                return 15.79  # [nH](:*):*
        elif charge == 1:
            if h == 0 and arom_deg == 3:
                return 4.10  # [n+](:*)(:*):*
            if h == 0 and arom_deg == 2 and ns == 1:
                return 3.88  # [n+](-*)(:*):*
            if h == 1 and arom_deg == 2:
                return 14.14  # [nH+](:*):*
        return None
    if charge == 0:
        if h == 0:
            if ns == 3 and nd == 0 and nt == 0:
                return 3.01 if in_3ring else 3.24  # N(-*)(-*)-*
            if ns == 1 and nd == 1 and nt == 0:
                return 12.36  # N(-*)=*
            if ns == 0 and nd == 0 and nt == 1:
                return 23.79  # N#*
            if ns == 1 and nd == 2:
                return 11.68  # N(-*)(=*)=*  (pentavalent nitro)
            if nd == 1 and nt == 1:
                return 13.60  # N(=*)#*  (azide)
        elif h == 1:
            if ns == 2 and nd == 0 and nt == 0:
                return 21.94 if in_3ring else 12.03  # NH(-*)-*
            if ns == 0 and nd == 1:
                return 23.85  # NH=*
        elif h == 2:
            if ns == 1 and nd == 0:
                return 26.02  # NH2-*
    elif charge == 1:
        if h == 0 and ns == 4:
            return 0.00  # N+(-*)(-*)(-*)-*
        if h == 0 and ns == 2 and nd == 1:
            return 3.01  # N+(-*)(-*)=*
        if h == 0 and ns == 1 and nt == 1:
            return 4.36  # N+(-*)#*
        if h == 1 and ns == 3:
            return 4.44  # NH+(-*)(-*)-*
        if h == 1 and ns == 1 and nd == 1:
            return 13.97  # NH+(-*)=*
        if h == 2 and ns == 2:
            return 16.61  # NH2+(-*)-*
        if h == 2 and ns == 0 and nd == 1:
            return 25.59  # NH2+=*
        if h == 3 and ns == 1:
            return 27.64  # NH3+-*
    return None


def _tpsa_contrib_o(
    h: int, charge: int, ns: int, nd: int, aromatic: bool, arom_deg: int,
    in_3ring: bool,
) -> float | None:
    """Oxygen contribution (Ertl Table 1)."""
    if aromatic:
        if arom_deg == 2 and charge == 0:
            return 13.14  # [o](:*):*
        return None
    if charge == 0:
        if h == 0 and ns == 2 and nd == 0:
            return 12.53 if in_3ring else 9.23  # O(-*)-*
        if h == 0 and ns == 0 and nd == 1:
            return 17.07  # O=*
        if h == 1 and ns == 1:
            return 20.23  # OH-*
    elif charge == -1:
        if h == 0 and ns == 1 and nd == 0:
            return 23.06  # [O-]-*
    return None


def tpsa(mol: Mol) -> float:
    """Ertl TPSA over N/O fragment contributions. Unclassified polar
    atoms fall back to the contribution of their nearest simpler pattern
    (N: amine-like 3.24 + 2.5·h; O: ether-like 9.23 + 5.5·h) — the same
    spirit as Ertl's treatment of rare environments, and deterministic."""
    atoms_in_3ring: set[int] = set()
    for ring in mol.rings:
        if len(ring) == 3:
            atoms_in_3ring.update(ring)
    # charge-separated nitro [N+](=O)[O-] scores as the neutral pentavalent
    # N(=O)=O form (Ertl/RDKit behavior: 11.68 + 2×17.07 = 45.82 for
    # nitrobenzene, not the formal-charge typing 3.01+17.07+23.06)
    nitro_n: set[int] = set()
    nitro_o_minus: set[int] = set()
    for atom in mol.atoms:
        if atom.symbol == "N" and atom.charge == 1:
            has_double_o = any(
                b.order == 2 and mol.atoms[nb].symbol == "O"
                for nb, b in mol.neighbors(atom.idx)
            )
            o_minus = [
                nb
                for nb, b in mol.neighbors(atom.idx)
                if b.order == 1
                and not b.aromatic
                and mol.atoms[nb].symbol == "O"
                and mol.atoms[nb].charge == -1
            ]
            if has_double_o and o_minus:
                nitro_n.add(atom.idx)
                nitro_o_minus.update(o_minus)
    total = 0.0
    for atom in mol.atoms:
        if atom.symbol not in ("N", "O"):
            continue
        if atom.idx in nitro_n:
            total += 11.68
            continue
        if atom.idx in nitro_o_minus:
            total += 17.07
            continue
        ns = nd = nt = arom_deg = 0
        for _, b in mol.neighbors(atom.idx):
            if b.aromatic:
                arom_deg += 1
            elif b.order == 1:
                ns += 1
            elif b.order == 2:
                nd += 1
            elif b.order >= 3:
                nt += 1
        h = atom.h_count
        in3 = atom.idx in atoms_in_3ring
        if atom.symbol == "N":
            c = _tpsa_contrib_n(
                h, atom.charge, ns, nd, nt, atom.aromatic, arom_deg, in3
            )
            if c is None:
                c = 3.24 + 2.5 * h
        else:
            c = _tpsa_contrib_o(h, atom.charge, ns, nd, atom.aromatic, arom_deg, in3)
            if c is None:
                c = 9.23 + 5.5 * h
        total += c
    return round(total, 2)


# ------------------------------------------------------- other descriptors


def num_h_donors(mol: Mol) -> int:
    """Lipinski donors: N or O atoms bearing at least one hydrogen."""
    return sum(
        1 for a in mol.atoms if a.symbol in ("N", "O") and a.h_count > 0
    )


def num_h_acceptors(mol: Mol) -> int:
    """Lipinski acceptors: count of N and O atoms (Ro5 N+O definition)."""
    return sum(1 for a in mol.atoms if a.symbol in ("N", "O"))


def num_rotatable_bonds(mol: Mol) -> int:
    """Non-ring single bonds between two non-terminal heavy atoms whose
    endpoints are not triple-bonded (RDKit non-strict SMARTS
    ``[!$(*#*)&!D1]-&!@[!$(*#*)&!D1]``)."""
    degree = [0] * len(mol.atoms)
    triple = [False] * len(mol.atoms)
    for b in mol.bonds:
        degree[b.a] += 1
        degree[b.b] += 1
        if b.order == 3:
            triple[b.a] = True
            triple[b.b] = True
    n = 0
    for b in mol.bonds:
        if b.in_ring or b.aromatic or b.order != 1:
            continue
        if degree[b.a] < 2 or degree[b.b] < 2:
            continue
        if triple[b.a] or triple[b.b]:
            continue
        n += 1
    return n


def num_aromatic_rings(mol: Mol) -> int:
    bond_by_pair = {frozenset((b.a, b.b)): b for b in mol.bonds}
    n = 0
    for ring in mol.rings:
        k = len(ring)
        bonds = [
            bond_by_pair.get(frozenset((ring[i], ring[(i + 1) % k])))
            for i in range(k)
        ]
        if all(b is not None and b.aromatic for b in bonds):
            n += 1
    return n


def fraction_csp3(mol: Mol) -> float | None:
    """sp3 carbons / total carbons: a carbon is sp3 when non-aromatic and
    all its bonds are single."""
    carbons = [a for a in mol.atoms if a.symbol == "C"]
    if not carbons:
        return 0.0
    orders = {i: [] for i in range(len(mol.atoms))}
    for b in mol.bonds:
        o = 1.5 if b.aromatic else b.order
        orders[b.a].append(o)
        orders[b.b].append(o)
    sp3 = sum(
        1
        for a in carbons
        if not a.aromatic
        and not a.demoted_aromatic  # conjugated (carbonyl-demoted) ≠ sp3
        and all(o == 1 for o in orders[a.idx])
    )
    return round(sp3 / len(carbons), 6)


def num_stereocenters(mol: Mol) -> int:
    """Atoms written with @/@@ parity (defined tetrahedral centers as
    notated — no CIP perception, which needs 3D-aware rules)."""
    return sum(1 for a in mol.atoms if a.chiral)


def compute_descriptors(smiles: str) -> dict[str, float | int | None] | None:
    """All descriptors for one SMILES; None if unparseable (mirrors the
    reference's drop-on-parse-failure)."""
    try:
        mol = parse_smiles(smiles)
    except SmilesError:
        return None
    from workbench_spark.chem.crippen import crippen_logp_mr

    heavy = len(mol.atoms)
    mollogp, molmr = crippen_logp_mr(mol)
    out = {
        "molwt": round(mol_formula_weight(mol), 3),
        "mollogp": mollogp,  # Wildman-Crippen 1999 (chem/crippen.py)
        "molmr": molmr,
        "heavyatomcount": heavy,
        "numhacceptors": num_h_acceptors(mol),
        "numhdonors": num_h_donors(mol),
        "numheteroatoms": sum(1 for a in mol.atoms if a.symbol not in ("C", "H")),
        "numrotatablebonds": num_rotatable_bonds(mol),
        "tpsa": tpsa(mol),
        "ringcount": len(mol.rings),
        "numaromaticrings": num_aromatic_rings(mol),
        "fractioncsp3": fraction_csp3(mol),
        "formalcharge": sum(a.charge for a in mol.atoms),
        "numstereocenters": num_stereocenters(mol),
    }
    out.update(ring_family(mol))
    out.update(h_bond_atom_counts(mol))
    out.update(bridgehead_spiro(mol))
    return out


def ring_family(mol: Mol) -> dict[str, int]:
    """RDKit ring-family descriptor parity, exact from the SSSR set:

    - ``numaromaticheterocycles``: aromatic rings containing a non-C;
    - ``numsaturatedrings``: rings whose atoms are all sp3 (every bond in
      the ring single, no member aromatic/demoted, no member carrying any
      double/triple bond);
    - ``numaliphaticrings``: non-aromatic rings (saturated or not);
    - ``numheterocycles``: rings containing a non-C;
    - ``largestringsize``: max SSSR ring size (0 for acyclic).
    """
    bond_by_pair = {frozenset((b.a, b.b)): b for b in mol.bonds}
    has_multiple = [False] * len(mol.atoms)
    for b in mol.bonds:
        if b.order >= 2 or b.aromatic:
            has_multiple[b.a] = True
            has_multiple[b.b] = True
    out = dict.fromkeys(
        (
            "numaromaticheterocycles", "numsaturatedrings",
            "numaliphaticrings", "numheterocycles", "largestringsize",
        ),
        0,
    )
    for ring in mol.rings:
        k = len(ring)
        out["largestringsize"] = max(out["largestringsize"], k)
        bonds = [
            bond_by_pair[frozenset((ring[i], ring[(i + 1) % k]))] for i in range(k)
        ]
        aromatic = all(b.aromatic for b in bonds)
        hetero = any(mol.atoms[i].symbol != "C" for i in ring)
        if hetero:
            out["numheterocycles"] += 1
        if aromatic and hetero:
            out["numaromaticheterocycles"] += 1
        if not aromatic:
            out["numaliphaticrings"] += 1
            if not any(has_multiple[i] for i in ring) and not any(
                mol.atoms[i].demoted_aromatic for i in ring
            ):
                out["numsaturatedrings"] += 1
    return out


def bridgehead_spiro(mol: Mol) -> dict[str, int]:
    """RDKit CalcNumBridgeheadAtoms / CalcNumSpiroAtoms parity from the
    SSSR set (rdMolDescriptors definitions):

    - a **spiro atom** is shared by two rings that share ONLY that atom
      (no common bond);
    - **bridgehead atoms** are the endpoints of a multi-bond path shared
      by two rings (rings sharing >= 2 bonds are bridged; the shared
      path's degree-1 atoms in the shared-bond subgraph are the
      bridgeheads — norbornane: two 5-rings share a 2-bond path, its two
      endpoints are the bridgeheads).

    Fused rings (exactly one shared bond) contribute to neither count.
    """
    rings = [list(r) for r in mol.rings]
    atom_sets = [set(r) for r in rings]
    bond_sets = [
        {frozenset((r[i], r[(i + 1) % len(r)])) for i in range(len(r))}
        for r in rings
    ]
    spiro: set[int] = set()
    bridge: set[int] = set()
    for i in range(len(rings)):
        for j in range(i + 1, len(rings)):
            shared_atoms = atom_sets[i] & atom_sets[j]
            if not shared_atoms:
                continue
            shared_bonds = bond_sets[i] & bond_sets[j]
            if len(shared_atoms) == 1 and not shared_bonds:
                spiro |= shared_atoms
            elif len(shared_bonds) >= 2:
                deg: dict[int, int] = {}
                for bnd in shared_bonds:
                    for a in bnd:
                        deg[a] = deg.get(a, 0) + 1
                bridge |= {a for a, d in deg.items() if d == 1}
    return {"numbridgeheadatoms": len(bridge), "numspiroatoms": len(spiro)}


def h_bond_atom_counts(mol: Mol) -> dict[str, int]:
    """RDKit NHOHCount / NOCount parity: total N-H + O-H hydrogens, and
    the N+O atom count."""
    nhoh = sum(a.h_count for a in mol.atoms if a.symbol in ("N", "O"))
    no = sum(1 for a in mol.atoms if a.symbol in ("N", "O"))
    return {"nhohcount": nhoh, "nocount": no}
