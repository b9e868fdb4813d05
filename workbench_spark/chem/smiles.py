"""Pure-Python SMILES parser → molecular graph.

The reference computes all chemistry through RDKit
(``/root/reference/src/workbench/utils/chem_utils/mol_descriptors.py:107-487``,
``mol_standardize.py:209-540``). RDKit is not installable in this
container, so this module implements the subset of molecular perception
the 2D descriptor/fingerprint/canonicalization tier actually needs, from
the published SMILES specification (Weininger 1988; OpenSMILES spec):

- tokenizer + parser: organic-subset atoms, bracket atoms (isotope,
  charge, explicit H, stereo marks), bond symbols (- = # $ : / \\),
  branches, ring-closure digits (incl. %nn), dot-disconnected components;
- implicit hydrogen counting per the organic-subset valence rules
  (B3 C4 N3/5 O2 P3/5 S2/4/6 halogens1, charge-adjusted);
- ring perception: ring membership via bridge detection (Tarjan), ring
  count via the cyclomatic number, SSSR-style smallest rings for
  aromaticity/TPSA classification;
- aromaticity: taken from the input's lowercase notation, plus
  detection of Kekulé-written alternating rings (benzene-like 6-rings)
  so ``C1=CC=CC=C1`` and ``c1ccccc1`` perceive identically.

Everything here is driver-free pure Python executed inside Arrow-batched
pandas UDFs — partition-parallel, no JVM round-trips.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# IUPAC 2021 standard atomic weights (common elements; extend as needed)
ATOMIC_MASS = {
    "H": 1.008, "He": 4.0026, "Li": 6.94, "Be": 9.0122, "B": 10.81,
    "C": 12.011, "N": 14.007, "O": 15.999, "F": 18.998, "Ne": 20.180,
    "Na": 22.990, "Mg": 24.305, "Al": 26.982, "Si": 28.085, "P": 30.974,
    "S": 32.06, "Cl": 35.45, "Ar": 39.95, "K": 39.098, "Ca": 40.078,
    "Ti": 47.867, "Cr": 51.996, "Mn": 54.938, "Fe": 55.845, "Co": 58.933,
    "Ni": 58.693, "Cu": 63.546, "Zn": 65.38, "Ga": 69.723, "Ge": 72.630,
    "As": 74.922, "Se": 78.971, "Br": 79.904, "Kr": 83.798, "Rb": 85.468,
    "Sr": 87.62, "Mo": 95.95, "Pd": 106.42, "Ag": 107.87, "Cd": 112.41,
    "In": 114.82, "Sn": 118.71, "Sb": 121.76, "Te": 127.60, "I": 126.90,
    "Xe": 131.29, "Cs": 132.91, "Ba": 137.33, "Pt": 195.08, "Au": 196.97,
    "Hg": 200.59, "Tl": 204.38, "Pb": 207.2, "Bi": 208.98,
}

# default valences for implicit-H computation (organic subset rules);
# multi-valent elements list their allowed valences in ascending order
DEFAULT_VALENCES = {
    "B": (3,), "C": (4,), "N": (3, 5), "O": (2,), "P": (3, 5),
    "S": (2, 4, 6), "F": (1,), "Cl": (1,), "Br": (1,), "I": (1,),
}

ORGANIC_SUBSET = {"B", "C", "N", "O", "P", "S", "F", "Cl", "Br", "I"}
AROMATIC_SYMBOLS = {"b", "c", "n", "o", "p", "s", "se", "as"}

_BRACKET_RE = re.compile(
    r"^(?P<isotope>\d+)?"
    r"(?P<symbol>[A-Z][a-z]?|[a-z]{1,2}|\*)"
    r"(?P<chiral>@{1,2}(?:TH[12]|AL[12]|SP[1-3]|TB\d{1,2}|OH\d{1,2})?)?"
    r"(?P<hcount>H\d*)?"
    r"(?P<charge>\+{1,3}|-{1,3}|\+\d+|-\d+)?"
    r"(?P<map>:\d+)?$"
)


class SmilesError(ValueError):
    """Raised on an unparseable SMILES string."""


@dataclass
class Atom:
    symbol: str  # normalized element symbol ("C", "Cl", ...)
    aromatic: bool = False
    charge: int = 0
    isotope: int | None = None
    explicit_h: int | None = None  # from bracket; None = compute implicit
    chiral: str | None = None  # "@", "@@" (stereo parity as written)
    from_bracket: bool = False
    demoted_aromatic: bool = False  # written aromatic, carbonyl-ring demoted
    # filled in post-parse:
    h_count: int = 0
    in_ring: bool = False
    idx: int = -1
    # written neighbor order (SMILES chirality frame): atom indices, the
    # "H" marker for a bracket implicit hydrogen, and ("ring", n)
    # placeholders resolved to atom indices at ring closure. Populated
    # during parse; consumed by chem.canon to re-express @/@@ parity
    # relative to the canonical output order.
    written_nbrs: list = field(default_factory=list)


@dataclass
class Bond:
    a: int
    b: int
    order: int  # 1,2,3,4(quadruple '$') — aromatic bonds carry order 1
    aromatic: bool = False
    stereo: str | None = None  # "/" or "\\" as written
    in_ring: bool = False
    demoted_aromatic: bool = False  # written aromatic, carbonyl-ring demoted


@dataclass
class Mol:
    atoms: list[Atom] = field(default_factory=list)
    bonds: list[Bond] = field(default_factory=list)
    n_components: int = 1
    rings: list[list[int]] = field(default_factory=list)  # SSSR atom cycles
    _adj: dict | None = field(default=None, repr=False)

    def neighbors(self, i: int) -> list[tuple[int, "Bond"]]:
        return self.adjacency[i]

    @property
    def adjacency(self) -> dict[int, list[tuple[int, Bond]]]:
        """Adjacency list, built once per Mol (bond objects are shared, so
        in-place perception flag changes stay visible). Per-atom loops in
        the descriptor/toxicity stages would otherwise rebuild this
        O(bonds) structure per atom — quadratic per molecule."""
        if self._adj is None or len(self._adj) != len(self.atoms):
            adj: dict[int, list[tuple[int, Bond]]] = {
                i: [] for i in range(len(self.atoms))
            }
            for b in self.bonds:
                adj[b.a].append((b.b, b))
                adj[b.b].append((b.a, b))
            self._adj = adj
        return self._adj


_BOND_ORDER = {"-": 1, "=": 2, "#": 3, "$": 4, ":": 1, "/": 1, "\\": 1}


def _parse_bracket(body: str) -> Atom:
    m = _BRACKET_RE.match(body)
    if not m:
        raise SmilesError(f"bad bracket atom [{body}]")
    sym = m.group("symbol")
    aromatic = sym[0].islower()
    symbol = sym.capitalize() if sym != "*" else "*"
    h = m.group("hcount")
    if h is None:
        hcount = 0
    elif h == "H":
        hcount = 1
    else:
        hcount = int(h[1:])
    ch = m.group("charge") or ""
    if ch.startswith("+"):
        charge = int(ch[1:]) if ch[1:].isdigit() else len(ch)
    elif ch.startswith("-"):
        charge = -int(ch[1:]) if ch[1:].isdigit() else -len(ch)
    else:
        charge = 0
    iso = m.group("isotope")
    return Atom(
        symbol=symbol,
        aromatic=aromatic,
        charge=charge,
        isotope=int(iso) if iso else None,
        explicit_h=hcount,
        chiral=m.group("chiral"),
        from_bracket=True,
    )


def parse_smiles(smiles: str) -> Mol:
    """Parse a SMILES string into a Mol graph (raises SmilesError)."""
    if smiles is None or not smiles.strip():
        raise SmilesError("empty SMILES")
    s = smiles.strip()
    mol = Mol()
    stack: list[int] = []  # branch return points
    prev: int | None = None
    pending_bond: str | None = None
    ring_open: dict[int, tuple[int, str | None]] = {}
    n_components = 1
    i = 0
    while i < len(s):
        ch = s[i]
        if ch == "(":
            if prev is None:
                raise SmilesError("branch before any atom")
            stack.append(prev)
            i += 1
        elif ch == ")":
            if not stack:
                raise SmilesError("unbalanced ')'")
            prev = stack.pop()
            i += 1
        elif ch in _BOND_ORDER:
            pending_bond = ch
            i += 1
        elif ch == ".":
            prev = None
            pending_bond = None
            n_components += 1
            i += 1
        elif ch == "%":
            if i + 2 >= len(s) or not s[i + 1 : i + 3].isdigit():
                raise SmilesError("bad %nn ring closure")
            _close_ring(mol, ring_open, int(s[i + 1 : i + 3]), prev, pending_bond)
            pending_bond = None
            i += 3
        elif ch.isdigit():
            _close_ring(mol, ring_open, int(ch), prev, pending_bond)
            pending_bond = None
            i += 1
        elif ch == "[":
            j = s.find("]", i)
            if j < 0:
                raise SmilesError("unterminated bracket atom")
            atom = _parse_bracket(s[i + 1 : j])
            prev = _add_atom(mol, atom, prev, pending_bond)
            pending_bond = None
            i = j + 1
        else:
            # organic-subset atom: two-letter first (Cl, Br)
            two = s[i : i + 2]
            if two in ("Cl", "Br"):
                sym, adv = two, 2
            elif ch in "BCNOPSFI":
                sym, adv = ch, 1
            elif ch in "bcnops":
                sym, adv = ch, 1
            elif ch == "*":
                sym, adv = "*", 1
            else:
                raise SmilesError(f"unexpected character {ch!r} at {i}")
            aromatic = sym.islower()
            atom = Atom(symbol=sym.capitalize() if sym != "*" else "*", aromatic=aromatic)
            prev = _add_atom(mol, atom, prev, pending_bond)
            pending_bond = None
            i += adv
    if stack:
        raise SmilesError("unbalanced '('")
    if ring_open:
        raise SmilesError(f"unclosed ring bond(s): {sorted(ring_open)}")
    mol.n_components = n_components
    _perceive(mol)
    return mol


def _add_atom(mol: Mol, atom: Atom, prev: int | None, bond_sym: str | None) -> int:
    atom.idx = len(mol.atoms)
    mol.atoms.append(atom)
    if prev is not None:
        atom.written_nbrs.append(prev)
        mol.atoms[prev].written_nbrs.append(atom.idx)
    if atom.explicit_h:
        # bracket implicit H occupies the slot right after the preceding
        # atom (or first, for a leading atom) in the chirality frame
        atom.written_nbrs.append("H")
    if prev is not None:
        aromatic = bond_sym == ":" or (
            bond_sym is None and atom.aromatic and mol.atoms[prev].aromatic
        )
        order = _BOND_ORDER.get(bond_sym, 1) if bond_sym else 1
        mol.bonds.append(
            Bond(
                prev,
                atom.idx,
                order,
                aromatic=aromatic,
                stereo=bond_sym if bond_sym in ("/", "\\") else None,
            )
        )
    return atom.idx


def _close_ring(
    mol: Mol,
    ring_open: dict[int, tuple[int, str | None]],
    num: int,
    prev: int | None,
    bond_sym: str | None,
) -> None:
    if prev is None:
        raise SmilesError("ring digit before any atom")
    if num in ring_open:
        first, first_sym = ring_open.pop(num)
        sym = bond_sym or first_sym
        if bond_sym and first_sym and bond_sym != first_sym:
            raise SmilesError(f"conflicting ring-bond symbols for {num}")
        aromatic = sym == ":" or (
            sym is None and mol.atoms[first].aromatic and mol.atoms[prev].aromatic
        )
        order = _BOND_ORDER.get(sym, 1) if sym else 1
        mol.bonds.append(Bond(first, prev, order, aromatic=aromatic))
        mol.atoms[prev].written_nbrs.append(first)
        wn = mol.atoms[first].written_nbrs
        wn[wn.index(("ring", num))] = prev
    else:
        ring_open[num] = (prev, bond_sym)
        mol.atoms[prev].written_nbrs.append(("ring", num))


# ------------------------------------------------------------- perception


def _perceive(mol: Mol) -> None:
    """Post-parse perception. Order matters: implicit H derives from the
    notation AS WRITTEN (Kekulé orders give plain valence; lowercase atoms
    use the aromatic rules) and must precede Kekulé-aromatization — a
    Kekulé pyrrole N (C1=CC=CN1, two single bonds) keeps its hydrogen,
    while an aromatic-written `n` of the same degree is pyridine-type with
    none. Aromatization and carbonyl demotion then only adjust FLAGS used
    by classification (TPSA typing, ring counts, canonical form)."""
    _find_rings(mol)
    _assign_implicit_h(mol)
    _aromatize_kekule(mol)
    _demote_carbonyl_rings(mol)


def _find_rings(mol: Mol) -> None:
    """Ring membership + SSSR-style smallest rings.

    Ring bond = any bond not a bridge (Tarjan bridge finding, iterative).
    For each ring bond, the smallest cycle through it is found by BFS from
    one endpoint to the other excluding the bond itself; unique cycles,
    smallest-first, up to the cyclomatic number, form the SSSR set.
    """
    n = len(mol.atoms)
    adj = mol.adjacency
    # indexed adjacency for the bridge DFS (avoid O(m) bond lookups)
    iadj: dict[int, list[tuple[int, int]]] = {i: [] for i in range(n)}
    for bi, b in enumerate(mol.bonds):
        iadj[b.a].append((b.b, bi))
        iadj[b.b].append((b.a, bi))
    # --- bridges via iterative DFS (Tarjan low-link on edges)
    visited = [False] * n
    disc = [0] * n
    low = [0] * n
    timer = [0]
    bridges: set[int] = set()
    for root in range(n):
        if visited[root]:
            continue
        # stack entries: (node, parent_bond_index, neighbor_iterator_state)
        stack = [(root, -1, iter(iadj[root]))]
        visited[root] = True
        timer[0] += 1
        disc[root] = low[root] = timer[0]
        while stack:
            node, pbond, it = stack[-1]
            advanced = False
            for nb, bidx in it:
                if bidx == pbond:
                    continue
                if not visited[nb]:
                    visited[nb] = True
                    timer[0] += 1
                    disc[nb] = low[nb] = timer[0]
                    stack.append((nb, bidx, iter(iadj[nb])))
                    advanced = True
                    break
                low[node] = min(low[node], disc[nb])
            if not advanced:
                stack.pop()
                if stack:
                    parent = stack[-1][0]
                    low[parent] = min(low[parent], low[node])
                    if low[node] > disc[parent]:
                        bridges.add(pbond)
    for bi, b in enumerate(mol.bonds):
        b.in_ring = bi not in bridges
    for b in mol.bonds:
        if b.in_ring:
            mol.atoms[b.a].in_ring = True
            mol.atoms[b.b].in_ring = True
    # --- smallest cycle through each ring bond (BFS w/o that bond)
    cycles: list[tuple[int, ...]] = []
    seen: set[frozenset[int]] = set()
    for bi, b in enumerate(mol.bonds):
        if not b.in_ring:
            continue
        path = _shortest_path(mol, adj, b.a, b.b, skip_bond=b)
        if path is None:
            continue
        cyc = tuple(path)
        key = frozenset(cyc)
        if key not in seen:
            seen.add(key)
            cycles.append(cyc)
    cycles.sort(key=len)
    n_rings = len(mol.bonds) - n + _n_components(mol, adj)
    # greedy edge-cover selection, smallest rings first (SSSR approximation)
    chosen: list[list[int]] = []
    covered: set[frozenset[int]] = set()
    for cyc in cycles:
        edges = {
            frozenset((cyc[i], cyc[(i + 1) % len(cyc)])) for i in range(len(cyc))
        }
        if not edges <= covered:
            chosen.append(list(cyc))
            covered |= edges
        if len(chosen) >= n_rings:
            break
    mol.rings = chosen


def _n_components(mol: Mol, adj) -> int:
    n = len(mol.atoms)
    seen = [False] * n
    comps = 0
    for r in range(n):
        if seen[r]:
            continue
        comps += 1
        stack = [r]
        seen[r] = True
        while stack:
            x = stack.pop()
            for nb, _ in adj[x]:
                if not seen[nb]:
                    seen[nb] = True
                    stack.append(nb)
    return comps


def _shortest_path(mol: Mol, adj, src: int, dst: int, skip_bond: Bond):
    """BFS shortest path src→dst avoiding skip_bond; returns atom list."""
    from collections import deque

    prev = {src: None}
    q = deque([src])
    while q:
        x = q.popleft()
        if x == dst:
            path = []
            while x is not None:
                path.append(x)
                x = prev[x]
            return path
        for nb, bond in adj[x]:
            if bond is skip_bond or nb in prev:
                continue
            prev[nb] = x
            q.append(nb)
    return None


def _aromatize_kekule(mol: Mol) -> None:
    """Hückel-style aromatization of Kekulé-written rings, so
    ``C1=CC=CC=C1`` perceives like ``c1ccccc1`` and Kekulé caffeine like
    aromatic caffeine. A 5- or 6-membered SSSR ring of C/N/O/S/P becomes
    aromatic when every member is sp2-capable and the π count satisfies
    4n+2:

    - atom with a double bond to another RING atom (this or a fused
      ring) → contributes 1 π electron;
    - atom with an exocyclic double bond to a non-ring atom (carbonyl
      C) → contributes 0 (still sp2);
    - heteroatom (N/O/S/P) with only single bonds → lone pair, 2 π;
    - carbon with only single bonds → sp3 → ring not aromatic.

    Charged rings (tropylium, cyclopentadienyl) are left non-aromatic —
    a documented scope boundary, not silently wrong."""
    bond_by_pair = {frozenset((b.a, b.b)): b for b in mol.bonds}
    double_to_ring: set[int] = set()
    exo_double: set[int] = set()
    for b in mol.bonds:
        if b.order == 2:
            a_ring, b_ring = mol.atoms[b.a].in_ring, mol.atoms[b.b].in_ring
            if a_ring and b_ring:
                double_to_ring.add(b.a)
                double_to_ring.add(b.b)
            else:
                if a_ring:
                    exo_double.add(b.a)
                if b_ring:
                    exo_double.add(b.b)
    for ring in mol.rings:
        k = len(ring)
        if k not in (5, 6):
            continue
        rbonds = [
            bond_by_pair[frozenset((ring[i], ring[(i + 1) % k]))] for i in range(k)
        ]
        if all(b.aromatic for b in rbonds):
            continue  # already aromatic from notation
        if not all(mol.atoms[a].symbol in ("C", "N", "O", "S", "P") for a in ring):
            continue
        if any(mol.atoms[a].charge != 0 for a in ring):
            continue
        pi = 0
        ok = True
        for a in ring:
            atom = mol.atoms[a]
            if a in double_to_ring or atom.aromatic:
                pi += 1
            elif a in exo_double:
                pi += 0
            elif atom.symbol in ("N", "O", "S", "P"):
                pi += 2
            else:  # sp3 carbon
                ok = False
                break
        if ok and pi % 4 == 2:
            for b in rbonds:
                b.aromatic = True
                b.order = 1
            for a in ring:
                mol.atoms[a].aromatic = True


def _demote_carbonyl_rings(mol: Mol) -> None:
    """RDKit-model alignment: a written-aromatic ring containing an atom
    with an EXOCYCLIC double bond (c(=O), c(=N)…) is not aromatic in the
    perception RDKit/Cactvs apply (caffeine's pyrimidinedione ring, uracil,
    quinones, 2-pyridone). Demote such rings; atom/bond aromatic flags
    become the union over the remaining aromatic rings (fused systems keep
    shared atoms aromatic — caffeine's imidazole ring survives).

    Runs AFTER implicit-H assignment: hydrogen counts derive from the
    notation as written (correct either way), while the flags feed
    classification (TPSA atom typing, aromatic-ring counts, CSP3)."""
    exo_double = set()
    for b in mol.bonds:
        if not b.in_ring and not b.aromatic and b.order == 2:
            exo_double.add(b.a)
            exo_double.add(b.b)
    bond_by_pair = {frozenset((b.a, b.b)): b for b in mol.bonds}
    aromatic_atoms: set[int] = set()
    aromatic_bonds: set[frozenset[int]] = set()
    any_written_aromatic = any(b.aromatic for b in mol.bonds)
    if not any_written_aromatic:
        return
    for ring in mol.rings:
        k = len(ring)
        pairs = [frozenset((ring[i], ring[(i + 1) % k])) for i in range(k)]
        bonds = [bond_by_pair.get(p) for p in pairs]
        if not all(b is not None and b.aromatic for b in bonds):
            continue
        if any(a in exo_double for a in ring):
            continue  # demoted: carbonyl-bearing ring
        aromatic_atoms.update(ring)
        aromatic_bonds.update(pairs)
    for b in mol.bonds:
        if b.aromatic and frozenset((b.a, b.b)) not in aromatic_bonds:
            b.aromatic = False
            b.demoted_aromatic = True
    for a in mol.atoms:
        if a.aromatic and a.idx not in aromatic_atoms:
            a.aromatic = False
            a.demoted_aromatic = True


def _assign_implicit_h(mol: Mol) -> None:
    """Implicit hydrogens per organic-subset valence rules.

    Bracket atoms use their explicit H count verbatim. Organic-subset
    atoms get h = v - bondsum where v is the smallest allowed valence
    ≥ bondsum (charge-adjusted: N+ → 4, O- → 1, ...). Aromatic atoms add
    one unit of used valence for the delocalized π bond when the Kekulé
    structure forces them a double bond: always for aromatic C (benzene
    c: 2+1 → 1 H; substituted c: 3+1 → 0 H), and for 2-connected aromatic
    N/P (pyridine n: 2+1 → 0 H) — but NOT for 3-connected aromatic N
    (pyrrole-type n(C) as in caffeine: 3 σ bonds, 0 H; the spec requires
    [nH] when such a nitrogen carries a hydrogen) and not for aromatic
    O/S (2-valent pyran/thiophene type)."""
    bondsum = [0.0] * len(mol.atoms)
    degree = [0] * len(mol.atoms)
    for b in mol.bonds:
        o = 1 if b.aromatic else b.order
        bondsum[b.a] += o
        bondsum[b.b] += o
        degree[b.a] += 1
        degree[b.b] += 1
    for atom in mol.atoms:
        if atom.from_bracket:
            atom.h_count = atom.explicit_h or 0
            continue
        used = bondsum[atom.idx]
        if atom.aromatic and (
            atom.symbol == "C"
            or (atom.symbol in ("N", "P") and degree[atom.idx] == 2)
        ):
            used += 1
        valences = DEFAULT_VALENCES.get(atom.symbol)
        if valences is None:
            atom.h_count = 0
            continue
        # charge adjustment: +1 on N/P raises capacity, -1 lowers; on
        # O/S/halogens -1 lowers; C+ and C- both lower available valence
        adj_valences = []
        for v in valences:
            if atom.symbol in ("N", "P", "B"):
                adj_valences.append(v + atom.charge)
            elif atom.symbol == "C":
                adj_valences.append(v - abs(atom.charge))
            else:  # O, S, halogens
                adj_valences.append(v + atom.charge)
        v = next((x for x in adj_valences if x >= used), None)
        atom.h_count = max(0, int(round(v - used))) if v is not None else 0


def mol_formula_weight(mol: Mol) -> float:
    """Average molecular weight (standard atomic weights + 1.008 per H)."""
    total = 0.0
    for a in mol.atoms:
        total += ATOMIC_MASS.get(a.symbol, 0.0)
        total += a.h_count * ATOMIC_MASS["H"]
    return total
