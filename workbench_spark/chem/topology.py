"""Topological descriptors: Kier-Hall connectivity (Chi), Kappa shape,
carbon types, constitutional counts, acid/base group counts.

These are the Mordred blocks the reference's descriptor stage imports
(``mol_descriptors.py:100``: ``from mordred import AcidBase, Aromatic,
Constitutional, Chi, CarbonTypes``), computed from the pure-Python graph
with the published formulas:

- **Chi** (Randić 1975; Kier & Hall 1986): χ0 = Σ δᵢ^-½ over atoms,
  χ1 = Σ (δᵢδⱼ)^-½ over bonds, with δ = heavy-atom degree; the valence
  variants use δv = Zv − h for second-row atoms and (Zv − h)/(Z − Zv − 1)
  for higher rows.
- **Kappa** (Kier 1985, the UNmodified shape indices — RDKit's Kappa1-3
  are the Hall-Kier α-modified forms, documented difference):
  κ1 = A(A−1)²/P1², κ2 = (A−1)(A−2)²/P2², with Pk = number of k-bond
  paths.
- **Carbon types**: counts of primary/secondary/tertiary/quaternary sp3
  carbons and aromatic/sp2/sp carbons.
- **Acid/base groups**: pattern counts on the graph — carboxylic acids,
  phenols, primary/secondary/tertiary amines — the classic ADMET
  ionization-state features.

Every value is exact for the stated definition; golden tests pin
hand-computed examples (tests/test_chem_engine.py).
"""

from __future__ import annotations

from workbench_spark.chem.smiles import Mol

# valence electrons for δv
_ZV = {"B": 3, "C": 4, "N": 5, "O": 6, "F": 7, "P": 5, "S": 6,
       "Cl": 7, "Br": 7, "I": 7, "Si": 4}
_Z = {"B": 5, "C": 6, "N": 7, "O": 8, "F": 9, "Si": 14, "P": 15,
      "S": 16, "Cl": 17, "Br": 35, "I": 53}


def _heavy_degrees(mol: Mol) -> list[int]:
    deg = [0] * len(mol.atoms)
    for b in mol.bonds:
        deg[b.a] += 1
        deg[b.b] += 1
    return deg


def _valence_deltas(mol: Mol) -> list[float]:
    out = []
    for a in mol.atoms:
        zv = _ZV.get(a.symbol)
        z = _Z.get(a.symbol)
        if zv is None or z is None:
            out.append(0.0)
            continue
        if z <= 10:  # second row: δv = Zv - h
            out.append(float(zv - a.h_count))
        else:
            out.append((zv - a.h_count) / (z - zv - 1.0))
    return out


def chi_indices(mol: Mol) -> dict[str, float]:
    """χ0, χ1 (simple) and χ0v, χ1v (valence)."""
    deg = _heavy_degrees(mol)
    dv = _valence_deltas(mol)
    chi0 = sum(d ** -0.5 for d in deg if d > 0)
    chi1 = sum(
        (deg[b.a] * deg[b.b]) ** -0.5
        for b in mol.bonds
        if deg[b.a] > 0 and deg[b.b] > 0
    )
    chi0v = sum(v ** -0.5 for v in dv if v > 0)
    chi1v = sum(
        (dv[b.a] * dv[b.b]) ** -0.5
        for b in mol.bonds
        if dv[b.a] > 0 and dv[b.b] > 0
    )
    return {
        "chi0": round(chi0, 6), "chi1": round(chi1, 6),
        "chi0v": round(chi0v, 6), "chi1v": round(chi1v, 6),
    }


def _count_paths(mol: Mol, length: int) -> int:
    """Simple paths with ``length`` bonds (unordered endpoints)."""
    adj: dict[int, list[int]] = {i: [] for i in range(len(mol.atoms))}
    for b in mol.bonds:
        adj[b.a].append(b.b)
        adj[b.b].append(b.a)
    count = 0

    def walk(node: int, remaining: int, visited: tuple[int, ...]):
        nonlocal count
        if remaining == 0:
            count += 1
            return
        for nb in adj[node]:
            if nb not in visited:
                walk(nb, remaining - 1, visited + (nb,))

    for start in range(len(mol.atoms)):
        walk(start, length, (start,))
    return count // 2  # each path counted from both ends


def kappa_indices(mol: Mol) -> dict[str, float]:
    """Kier κ1/κ2/κ3 shape indices (unmodified 1985 forms)."""
    a = len(mol.atoms)
    p1 = len(mol.bonds)
    out = {"kappa1": 0.0, "kappa2": 0.0, "kappa3": 0.0}
    if p1 > 0:
        out["kappa1"] = round(a * (a - 1) ** 2 / p1 ** 2, 6)
    p2 = _count_paths(mol, 2)
    if p2 > 0 and a >= 3:
        out["kappa2"] = round((a - 1) * (a - 2) ** 2 / p2 ** 2, 6)
    p3 = _count_paths(mol, 3)
    if p3 > 0 and a >= 4:
        if a % 2:  # Kier's odd/even split for the 3-path index
            out["kappa3"] = round((a - 1) * (a - 3) ** 2 / p3 ** 2, 6)
        else:
            out["kappa3"] = round((a - 3) * (a - 2) ** 2 / p3 ** 2, 6)
    return out


#: Hall-Kier α contributions (Kier & Hall 1986; reproduced across the
#: descriptor literature/RDKit docs) — covalent-radius ratio vs Csp3.
_ALPHA = {
    ("C", "sp3"): 0.0, ("C", "sp2"): -0.13, ("C", "sp"): -0.22,
    ("N", "sp3"): -0.04, ("N", "sp2"): -0.20, ("N", "sp"): -0.29,
    ("O", "sp3"): -0.04, ("O", "sp2"): -0.20,
    ("F", "sp3"): -0.07, ("F", "sp2"): -0.07,
    ("Cl", "sp3"): 0.29, ("Cl", "sp2"): 0.29,
    ("Br", "sp3"): 0.48, ("Br", "sp2"): 0.48,
    ("I", "sp3"): 0.73, ("I", "sp2"): 0.73,
    ("S", "sp3"): 0.35, ("S", "sp2"): 0.35,
    ("P", "sp3"): 0.43, ("P", "sp2"): 0.43,
}


def _atom_hyb(mol: Mol, idx: int) -> str:
    n_double = 0
    for _, b in mol.neighbors(idx):
        if b.aromatic or b.demoted_aromatic:
            return "sp2"
        if b.order == 3:
            return "sp"
        if b.order == 2:
            n_double += 1
    if n_double >= 2:
        return "sp"
    return "sp2" if n_double == 1 else "sp3"


def hall_kier_alpha(mol: Mol) -> float | None:
    """Σ per-atom α; None when any atom lacks a published contribution
    (NULL downstream — never a silent 0 for an exotic element)."""
    total = 0.0
    for i, a in enumerate(mol.atoms):
        c = _ALPHA.get((a.symbol, _atom_hyb(mol, i)))
        if c is None:
            return None
        total += c
    return total


def kappa_alpha_indices(mol: Mol) -> dict[str, float | None]:
    """Hall-Kier α-modified κ1-κ3 — the forms RDKit's Kappa1-3 compute:
    κ1α = (A+α)(A+α−1)²/(P1+α)², κ2α = (A+α−1)(A+α−2)²/(P2+α)²,
    κ3α with Kier's odd/even split on A. Golden-tested against the
    hand-derivable benzene values (α = −0.78 → κ1α 3.412, κ2α 1.606)."""
    out: dict[str, float | None] = {
        "hallkieralpha": None, "kappa1a": None, "kappa2a": None, "kappa3a": None,
    }
    alpha = hall_kier_alpha(mol)
    if alpha is None:
        return out
    out["hallkieralpha"] = round(alpha, 6)
    a = len(mol.atoms)
    p1 = len(mol.bonds)
    if p1 + alpha > 0:
        out["kappa1a"] = round((a + alpha) * (a + alpha - 1) ** 2 / (p1 + alpha) ** 2, 6)
    p2 = _count_paths(mol, 2)
    if p2 + alpha > 0 and a >= 3:
        out["kappa2a"] = round(
            (a + alpha - 1) * (a + alpha - 2) ** 2 / (p2 + alpha) ** 2, 6
        )
    p3 = _count_paths(mol, 3)
    if p3 + alpha > 0 and a >= 4:
        if a % 2:
            out["kappa3a"] = round(
                (a + alpha - 1) * (a + alpha - 3) ** 2 / (p3 + alpha) ** 2, 6
            )
        else:
            out["kappa3a"] = round(
                (a + alpha - 3) * (a + alpha - 2) ** 2 / (p3 + alpha) ** 2, 6
            )
    return out


def _enumerate_paths(mol: Mol, length: int) -> list[tuple[int, ...]]:
    """All simple paths with ``length`` bonds, each reported once."""
    adj: dict[int, list[int]] = {i: [] for i in range(len(mol.atoms))}
    for b in mol.bonds:
        adj[b.a].append(b.b)
        adj[b.b].append(b.a)
    paths: list[tuple[int, ...]] = []

    def walk(node: int, remaining: int, visited: tuple[int, ...]):
        if remaining == 0:
            if visited[0] < visited[-1]:  # canonical direction only
                paths.append(visited)
            return
        for nb in adj[node]:
            if nb not in visited:
                walk(nb, remaining - 1, visited + (nb,))

    for start in range(len(mol.atoms)):
        walk(start, length, (start,))
    return paths


def higher_chi_indices(mol: Mol) -> dict[str, float]:
    """Path connectivity orders 2-4 (Kier & Hall 1986): χk = Σ over
    k-bond simple paths of (Π δ)^-½, simple and valence variants —
    the Mordred Xp-2/3/4 d and dv columns."""
    deg = _heavy_degrees(mol)
    dv = _valence_deltas(mol)
    out: dict[str, float] = {}
    for k in (2, 3, 4):
        simple = 0.0
        valence = 0.0
        for path in _enumerate_paths(mol, k):
            prod_s = 1.0
            prod_v = 1.0
            ok_s = ok_v = True
            for i in path:
                if deg[i] <= 0:
                    ok_s = False
                if dv[i] <= 0:
                    ok_v = False
                prod_s *= deg[i] if deg[i] > 0 else 1.0
                prod_v *= dv[i] if dv[i] > 0 else 1.0
            if ok_s:
                simple += prod_s ** -0.5
            if ok_v:
                valence += prod_v ** -0.5
        out[f"chi{k}"] = round(simple, 6)
        out[f"chi{k}v"] = round(valence, 6)
    return out


def carbon_types(mol: Mol) -> dict[str, int]:
    """sp3 substitution counts + aromatic/unsaturated carbon counts."""
    deg = _heavy_degrees(mol)
    counts = dict.fromkeys(
        ("c1sp3", "c2sp3", "c3sp3", "c4sp3", "c_aromatic", "c_sp2", "c_sp"), 0
    )
    orders: dict[int, list[float]] = {i: [] for i in range(len(mol.atoms))}
    for b in mol.bonds:
        o = 1.5 if b.aromatic else float(b.order)
        orders[b.a].append(o)
        orders[b.b].append(o)
    for atom in mol.atoms:
        if atom.symbol != "C":
            continue
        if atom.aromatic or atom.demoted_aromatic:
            counts["c_aromatic"] += 1
        elif any(o == 3 for o in orders[atom.idx]):
            counts["c_sp"] += 1
        elif any(o == 2 for o in orders[atom.idx]):
            counts["c_sp2"] += 1
        else:
            d = min(deg[atom.idx], 4)
            if d >= 1:
                counts[f"c{d}sp3"] += 1
    return counts


def constitutional(mol: Mol) -> dict[str, int | float]:
    """Element/bond composition counts (Mordred Constitutional block)."""
    n_heavy = len(mol.atoms)
    n_h = sum(a.h_count for a in mol.atoms)
    by_el: dict[str, int] = {}
    for a in mol.atoms:
        by_el[a.symbol] = by_el.get(a.symbol, 0) + 1
    n_arom_bonds = sum(1 for b in mol.bonds if b.aromatic)
    return {
        "n_atoms": n_heavy + n_h,
        "n_heavy": n_heavy,
        "n_h": n_h,
        "n_bonds": len(mol.bonds),
        "n_single_bonds": sum(
            1 for b in mol.bonds if b.order == 1 and not b.aromatic
        ),
        "n_double_bonds": sum(1 for b in mol.bonds if b.order == 2),
        "n_triple_bonds": sum(1 for b in mol.bonds if b.order == 3),
        "n_aromatic_bonds": n_arom_bonds,
        "n_c": by_el.get("C", 0),
        "n_n": by_el.get("N", 0),
        "n_o": by_el.get("O", 0),
        "n_s": by_el.get("S", 0),
        "n_p": by_el.get("P", 0),
        "n_halogen": sum(by_el.get(x, 0) for x in ("F", "Cl", "Br", "I")),
        "n_ring_atoms": sum(1 for a in mol.atoms if a.in_ring),
    }


def acid_base_groups(mol: Mol) -> dict[str, int]:
    """ADMET ionization-group counts (Mordred AcidBase block semantics):

    - ``n_carboxylic_acid``: C(=O)OH — carbon with =O and -OH;
    - ``n_phenol``: OH on an aromatic carbon;
    - ``n_amine_primary/secondary/tertiary``: non-aromatic, non-amide
      nitrogens by substitution (amide N excluded: N bonded to C=O).
    """
    adj = mol.adjacency
    counts = dict.fromkeys(
        (
            "n_carboxylic_acid", "n_phenol", "n_amine_primary",
            "n_amine_secondary", "n_amine_tertiary",
        ),
        0,
    )
    # carbons with exocyclic =O (carbonyl) for amide/acid detection
    carbonyl_c: set[int] = set()
    for b in mol.bonds:
        if b.order == 2 and not b.aromatic:
            for x, y in ((b.a, b.b), (b.b, b.a)):
                if mol.atoms[x].symbol == "C" and mol.atoms[y].symbol == "O":
                    carbonyl_c.add(x)
    for atom in mol.atoms:
        if atom.symbol == "C" and atom.idx in carbonyl_c:
            has_oh = any(
                mol.atoms[nb].symbol == "O"
                and b.order == 1
                and mol.atoms[nb].h_count >= 1
                for nb, b in adj[atom.idx]
            )
            if has_oh:
                counts["n_carboxylic_acid"] += 1
        if atom.symbol == "O" and atom.h_count >= 1:
            if any(mol.atoms[nb].aromatic for nb, _ in adj[atom.idx]):
                counts["n_phenol"] += 1
        if (
            atom.symbol == "N"
            and not atom.aromatic
            and atom.charge == 0
            and all(b.order == 1 and not b.aromatic for _, b in adj[atom.idx])
            and not any(nb in carbonyl_c for nb, _ in adj[atom.idx])
        ):
            d = len(adj[atom.idx])
            if d == 1:
                counts["n_amine_primary"] += 1
            elif d == 2:
                counts["n_amine_secondary"] += 1
            elif d == 3:
                counts["n_amine_tertiary"] += 1
    return counts


def topology_descriptors(mol: Mol) -> dict[str, float | int]:
    """The full topology block (flat dict, stable key order)."""
    out: dict[str, float | int] = {}
    out.update(chi_indices(mol))
    out.update(higher_chi_indices(mol))
    out.update(kappa_indices(mol))
    out.update(kappa_alpha_indices(mol))
    out.update(carbon_types(mol))
    out.update(constitutional(mol))
    out.update(acid_base_groups(mol))
    out.update(distance_indices(mol))
    return out


def _distance_matrix(mol: Mol) -> list[list[int]]:
    """All-pairs heavy-atom graph distances via BFS per atom (molecules
    are small; O(n·m) total)."""
    from collections import deque

    n = len(mol.atoms)
    adj = [[] for _ in range(n)]
    for b in mol.bonds:
        adj[b.a].append(b.b)
        adj[b.b].append(b.a)
    dist = [[-1] * n for _ in range(n)]
    for s in range(n):
        dist[s][s] = 0
        q = deque([s])
        while q:
            x = q.popleft()
            for nb in adj[x]:
                if dist[s][nb] < 0:
                    dist[s][nb] = dist[s][x] + 1
                    q.append(nb)
    return dist


def distance_indices(mol: Mol) -> dict[str, float]:
    """Distance- and degree-based indices (published closed forms):

    - ``wiener``: Σ over atom pairs of graph distance (Wiener 1947);
    - ``zagreb1`` = Σ δᵢ², ``zagreb2`` = Σ_bonds δᵢδⱼ (Gutman 1972);
    - ``balaban_j`` = m/(γ+1) Σ_bonds (sᵢsⱼ)^-½ with sᵢ the distance sum
      of atom i and γ the cyclomatic number (Balaban 1982) — the classic
      "branching" index.
    Disconnected structures (salts) get wiener/balaban_j over each
    component's finite distances only."""
    deg = _heavy_degrees(mol)
    dist = _distance_matrix(mol)
    n = len(mol.atoms)
    wiener = 0
    for i in range(n):
        for j in range(i + 1, n):
            if dist[i][j] > 0:
                wiener += dist[i][j]
    z1 = sum(d * d for d in deg)
    z2 = sum(deg[b.a] * deg[b.b] for b in mol.bonds)
    s = [sum(x for x in row if x > 0) for row in dist]
    m = len(mol.bonds)
    gamma = m - n + mol.n_components if n else 0
    bj = 0.0
    if m > 0:
        acc = 0.0
        for b in mol.bonds:
            if s[b.a] > 0 and s[b.b] > 0:
                acc += (s[b.a] * s[b.b]) ** -0.5
        bj = m / (gamma + 1.0) * acc
    return {
        "wiener": wiener,
        "zagreb1": z1,
        "zagreb2": z2,
        "balaban_j": round(bj, 6),
    }
