"""Toxicity flags from the molecular graph — C6 second half.

Mirrors the reference's detection logic
(``utils/chem_utils/toxicity.py:36-150``) without RDKit: the element
rules port directly, and each SMARTS alert the reference compiles is
re-expressed as an explicit graph predicate (the patterns are small,
fixed motifs — a hand matcher is exact for them):

- heavy metals (broad filter) and always-toxic elements;
- halogen over-substitution score with the size-scaled threshold;
- positively charged nitrogen with the benign quaternary-ammonium
  exemption;
- functional-group alerts: dithiocarbamate C(=S)N, trichloromethyl
  C(Cl)(Cl)(Cl), quaternary ammonium N+(C)(C)(C)(C), phosphate ester
  P(=O)(O)(O)O, halogenated carbonyl C(=O)-C-X, thiourea-like S=C(N)N,
  tri-chlorinated aromatic ring, diselenide Se-Se, chromium(VI)
  Cr(=O)(=O)=O, phosphonium P+, arsenic oxide As(=O)(=O)OH;
- the RDKit functional-group-hierarchy alerts the reference also scans
  (toxicity.py:131-137): nitro, azide, alcohol, aldehyde, halogen,
  terminal alkyne;
- the phenol/catechol exempt pattern (toxicity.py:28-31,147-150):
  an aromatic ring bearing two ADJACENT hydroxyls voids ALL group
  alerts (reference returns None for such molecules).

The two reference patterns tied to full aromatic-substructure SMARTS
semantics (chlorobenzene/phenyl thiocarbamates) are approximated by the
thiourea/dithiocarbamate motifs that subsume their toxicophore — a
documented simplification, not a silent gap. The reference's separate
``[N+]`` group append duplicates the ``N+`` element flag (same benign
exemption) and is covered by ``toxic_elements`` here.
"""

from __future__ import annotations

from workbench_spark.chem.smiles import Mol

HEAVY_METALS = {"Zn", "Cu", "Fe", "Mn", "Co", "Pb", "Hg", "Cd", "As"}
ALWAYS_TOXIC = {"Pb", "Hg", "Cd", "As", "Be", "Tl", "Sb"}
HALOGENS = {"F", "Cl", "Br", "I"}


def contains_heavy_metals(mol: Mol) -> bool:
    return any(a.symbol in HEAVY_METALS for a in mol.atoms)


def halogen_toxicity_score(mol: Mol) -> tuple[int, int]:
    """(halogen_count, threshold): threshold = max(2, 20% of heavy atoms)."""
    count = sum(1 for a in mol.atoms if a.symbol in HALOGENS)
    threshold = max(2, int(len(mol.atoms) * 0.2))
    return count, threshold


def _neighbor_symbols(mol: Mol, idx: int) -> list[tuple[str, int, bool]]:
    """[(symbol, bond_order, aromatic)] for each neighbor."""
    out = []
    for nb, b in mol.adjacency[idx]:
        out.append((mol.atoms[nb].symbol, b.order, b.aromatic))
    return out


def _is_benign_quaternary(mol: Mol, idx: int) -> bool:
    """N+ bonded to four carbons (choline-like) — the reference's
    exemption pattern [N+](C)(C)(C)C."""
    nbrs = _neighbor_symbols(mol, idx)
    return len(nbrs) == 4 and all(s == "C" for s, _, _ in nbrs)


def toxic_elements(mol: Mol) -> list[str] | None:
    """Element-level toxicity (toxicity.py:75-113): always-toxic metals,
    charged nitrogen (minus benign quats), excessive halogenation."""
    found: set[str] = set()
    hal_count, hal_threshold = halogen_toxicity_score(mol)
    for a in mol.atoms:
        if a.symbol in ALWAYS_TOXIC:
            found.add(a.symbol)
        if a.symbol == "N" and a.charge > 0:
            if not _is_benign_quaternary(mol, a.idx):
                found.add("N+")
        if a.symbol in HALOGENS and hal_count > hal_threshold:
            found.add(a.symbol)
    return sorted(found) if found else None


def _is_hydroxyl(mol: Mol, idx: int) -> bool:
    """-OH: oxygen carrying a hydrogen with exactly one heavy neighbor."""
    a = mol.atoms[idx]
    return a.symbol == "O" and a.h_count >= 1 and len(mol.adjacency[idx]) == 1


def has_catechol_exemption(mol: Mol) -> bool:
    """Reference exempt pattern c1ccc(O)c(O)c1 (toxicity.py:28-31): an
    aromatic ring with hydroxyls on two ADJACENT ring atoms (catechol /
    ortho-diphenol). When present the reference returns None from
    toxic_groups regardless of other matches."""
    adj = mol.adjacency
    for ring in mol.rings:
        if not all(
            mol.atoms[i].aromatic or mol.atoms[i].demoted_aromatic for i in ring
        ):
            continue
        k = len(ring)
        has_oh = [
            any(
                _is_hydroxyl(mol, nb) and b.order == 1
                for nb, b in adj[ring[i]]
                if nb not in ring
            )
            for i in range(k)
        ]
        if any(has_oh[i] and has_oh[(i + 1) % k] for i in range(k)):
            return True
    return False


def toxic_groups(mol: Mol) -> list[str] | None:
    """Functional-group alerts (toxicity.py:115-150: RDKit FG-hierarchy
    set + custom SMARTS set) as graph predicates. Returns sorted alert
    names, or None when nothing matches OR the catechol exemption fires."""
    found: set[str] = set()
    adj = mol.adjacency
    for a in mol.atoms:
        nbrs = _neighbor_symbols(mol, a.idx)
        if a.symbol == "C":
            has_double_s = any(s == "S" and o == 2 for s, o, _ in nbrs)
            n_single_n = sum(1 for s, o, ar in nbrs if s == "N" and o == 1 and not ar)
            if has_double_s and n_single_n >= 1:
                found.add("dithiocarbamate")
            if has_double_s and n_single_n >= 2:
                found.add("thiourea")
            n_cl = sum(1 for s, o, _ in nbrs if s == "Cl" and o == 1)
            if n_cl >= 3:
                found.add("trichloromethyl")
            # halogenated carbonyl: C(=O) whose alpha carbon carries X
            if any(s == "O" and o == 2 for s, o, _ in nbrs):
                for nb, b in adj[a.idx]:
                    if mol.atoms[nb].symbol == "C" and b.order == 1:
                        if any(
                            s in HALOGENS
                            for s, _, _ in _neighbor_symbols(mol, nb)
                        ):
                            found.add("halogenated_carbonyl")
            # aldehyde [CX3H1](=O)[#6]: carbonyl C with exactly one H
            if (
                a.h_count == 1
                and not a.aromatic
                and any(s == "O" and o == 2 for s, o, _ in nbrs)
                and any(s == "C" for s, o, _ in nbrs)
            ):
                found.add("aldehyde")
            # terminal alkyne C#C-H: the triple-bond partner must be
            # CARBON (the RDKit TerminalAlkyne pattern is [C]#[CH]) —
            # requiring only "any triple bond" would misflag nitriles
            # written H-C#N
            if a.h_count >= 1 and any(
                o == 3 and s == "C" for s, o, _ in nbrs
            ):
                found.add("terminal_alkyne")
        elif a.symbol == "N":
            if a.charge == 1 and len(nbrs) == 4 and all(s == "C" for s, _, _ in nbrs):
                found.add("quaternary_ammonium")
            # nitro: N bonded to two oxygens as =O/=O or =O/[O-]
            o_bonds = [
                (o, mol.atoms[nb].charge)
                for nb, b in adj[a.idx]
                if mol.atoms[nb].symbol == "O"
                and len(adj[nb]) == 1
                for o in [b.order]
            ]
            if len(o_bonds) >= 2 and (
                sum(1 for o, _ in o_bonds if o == 2) >= 2
                or (
                    any(o == 2 for o, _ in o_bonds)
                    and any(o == 1 and ch == -1 for o, ch in o_bonds)
                )
            ):
                found.add("nitro")
            # azide: three-N chain with cumulated bonds (N=N=N / N-N#N)
            if len(nbrs) == 2 and all(s == "N" for s, _, _ in nbrs):
                orders = sorted(o for _, o, _ in nbrs)
                if orders in ([2, 2], [1, 3]):
                    found.add("azide")
        elif a.symbol == "P":
            n_double_o = sum(1 for s, o, _ in nbrs if s == "O" and o == 2)
            n_single_o = sum(1 for s, o, _ in nbrs if s == "O" and o == 1)
            if n_double_o >= 1 and n_single_o >= 3:
                found.add("phosphate_ester")
            # phosphonium [P+](C*)(C*)(C*)(C*)
            if a.charge == 1 and sum(1 for s, _, _ in nbrs if s == "C") >= 4:
                found.add("phosphonium")
        elif a.symbol == "Se":
            if any(s == "Se" for s, _, _ in nbrs):
                found.add("diselenide")
        elif a.symbol == "Cr":
            # chromium(VI) [Cr](=O)(=O)=O
            if sum(1 for s, o, _ in nbrs if s == "O" and o == 2) >= 3:
                found.add("chromium_vi")
        elif a.symbol == "As":
            # arsenic oxide [As](=O)(=O)-[OH]
            n_double_o = sum(1 for s, o, _ in nbrs if s == "O" and o == 2)
            has_oh = any(
                b.order == 1 and _is_hydroxyl(mol, nb) for nb, b in adj[a.idx]
            )
            if n_double_o >= 2 and has_oh:
                found.add("arsenic_oxide")
        elif a.symbol == "O":
            # alcohol (FG-hierarchy): aliphatic C-OH, carbonyl excluded
            if _is_hydroxyl(mol, a.idx):
                nb, b = adj[a.idx][0]
                c = mol.atoms[nb]
                if (
                    c.symbol == "C"
                    and not c.aromatic
                    and b.order == 1
                    and not any(
                        s in ("O", "N", "S") and o == 2
                        for s, o, _ in _neighbor_symbols(mol, nb)
                    )
                ):
                    found.add("alcohol")
        if a.symbol in HALOGENS and any(s == "C" for s, _, _ in nbrs):
            found.add("halogen")
    # tri-chlorinated aromatic ring: any SSSR ring with >=3 Cl substituents
    for ring in mol.rings:
        ring_set = set(ring)
        if not all(mol.atoms[i].aromatic or mol.atoms[i].demoted_aromatic for i in ring):
            continue
        n_cl = 0
        for i in ring:
            for nb, b in adj[i]:
                if nb not in ring_set and mol.atoms[nb].symbol == "Cl":
                    n_cl += 1
        if n_cl >= 3:
            found.add("trichloro_aromatic")
    if found and has_catechol_exemption(mol):
        return None
    return sorted(found) if found else None


def toxicity_flags(mol: Mol) -> dict:
    """Composite: the columns the tagging stage attaches."""
    elements = toxic_elements(mol)
    groups = toxic_groups(mol)
    hal_count, hal_threshold = halogen_toxicity_score(mol)
    return {
        "heavy_metals": contains_heavy_metals(mol),
        "toxic_elements": elements,
        "toxic_groups": groups,
        "halogen_count": hal_count,
        "halogen_threshold": hal_threshold,
        "is_toxic": bool(elements or groups),
    }
