"""V2000 mol-block parsing — the structural half of the SDF tier (S14).

The reference reads SDF records through RDKit (``utils/chem_utils/sdf.py``:
MolFromMolBlock → MolToSmiles). This module implements the same
conversion from scratch on the pure-Python graph:

- counts line + atom block (coordinates, symbols, old-style charge
  codes) + bond block (order, wedge flags) + ``M  CHG`` / ``M  ISO``
  property lines (which, per the CTfile spec, supersede the atom-block
  charge column entirely when present);
- explicit hydrogen atoms are folded into their heavy neighbor
  (RDKit ``removeHs=True`` behavior) but their coordinates are kept for
  stereo perception;
- **wedge bonds become tetrahedral parity**: for every atom that
  originates a wedge (stereo flag 1 = up/toward viewer, 6 = down), the
  signed volume of its neighbors — wedge ends displaced to z = ±1, the
  implicit H placed at the missing tetrahedral direction — is converted
  to the SMILES ``@``/``@@`` convention (looking from the first
  neighbor, remaining neighbors anticlockwise = ``@``). The resulting
  ``Atom.chiral`` + ``written_nbrs`` frame feeds ``chem.canon`` exactly
  like parsed SMILES stereo, so SDF-sourced molecules participate in
  stereo-aware canonical dedup (r3 VERDICT #8).

3D mol blocks (non-zero z coordinates) use the real coordinates
directly for the signed volume instead of wedge displacement; the wedge
flag still designates WHICH atoms are stereocenters (full wedge-free 3D
stereo perception needs CIP symmetry analysis, out of scope — the
boundary RDKit covers with AssignStereochemistryFrom3D).
"""

from __future__ import annotations

from workbench_spark.chem.smiles import (
    Atom,
    Bond,
    Mol,
    SmilesError,
    _perceive,
)

# old-style atom-block charge codes (column 36-39): 0 none, 1..3 = +3..+1,
# 4 = doublet radical (ignored), 5..7 = -1..-3
_CHARGE_CODES = {1: 3, 2: 2, 3: 1, 5: -1, 6: -2, 7: -3}


class MolfileError(SmilesError):
    """Raised on an unparseable mol block."""


def parse_molblock(block: str) -> Mol:
    """Parse a V2000 mol block into a perceived ``Mol`` (rings, implicit
    hydrogens, aromaticity — same post-parse pipeline as SMILES input).
    Raises MolfileError on malformed input."""
    lines = block.splitlines()
    if len(lines) < 4:
        raise MolfileError("mol block too short")
    counts = lines[3]
    try:
        n_atoms = int(counts[0:3])
        n_bonds = int(counts[3:6])
    except (ValueError, IndexError) as e:
        raise MolfileError(f"bad counts line: {counts!r}") from e
    if len(lines) < 4 + n_atoms + n_bonds:
        raise MolfileError("truncated atom/bond block")

    coords: list[tuple[float, float, float]] = []
    symbols: list[str] = []
    charges: list[int] = []
    for ln in lines[4 : 4 + n_atoms]:
        try:
            x, y, z = float(ln[0:10]), float(ln[10:20]), float(ln[20:30])
            sym = ln[31:34].strip()
            code = int(ln[36:39]) if ln[36:39].strip() else 0
        except (ValueError, IndexError) as e:
            raise MolfileError(f"bad atom line: {ln!r}") from e
        if not sym:
            raise MolfileError(f"bad atom line: {ln!r}")
        coords.append((x, y, z))
        symbols.append(sym)
        charges.append(_CHARGE_CODES.get(code, 0))

    bonds: list[tuple[int, int, int, int]] = []  # (a, b, order, wedge)
    for ln in lines[4 + n_atoms : 4 + n_atoms + n_bonds]:
        try:
            a = int(ln[0:3]) - 1
            b = int(ln[3:6]) - 1
            order = int(ln[6:9])
            wedge = int(ln[9:12]) if ln[9:12].strip() else 0
        except (ValueError, IndexError) as e:
            raise MolfileError(f"bad bond line: {ln!r}") from e
        if not (0 <= a < n_atoms and 0 <= b < n_atoms):
            raise MolfileError(f"bond endpoint out of range: {ln!r}")
        bonds.append((a, b, order, wedge))

    # property block: M  CHG / M  ISO supersede atom-block columns
    iso: dict[int, int] = {}
    chg_lines: list[tuple[int, int]] = []
    for ln in lines[4 + n_atoms + n_bonds :]:
        if ln.startswith("M  END"):
            break
        if ln.startswith(("M  CHG", "M  ISO")):
            fields = ln.split()
            n = int(fields[2])
            pairs = fields[3 : 3 + 2 * n]
            for i in range(n):
                idx = int(pairs[2 * i]) - 1
                val = int(pairs[2 * i + 1])
                if ln.startswith("M  CHG"):
                    chg_lines.append((idx, val))
                else:
                    iso[idx] = val
    if chg_lines:
        charges = [0] * n_atoms
        for idx, val in chg_lines:
            charges[idx] = val

    # fold PLAIN explicit hydrogens into their single heavy neighbor,
    # remembering coordinates for the stereo frame. An H carrying an
    # isotope label (deuterium/tritium) or a formal charge is chemically
    # distinct from an implicit H and stays a real atom (mirrors RDKit's
    # removeHs, which keeps isotopic/charged hydrogens) — folding it
    # would collapse D/T records into the protio dedup key and corrupt
    # the net formal charge.
    h_bond_count = [0] * n_atoms
    for a, b, _o, _w in bonds:
        h_bond_count[a] += 1
        h_bond_count[b] += 1
    is_h = [s == "H" for s in symbols]
    foldable = [
        is_h[i] and i not in iso and charges[i] == 0 and h_bond_count[i] == 1
        for i in range(n_atoms)
    ]
    h_partner: dict[int, list[int]] = {}  # heavy idx -> [H atom idx, ...]
    heavy_bonds = []
    wedges: dict[int, list[tuple[int, int]]] = {}  # origin old-idx -> [(end old-idx, ±1)]
    for a, b, order, wedge in bonds:
        if foldable[a] and not is_h[b] and order == 1:
            h_partner.setdefault(b, []).append(a)
        elif foldable[b] and not is_h[a] and order == 1:
            h_partner.setdefault(a, []).append(b)
            if wedge in (1, 6):  # wedge drawn from the heavy atom to its H
                wedges.setdefault(a, []).append((b, 1 if wedge == 1 else -1))
        else:
            # heavy-heavy bonds, plus bonds involving KEPT hydrogens
            # (isotopic/charged H, H-H as in molecular hydrogen, or an H
            # with multiple bonds — kept so the graph stays faithful)
            heavy_bonds.append((a, b, order, wedge))

    old_to_new: dict[int, int] = {}
    mol = Mol()
    for i in range(n_atoms):
        if is_h[i] and i in {h for hs in h_partner.values() for h in hs}:
            continue
        if is_h[i]:
            # lone hydrogen (e.g. H2, hydride): keep as a real atom
            pass
        a = Atom(symbol=symbols[i] if not is_h[i] else "H")
        a.charge = charges[i]
        if i in iso:
            a.isotope = iso[i]
        a.idx = len(mol.atoms)
        old_to_new[i] = a.idx
        mol.atoms.append(a)
    folded = {h for hs in h_partner.values() for h in hs}

    for a, b, order, wedge in heavy_bonds:
        mol.bonds.append(
            Bond(
                a=old_to_new[a],
                b=old_to_new[b],
                order=1 if order == 4 else order,
                aromatic=order == 4,
            )
        )
        if order == 4:
            mol.atoms[old_to_new[a]].aromatic = True
            mol.atoms[old_to_new[b]].aromatic = True
        if wedge in (1, 6):
            wedges.setdefault(a, []).append((b, 1 if wedge == 1 else -1))

    # component count (salts are separate fragments in one block)
    mol.n_components = _count_components(mol)
    _perceive(mol)

    # V2000 semantics: explicit hydrogens COUNT TOWARD valence and the
    # remaining valence still fills implicitly (a carbon drawn with one
    # explicit H and no other bonds is methane, not [CH]). _perceive's
    # valence fill already reserves slots for the folded Hs (their bonds
    # were removed, so they are free valence); the folded count only
    # matters when it EXCEEDS the default-valence fill (hypervalent
    # drawings like SH6) — hence max, never overwrite.
    for heavy, hs in h_partner.items():
        if heavy in old_to_new:
            at = mol.atoms[old_to_new[heavy]]
            at.h_count = max(at.h_count, len(hs))
    _assign_parity(mol, old_to_new, coords, wedges, h_partner, folded)
    return mol


def _count_components(mol: Mol) -> int:
    n = len(mol.atoms)
    if n == 0:
        return 0
    adj: dict[int, list[int]] = {i: [] for i in range(n)}
    for b in mol.bonds:
        adj[b.a].append(b.b)
        adj[b.b].append(b.a)
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
            for nb in adj[x]:
                if not seen[nb]:
                    seen[nb] = True
                    stack.append(nb)
    return comps


def _assign_parity(mol, old_to_new, coords, wedges, h_partner, folded):
    """Wedge flags → SMILES @/@@ parity in the written-neighbor frame.

    Convention check (matches chem.smiles/chem.canon): ``@`` means that
    looking FROM the first neighbor of the frame toward the center, the
    remaining neighbors appear anticlockwise — equivalently the signed
    volume (n2-n1)·((n3-n1)×(n4-n1)) is negative."""
    new_to_old = {v: k for k, v in old_to_new.items()}
    is_3d = any(abs(z) > 1e-4 for _, _, z in coords)
    for old_idx, wlist in wedges.items():
        if old_idx not in old_to_new:
            continue
        center = mol.atoms[old_to_new[old_idx]]
        nbrs = [nb for nb, _ in mol.adjacency[center.idx]]
        n_heavy = len(nbrs)
        if n_heavy + center.h_count != 4 or center.h_count > 1:
            continue  # only classic tetrahedral centers
        cx, cy, cz = coords[old_idx]
        pts: list[tuple[float, float, float]] = []
        frame: list = []
        zshift = {end: s for end, s in wlist}
        for nb in nbrs:
            ox = new_to_old[nb]
            x, y, z = coords[ox]
            if not is_3d:
                z = float(zshift.get(ox, 0))
            pts.append((x - cx, y - cy, z - cz))
            frame.append(nb)
        if center.h_count == 1:
            hs = [h for h in h_partner.get(old_idx, []) if h in folded]
            if hs and is_3d:
                x, y, z = coords[hs[0]]
                pts.append((x - cx, y - cy, z - cz))
            elif hs and not is_3d:
                x, y, z = coords[hs[0]]
                pts.append((x - cx, y - cy, float(zshift.get(hs[0], 0))))
            else:
                # implicit H: the missing tetrahedral direction
                sx = -sum(p[0] for p in pts)
                sy = -sum(p[1] for p in pts)
                sz = -sum(p[2] for p in pts)
                pts.append((sx, sy, sz))
            frame.append("H")
        if len(pts) != 4:
            continue
        v1 = tuple(b - a for a, b in zip(pts[0], pts[1]))
        v2 = tuple(b - a for a, b in zip(pts[0], pts[2]))
        v3 = tuple(b - a for a, b in zip(pts[0], pts[3]))
        cross = (
            v2[1] * v3[2] - v2[2] * v3[1],
            v2[2] * v3[0] - v2[0] * v3[2],
            v2[0] * v3[1] - v2[1] * v3[0],
        )
        vol = v1[0] * cross[0] + v1[1] * cross[1] + v1[2] * cross[2]
        if abs(vol) < 1e-9:
            continue  # degenerate geometry: leave stereo undefined
        center.chiral = "@" if vol < 0 else "@@"
        center.written_nbrs = frame


def molblock_to_smiles(block: str) -> str | None:
    """Mol block → canonical SMILES (stereo-aware); None when
    unparseable — the per-record conversion behind SDF → canonical-key
    dedup (reference sdf.py: MolFromMolBlock → MolToSmiles)."""
    from workbench_spark.chem.canon import canonical_smiles_mol

    try:
        mol = parse_molblock(block)
    except (MolfileError, SmilesError):
        return None
    if not mol.atoms:
        return None
    return canonical_smiles_mol(mol)
