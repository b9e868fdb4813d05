"""Labute approximate van-der-Waals surface areas and the binned VSA
descriptor families (SlogP_VSA / SMR_VSA / PEOE_VSA / EState_VSA).

Published method: P. Labute, "A widely applicable set of descriptors",
J. Mol. Graph. Model. 18 (2000) 464-477. The reference gets these from
RDKit's MolSurf module; no reference code exists to port — this is the
paper's construction on our parsed graph:

- each atom is a sphere of its Bondi van-der-Waals radius (A. Bondi,
  J. Phys. Chem. 68 (1964) 441);
- every bond removes a spherical cap from each end, with the cap height
  computed from the ideal bond length d_ij via the sphere-sphere
  intersection formula, d clamped into [|R_i - R_j|, R_i + R_j]:
      cap_i = 2 * pi * R_i * (R_i - (d^2 + R_i^2 - R_j^2) / (2 d))
      A_i = max(0, 4 * pi * R_i^2 - sum_j cap_i(j));
- ideal bond lengths are sums of the Pyykko-Atsumi single/double/triple
  covalent radii (Chem. Eur. J. 15 (2009) 186 and 12770), aromatic =
  mean of single and double — a published, self-consistent table (Labute
  used an MMFF-derived table; same construction, different public data,
  so bit-parity with RDKit is NOT claimed — conventions are documented
  and property-tested instead);
- implicit hydrogens are real spheres: they cap their heavy atom, and
  their own area is reported separately (``h_area``) so LabuteASA can
  include it (RDKit's includeHs=True default) while the binned families
  stay heavy-atom-indexed.

Binned families: per-heavy-atom VSA is summed into fixed property bins.
The bin BOUNDARIES are the published ones used across RDKit/Mordred
documentation (public descriptor-definition data):

- SlogP_VSA over the Wildman-Crippen per-atom logP contribution
  (implicit-H contributions folded into the heavy atom, matching the
  BCUT weighting convention in chem/extended.py);
- SMR_VSA over the Wildman-Crippen molar-refractivity contribution;
- PEOE_VSA over the Gasteiger PEOE charge of the heavy atom;
- EState_VSA over the Kier-Hall EState index of the heavy atom.
"""

from __future__ import annotations

import math

from workbench_spark.chem.smiles import Mol

#: Bondi (1964) van-der-Waals radii, Angstrom
_VDW: dict[str, float] = {
    "H": 1.20, "B": 1.92, "C": 1.70, "N": 1.55, "O": 1.52, "F": 1.47,
    "Si": 2.10, "P": 1.80, "S": 1.80, "Cl": 1.75, "Br": 1.85, "I": 1.98,
    "Se": 1.90, "As": 1.85,
}

#: Pyykko-Atsumi covalent radii (single, double, triple), Angstrom
_COV: dict[str, tuple[float, float, float]] = {
    "H": (0.32, 0.32, 0.32),
    "B": (0.85, 0.78, 0.73),
    "C": (0.75, 0.67, 0.60),
    "N": (0.71, 0.60, 0.54),
    "O": (0.63, 0.57, 0.53),
    "F": (0.64, 0.59, 0.53),
    "Si": (1.16, 1.07, 1.02),
    "P": (1.11, 1.02, 0.94),
    "S": (1.03, 0.94, 0.95),
    "Cl": (0.99, 0.95, 0.93),
    "Br": (1.14, 1.09, 1.10),
    "I": (1.33, 1.29, 1.25),
    "Se": (1.16, 1.07, 1.07),
    "As": (1.21, 1.14, 1.06),
}


def _bond_length(sym_a: str, sym_b: str, order: float) -> float | None:
    ra, rb = _COV.get(sym_a), _COV.get(sym_b)
    if ra is None or rb is None:
        return None
    if order >= 3:
        return ra[2] + rb[2]
    if order >= 2:
        return ra[1] + rb[1]
    if order > 1:  # aromatic 1.5: mean of single and double sums
        return ((ra[0] + rb[0]) + (ra[1] + rb[1])) / 2.0
    return ra[0] + rb[0]


def labute_contributions(mol: Mol) -> tuple[list[float], list[float]] | None:
    """Per-heavy-atom VSA and per-heavy-atom summed implicit-H area, or
    None when any element lacks radius data (NULL downstream)."""
    n = len(mol.atoms)
    if n == 0:
        return None
    radii: list[float] = []
    for a in mol.atoms:
        r = _VDW.get(a.symbol)
        if r is None or a.symbol not in _COV:
            return None
        radii.append(r)
    rh = _VDW["H"]

    def cap(r_i: float, r_j: float, d: float) -> float:
        d = min(max(d, abs(r_i - r_j) + 1e-9), r_i + r_j)
        return 2.0 * math.pi * r_i * (r_i - (d * d + r_i * r_i - r_j * r_j) / (2.0 * d))

    area = [4.0 * math.pi * r * r for r in radii]
    h_area = [0.0] * n
    for b in mol.bonds:
        order = 1.5 if (b.aromatic or b.demoted_aromatic) else float(b.order)
        sa, sb = mol.atoms[b.a].symbol, mol.atoms[b.b].symbol
        d = _bond_length(sa, sb, order)
        if d is None:
            return None
        area[b.a] -= cap(radii[b.a], radii[b.b], d)
        area[b.b] -= cap(radii[b.b], radii[b.a], d)
    for i, a in enumerate(mol.atoms):
        if a.h_count:
            d = _bond_length(a.symbol, "H", 1.0)
            if d is None:
                return None
            area[i] -= a.h_count * cap(radii[i], rh, d)
            one_h = max(0.0, 4.0 * math.pi * rh * rh - cap(rh, radii[i], d))
            h_area[i] = a.h_count * one_h
    return [max(0.0, x) for x in area], h_area


# published bin boundaries (RDKit/Mordred descriptor definitions)
_SLOGP_BINS = (-0.4, -0.2, 0.0, 0.1, 0.15, 0.2, 0.25, 0.3, 0.4, 0.5, 0.6)
_SMR_BINS = (1.29, 1.82, 2.24, 2.45, 2.75, 3.05, 3.63, 3.8, 4.0)
_PEOE_BINS = (
    -0.30, -0.25, -0.20, -0.15, -0.10, -0.05, 0.0,
    0.05, 0.10, 0.15, 0.20, 0.25, 0.30,
)
_ESTATE_BINS = (-0.390, 0.290, 0.717, 1.165, 1.540, 1.807, 2.05, 4.69, 9.17, 15.0)


def _binned(vsa: list[float], prop: list[float], bins: tuple[float, ...],
            prefix: str) -> dict[str, float]:
    out = {f"{prefix}{i + 1}": 0.0 for i in range(len(bins) + 1)}
    for v, p in zip(vsa, prop):
        k = 0
        while k < len(bins) and p >= bins[k]:
            k += 1
        out[f"{prefix}{k + 1}"] += v
    return out


#: stable column order for the Spark stage
SURFACE_DESCRIPTOR_NAMES = (
    ["labuteasa"]
    + [f"slogp_vsa{i}" for i in range(1, 13)]
    + [f"smr_vsa{i}" for i in range(1, 11)]
    + [f"peoe_vsa{i}" for i in range(1, 15)]
    + [f"estate_vsa{i}" for i in range(1, 12)]
)


def surface_descriptors(
    mol: Mol,
    charges: "tuple[list[float], list[float]] | None" = None,
    estate: "list[float] | None" = None,
) -> dict[str, float | None]:
    """LabuteASA + the four binned VSA families. Bin sums are exact
    partitions of the heavy-atom VSA total (property-tested); any
    un-derivable ingredient NULLs only its own family. ``charges`` /
    ``estate`` accept precomputed gasteiger_charges / estate_values so
    the per-row hot path runs each expensive pass once."""
    from workbench_spark.chem.crippen import CONTRIB, _h_type, atom_type
    from workbench_spark.chem.extended import estate_values
    from workbench_spark.chem.peoe import gasteiger_charges

    out: dict[str, float | None] = dict.fromkeys(SURFACE_DESCRIPTOR_NAMES)
    contrib = labute_contributions(mol)
    if contrib is None:
        return out
    vsa, h_area = contrib
    out["labuteasa"] = sum(vsa) + sum(h_area)

    logp_w, mr_w, have_crippen = [], [], True
    for a in mol.atoms:
        t = atom_type(mol, a)
        if t is None:
            have_crippen = False
            break
        lp, mr = CONTRIB[t]
        if a.h_count:
            hl, hm = CONTRIB[_h_type(mol, a)]
            lp += a.h_count * hl
            mr += a.h_count * hm
        logp_w.append(lp)
        mr_w.append(mr)
    if have_crippen:
        out.update(_binned(vsa, logp_w, _SLOGP_BINS, "slogp_vsa"))
        out.update(_binned(vsa, mr_w, _SMR_BINS, "smr_vsa"))

    q = charges if charges is not None else gasteiger_charges(mol)
    if q is not None:
        out.update(_binned(vsa, q[0], _PEOE_BINS, "peoe_vsa"))

    s = estate if estate is not None else estate_values(mol)
    if s is not None:
        out.update(_binned(vsa, s, _ESTATE_BINS, "estate_vsa"))
    return out
