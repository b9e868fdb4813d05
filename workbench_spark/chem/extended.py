"""Extended 2D descriptor families — the Mordred/RDKit tail (r3 VERDICT
#4): electrotopological state, 2D autocorrelation, Burden eigenvalues.

All three are published closed forms computed on the hydrogen-suppressed
graph (reference gets them from RDKit/Mordred; no reference code exists
to port — these are from the papers):

- **EState** (Kier & Hall, Pharm. Res. 1990): intrinsic state
  I = ((2/N)² δv + 1)/δ with N the principal quantum number, δ the
  heavy-atom degree, δv = Zv − h the valence delta; field effect
  ΔI_ij = (I_i − I_j)/(d_ij + 1)² summed over all pairs. Emitted as the
  four RDKit summary columns (max/min/maxabs/minabs EState index).
- **2D autocorrelation** (Moreau & Broto 1980; Moran 1950; Geary 1954)
  over topological distance d = 0..4 with atom weight w = atomic mass
  of the heavy atom PLUS its implicit hydrogens (documented convention;
  Mordred offers several weightings — mass is the first of its set):
  ATS_d = Σ_{i<j, d(i,j)=d} w_i w_j  (ATS_0 = Σ w_i²),
  MATS_d = (Σ_pairs (w_i−w̄)(w_j−w̄)/N_d) / (Σ_i (w_i−w̄)²/n),
  GATS_d = (Σ_pairs (w_i−w_j)²/(2 N_d)) / (Σ_i (w_i−w̄)²/(n−1)).
  Undefined cells (no pairs at d, zero variance, n < 2) are None → NULL.
- **BCUT** (Burden, J. Chem. Inf. Comput. Sci. 1989): symmetric matrix
  with atom weights on the diagonal, 0.1 × bond order (0.15 aromatic)
  for bonded pairs with +0.01 when either end is terminal, 0.001 for
  non-bonded pairs; highest/lowest eigenvalue per weighting. Weightings:
  mass, Crippen logP atom contribution, Crippen MR atom contribution
  (implicit-H contributions folded into the heavy atom, as RDKit's
  BCUT2D does). Pearlman's variant differs in the off-diagonal
  constants; the Burden original is used here and documented.
"""

from __future__ import annotations

import math

from workbench_spark.chem.smiles import ATOMIC_MASS, Mol

# valence electron counts for the EState valence delta
_VALENCE_ELECTRONS = {
    "B": 3, "C": 4, "Si": 4, "N": 5, "P": 5, "As": 5,
    "O": 6, "S": 6, "Se": 6, "F": 7, "Cl": 7, "Br": 7, "I": 7,
}
# principal quantum number by element period
_PERIOD = {
    "B": 2, "C": 2, "N": 2, "O": 2, "F": 2,
    "Si": 3, "P": 3, "S": 3, "Cl": 3,
    "As": 4, "Se": 4, "Br": 4, "I": 5,
}


def _distance_matrix(mol: Mol) -> list[list[int]]:
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


def estate_values(mol: Mol, dist: list[list[int]] | None = None) -> list[float] | None:
    """Per-atom S values (Kier-Hall EState); None when any atom lacks the
    element tables (exotic species — emit NULL, never fake). ``dist``
    accepts a precomputed distance matrix (hot-path callers share one
    BFS pass across EState and autocorrelation)."""
    n = len(mol.atoms)
    if n == 0:
        return None
    degree = [len(mol.adjacency[i]) for i in range(n)]
    intrinsic = []
    for a in mol.atoms:
        zv = _VALENCE_ELECTRONS.get(a.symbol)
        period = _PERIOD.get(a.symbol)
        if zv is None or period is None or degree[a.idx] == 0:
            if n == 1 and zv is not None and period is not None:
                # single-atom molecule: δ=0 undefined; use I = (4/N²)δv + 1
                intrinsic.append((4.0 / period**2) * (zv - a.h_count) + 1.0)
                continue
            return None
        dv = zv - a.h_count
        intrinsic.append(((4.0 / period**2) * dv + 1.0) / degree[a.idx])
    if dist is None:
        dist = _distance_matrix(mol)
    s_vals = list(intrinsic)
    for i in range(n):
        for j in range(i + 1, n):
            d = dist[i][j]
            if d < 0:
                continue  # disconnected fragments don't perturb each other
            delta = (intrinsic[i] - intrinsic[j]) / (d + 1) ** 2
            s_vals[i] += delta
            s_vals[j] -= delta
    return s_vals


def estate_indices(
    mol: Mol, s: list[float] | None = None
) -> dict[str, float | None]:
    """RDKit summary parity: Max/Min/MaxAbs/MinAbs EState index."""
    if s is None:
        s = estate_values(mol)
    if not s:
        return {
            "maxestateindex": None, "minestateindex": None,
            "maxabsestateindex": None, "minabsestateindex": None,
        }
    return {
        "maxestateindex": max(s),
        "minestateindex": min(s),
        "maxabsestateindex": max(abs(x) for x in s),
        "minabsestateindex": min(abs(x) for x in s),
    }


def _atom_masses(mol: Mol) -> list[float] | None:
    """Folded-H atomic masses; None when any element is outside the mass
    table (NULL downstream — CLAUDE.md invariant: never a fake zero)."""
    out = []
    for a in mol.atoms:
        m = ATOMIC_MASS.get(a.symbol)
        if m is None:
            return None
        out.append(m + a.h_count * ATOMIC_MASS["H"])
    return out


def autocorrelation_weighted(
    mol: Mol, w: list[float], suffix: str, max_d: int = 4,
    dist: list[list[int]] | None = None,
) -> dict[str, float | None]:
    """Moreau-Broto / Moran / Geary autocorrelation on an arbitrary
    per-heavy-atom weight vector (``_{suffix}`` column postfix)."""
    n = len(mol.atoms)
    out: dict[str, float | None] = {}
    for d in range(0, max_d + 1):
        out[f"ats{d}_{suffix}"] = None
    for d in range(1, max_d + 1):
        out[f"mats{d}_{suffix}"] = None
        out[f"gats{d}_{suffix}"] = None
    if n == 0:
        return out
    out[f"ats0_{suffix}"] = sum(x * x for x in w)
    if n < 2:
        return out
    if dist is None:
        dist = _distance_matrix(mol)
    wbar = sum(w) / n
    var = sum((x - wbar) ** 2 for x in w)
    # identical-atom molecules (benzene, cyclohexane) leave ~1e-29
    # floating-point dust in var; below relative epsilon the normalized
    # statistics are 0/0 and must be NULL, not a dust-quotient
    if var <= 1e-12 * max(1.0, sum(x * x for x in w)):
        var = 0.0
    pair_prod = [0.0] * (max_d + 1)
    pair_centered = [0.0] * (max_d + 1)
    pair_sqdiff = [0.0] * (max_d + 1)
    pair_count = [0] * (max_d + 1)
    for i in range(n):
        for j in range(i + 1, n):
            d = dist[i][j]
            if 1 <= d <= max_d:
                pair_prod[d] += w[i] * w[j]
                pair_centered[d] += (w[i] - wbar) * (w[j] - wbar)
                pair_sqdiff[d] += (w[i] - w[j]) ** 2
                pair_count[d] += 1
    for d in range(1, max_d + 1):
        if pair_count[d] == 0:
            continue
        out[f"ats{d}_{suffix}"] = pair_prod[d]
        if var > 0:
            out[f"mats{d}_{suffix}"] = (pair_centered[d] / pair_count[d]) / (var / n)
            out[f"gats{d}_{suffix}"] = (pair_sqdiff[d] / (2 * pair_count[d])) / (
                var / (n - 1)
            )
    return out


def autocorrelation_mass(
    mol: Mol, max_d: int = 4, dist: list[list[int]] | None = None
) -> dict[str, float | None]:
    """Moreau-Broto / Moran / Geary autocorrelation on atomic mass (heavy
    atom + its implicit hydrogens — the folded-H weight convention)."""
    if not mol.atoms:
        return autocorrelation_weighted(mol, [], "m", max_d)
    w = _atom_masses(mol)
    if w is None:  # exotic element outside the mass table -> all NULL
        return autocorrelation_weighted(Mol(), [], "m", max_d)
    return autocorrelation_weighted(mol, w, "m", max_d, dist=dist)


def _burden_eigen_range(mol: Mol, weights: list[float]) -> tuple[float, float] | None:
    """(highest, lowest) eigenvalue of the Burden matrix for one atom
    weighting. numpy eigvalsh on an n×n symmetric matrix — trivial for
    molecule-sized n inside the Arrow batch."""
    import numpy as np

    n = len(mol.atoms)
    if n == 0:
        return None
    if n == 1:
        return (weights[0], weights[0])
    degree = [len(mol.adjacency[i]) for i in range(n)]
    B = np.full((n, n), 0.001)
    np.fill_diagonal(B, weights)
    for b in mol.bonds:
        order = 1.5 if (b.aromatic or b.demoted_aromatic) else float(b.order)
        v = 0.1 * order
        if degree[b.a] == 1 or degree[b.b] == 1:
            v += 0.01
        B[b.a, b.b] = v
        B[b.b, b.a] = v
    ev = np.linalg.eigvalsh(B)
    return (float(ev[-1]), float(ev[0]))


def bcut_descriptors(mol: Mol) -> dict[str, float | None]:
    """Six BCUT columns: eigenvalue range for mass / Crippen-logP /
    Crippen-MR weightings."""
    from workbench_spark.chem.crippen import CONTRIB, _h_type, atom_type

    out: dict[str, float | None] = dict.fromkeys(
        (
            "bcut_mw_hi", "bcut_mw_lo", "bcut_logp_hi", "bcut_logp_lo",
            "bcut_mr_hi", "bcut_mr_lo",
        )
    )
    if not mol.atoms:
        return out
    masses = _atom_masses(mol)  # None for exotic elements -> mw NULL
    logp_w, mr_w = [], []
    for a in mol.atoms:
        t = atom_type(mol, a)
        if t is None:
            # atom outside the Crippen typing: the logP/MR weightings are
            # uncomputable for the whole molecule -> NULL, never a fake 0
            logp_w = mr_w = None
            break
        lp, mr = CONTRIB[t]
        if a.h_count:
            hl, hm = CONTRIB[_h_type(mol, a)]
            lp += a.h_count * hl
            mr += a.h_count * hm
        logp_w.append(lp)
        mr_w.append(mr)
    for key, w in (("mw", masses), ("logp", logp_w), ("mr", mr_w)):
        if w is None:
            continue
        r = _burden_eigen_range(mol, w)
        if r is not None:
            out[f"bcut_{key}_hi"], out[f"bcut_{key}_lo"] = r
    return out


#: stable column order for the Spark stage
EXTENDED_DESCRIPTOR_NAMES = [
    "maxestateindex", "minestateindex", "maxabsestateindex",
    "minabsestateindex",
    "ats0_m", "ats1_m", "ats2_m", "ats3_m", "ats4_m",
    "mats1_m", "mats2_m", "mats3_m", "mats4_m",
    "gats1_m", "gats2_m", "gats3_m", "gats4_m",
    "bcut_mw_hi", "bcut_mw_lo", "bcut_logp_hi", "bcut_logp_lo",
    "bcut_mr_hi", "bcut_mr_lo",
]


def extended_descriptors(mol: Mol) -> dict[str, float | None]:
    out: dict[str, float | None] = {}
    dist = _distance_matrix(mol) if mol.atoms else None
    out.update(estate_indices(mol, s=estate_values(mol, dist=dist)))
    out.update(autocorrelation_mass(mol, dist=dist))
    out.update(bcut_descriptors(mol))
    return out
