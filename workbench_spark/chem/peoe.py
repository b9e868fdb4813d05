"""Gasteiger-Marsili partial equalization of orbital electronegativity
(PEOE) partial charges — pure Python on the parsed SMILES graph.

Published algorithm: J. Gasteiger, M. Marsili, "Iterative partial
equalization of orbital electronegativity — a rapid access to atomic
charges", Tetrahedron 36 (1980) 3219-3228. The reference gets these
from RDKit (``rdPartialCharges.ComputeGasteigerCharges``); no reference
code exists to port — this is from the paper:

- every atom type has an orbital electronegativity quadratic in its
  charge, chi(q) = a + b*q + c*q^2 (eV), with the (a, b, c) parameters of
  the paper's Table (reproduced below from the publication — transcribed
  from the paper, NOT from RDKit source, per the vendored-table policy);
- on each iteration n, every bond moves charge from the less to the more
  electronegative end: dq = (chi_hi - chi_lo) / chi_plus_lo * damp**n,
  where chi_plus_lo = a + b + c of the LESS electronegative atom (its
  cation electronegativity — the normalizing "how hard can it give"
  term) and damp = 1/2;
- hydrogen uses the special cation electronegativity 20.02 eV from the
  paper (its a+b+c would understate H's resistance to going positive);
- 12 damped iterations (geometric damping converges well before that).

Conventions (documented, asserted in tests):

- implicit hydrogens participate as real PEOE atoms (each gets its own
  charge) but are folded back per heavy atom on output;
- formal charges seed q (the paper treats neutral molecules; seeding
  keeps total charge conserved for ions, which is the invariant that
  matters downstream);
- atoms with no parameters (metals, noble gases) make the whole molecule
  return None — NULL downstream, never a fake.

Exact bit-parity with RDKit is NOT claimed (RDKit adds refits for a few
types); charge conservation, symmetry-class equality, and sign structure
are property-tested, and methane/fluoromethane land on the classic
published ballpark values.
"""

from __future__ import annotations

from workbench_spark.chem.smiles import Mol

#: (a, b, c) in eV — Gasteiger & Marsili 1980, by element + hybridization.
_PARAMS: dict[str, tuple[float, float, float]] = {
    "H": (7.17, 6.24, -0.56),
    "C.sp3": (7.98, 9.18, 1.88),
    "C.sp2": (8.79, 9.32, 1.51),
    "C.sp": (10.39, 9.45, 0.73),
    "N.sp3": (11.54, 10.82, 1.36),
    "N.sp2": (12.87, 11.15, 0.85),
    "N.sp": (15.68, 11.70, -0.27),
    "O.sp3": (14.18, 12.92, 1.39),
    "O.sp2": (17.07, 13.79, 0.47),
    "F": (14.66, 13.85, 2.31),
    "Cl": (11.00, 9.69, 1.35),
    "Br": (10.08, 8.47, 1.16),
    "I": (9.90, 7.96, 0.96),
    # sulfur/phosphorus: the paper's single sp3 parameterization
    "S.sp3": (10.14, 9.13, 1.38),
    "S.sp2": (10.14, 9.13, 1.38),
    "P.sp3": (8.90, 8.24, 0.96),
    "P.sp2": (8.90, 8.24, 0.96),
}

_HALOGENS = {"F", "Cl", "Br", "I"}
_H_CHI_PLUS = 20.02  # special hydrogen normalizer from the paper
_N_ITER = 12
_DAMP = 0.5


def _param_key(mol: Mol, idx: int) -> str | None:
    # hybridization classification shared with the Hall-Kier alpha
    # selection (chem/topology._atom_hyb) — ONE classifier, so a future
    # fix cannot silently diverge the Gasteiger parameter choice from
    # the alpha-contribution choice
    from workbench_spark.chem.topology import _atom_hyb

    sym = mol.atoms[idx].symbol
    if sym in _HALOGENS:
        return sym if sym in _PARAMS else None
    key = f"{sym}.{_atom_hyb(mol, idx)}"
    return key if key in _PARAMS else None


def gasteiger_charges(mol: Mol) -> tuple[list[float], list[float]] | None:
    """Return (q_heavy, q_h_sum) per heavy atom, or None if any atom is
    outside the parameter tables.

    q_heavy[i] is the PEOE charge of heavy atom i itself; q_h_sum[i] is
    the summed charge of its implicit hydrogens (so q_heavy[i] +
    q_h_sum[i] is the hydrogen-folded "group charge" used as the
    autocorrelation weight, mirroring the mass-weight convention).
    """
    n = len(mol.atoms)
    if n == 0:
        return None
    abc: list[tuple[float, float, float]] = []
    for i in range(n):
        key = _param_key(mol, i)
        if key is None:
            return None
        abc.append(_PARAMS[key])
    h_abc = _PARAMS["H"]

    # virtual nodes: heavy atoms [0, n) then one node per implicit H
    q = [float(mol.atoms[i].charge) for i in range(n)]
    h_owner: list[int] = []
    for i in range(n):
        h_owner.extend([i] * mol.atoms[i].h_count)
    qh = [0.0] * len(h_owner)

    bonds = [(b.a, b.b) for b in mol.bonds]

    def chi(params: tuple[float, float, float], qv: float) -> float:
        a, b, c = params
        return a + b * qv + c * qv * qv

    damp = 1.0
    for _ in range(_N_ITER):
        damp *= _DAMP
        dq = [0.0] * n
        dqh = [0.0] * len(h_owner)
        # heavy-heavy bonds
        for a_i, b_i in bonds:
            chi_a = chi(abc[a_i], q[a_i])
            chi_b = chi(abc[b_i], q[b_i])
            if chi_a == chi_b:
                continue
            if chi_a < chi_b:
                lo, hi, sign = a_i, b_i, 1.0
                chi_lo, chi_hi = chi_a, chi_b
            else:
                lo, hi, sign = b_i, a_i, -1.0
                chi_lo, chi_hi = chi_b, chi_a
            pa, pb, pc = abc[lo]
            chi_plus = pa + pb + pc
            t = (chi_hi - chi_lo) / chi_plus * damp
            dq[lo] += t
            dq[hi] -= t
        # heavy-hydrogen bonds
        for h_i, owner in enumerate(h_owner):
            chi_h = chi(h_abc, qh[h_i])
            chi_o = chi(abc[owner], q[owner])
            if chi_h == chi_o:
                continue
            if chi_h < chi_o:
                # H is the donor: normalize by the special H value
                t = (chi_o - chi_h) / _H_CHI_PLUS * damp
                dqh[h_i] += t
                dq[owner] -= t
            else:
                pa, pb, pc = abc[owner]
                t = (chi_h - chi_o) / (pa + pb + pc) * damp
                dq[owner] += t
                dqh[h_i] -= t
        for i in range(n):
            q[i] += dq[i]
        for i in range(len(h_owner)):
            qh[i] += dqh[i]

    h_sum = [0.0] * n
    for h_i, owner in enumerate(h_owner):
        h_sum[owner] += qh[h_i]
    return q, h_sum


def charge_descriptors(
    mol: Mol, charges: tuple[list[float], list[float]] | None = None
) -> dict[str, float | None]:
    """RDKit-parity summary columns over the heavy-atom charges. Pass a
    precomputed ``gasteiger_charges`` result to avoid re-running the
    12-iteration PEOE loop (the hot-path callers compute it once)."""
    out: dict[str, float | None] = dict.fromkeys(
        (
            "maxpartialcharge", "minpartialcharge",
            "maxabspartialcharge", "minabspartialcharge",
        )
    )
    res = charges if charges is not None else gasteiger_charges(mol)
    if res is None:
        return out
    q, _ = res
    out["maxpartialcharge"] = max(q)
    out["minpartialcharge"] = min(q)
    out["maxabspartialcharge"] = max(abs(x) for x in q)
    out["minabspartialcharge"] = min(abs(x) for x in q)
    return out
