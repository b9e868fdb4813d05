"""Extended descriptor tail (chem/extended.py): EState, autocorrelation,
BCUT — published-value goldens + relabel invariance (r3 VERDICT #4)."""

import math

import pytest

from workbench_spark.chem.extended import (
    autocorrelation_mass,
    bcut_descriptors,
    estate_indices,
    estate_values,
    extended_descriptors,
)
from workbench_spark.chem.smiles import ATOMIC_MASS, parse_smiles


# ------------------------------------------------------------- EState
def test_estate_ethanol_published_values():
    """The classic Kier-Hall worked example: ethanol intrinsic states
    I = (2.0, 1.5, 6.0) give S(CH3) = 2 + 0.5/4 - 4/9 = 1.680556,
    S(CH2) = 0.25, S(OH) = 7.569444 — the same numbers RDKit's
    EStateIndices returns."""
    s = estate_values(parse_smiles("CCO"))
    assert s == pytest.approx([1.680556, 0.25, 7.569444], abs=1e-6)
    idx = estate_indices(parse_smiles("CCO"))
    assert idx["maxestateindex"] == pytest.approx(7.569444, abs=1e-6)
    assert idx["minestateindex"] == pytest.approx(0.25, abs=1e-6)
    assert idx["maxabsestateindex"] == pytest.approx(7.569444, abs=1e-6)
    assert idx["minabsestateindex"] == pytest.approx(0.25, abs=1e-6)


def test_estate_acetone_carbonyl_oxygen():
    """Acetone: I(=O) = 7 (δ=1, δv=6), perturbed up by the electron-poor
    carbonyl carbon: S(O) = 7 + (7-5/3)/4 + 2*(7-2)/9 = 9.444444."""
    s = estate_values(parse_smiles("CC(=O)C"))
    assert max(s) == pytest.approx(9.444444, abs=1e-6)
    # symmetric methyls share a value
    assert s[0] == pytest.approx(s[3], abs=1e-12)


def test_estate_intrinsic_state_periods():
    """Higher-period halogens scale by (2/N)²: Cl (N=3, δv=7, δ=1) has
    I = (4/9)*7 + 1 = 4.111; F (N=2) has I = 8."""
    sf = estate_values(parse_smiles("CF"))
    scl = estate_values(parse_smiles("CCl"))
    # methyl fluoride: S(F) = 8 + (8-1.75)/4 ... frame: I(CH3F C)=?  C:
    # δ=1, δv=4-3=1 -> I=2... compute directly instead: F idx > Cl idx
    assert max(sf) > max(scl)


def test_estate_exotic_atom_nulls():
    assert estate_indices(parse_smiles("C[Hg]C"))["maxestateindex"] is None


def test_estate_relabel_invariant():
    a = estate_indices(parse_smiles("CC(=O)Oc1ccccc1C(=O)O"))
    b = estate_indices(parse_smiles("OC(=O)c1ccccc1OC(C)=O"))
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-9)


# ----------------------------------------------------- autocorrelation
def test_autocorrelation_ethanol_hand_computed():
    """Independent arithmetic: w = mass(atom) + h_count * mass(H)."""
    w = [
        ATOMIC_MASS["C"] + 3 * ATOMIC_MASS["H"],
        ATOMIC_MASS["C"] + 2 * ATOMIC_MASS["H"],
        ATOMIC_MASS["O"] + 1 * ATOMIC_MASS["H"],
    ]
    ac = autocorrelation_mass(parse_smiles("CCO"))
    assert ac["ats0_m"] == pytest.approx(sum(x * x for x in w))
    assert ac["ats1_m"] == pytest.approx(w[0] * w[1] + w[1] * w[2])
    assert ac["ats2_m"] == pytest.approx(w[0] * w[2])
    assert ac["ats3_m"] is None  # no pairs at distance 3
    wbar = sum(w) / 3
    var = sum((x - wbar) ** 2 for x in w)
    num1 = ((w[0] - wbar) * (w[1] - wbar) + (w[1] - wbar) * (w[2] - wbar)) / 2
    assert ac["mats1_m"] == pytest.approx(num1 / (var / 3))
    g1 = ((w[0] - w[1]) ** 2 + (w[1] - w[2]) ** 2) / 4
    assert ac["gats1_m"] == pytest.approx(g1 / (var / 2))


def test_autocorrelation_homonuclear_degenerate():
    """All-carbon chain: zero variance -> MATS/GATS undefined (NULL),
    ATS still defined."""
    ac = autocorrelation_mass(parse_smiles("CCCCC"))
    # interior CH2 vs terminal CH3 differ by one H mass -> variance != 0
    assert ac["mats1_m"] is not None
    # cyclohexane: every atom identical -> variance 0
    ac2 = autocorrelation_mass(parse_smiles("C1CCCCC1"))
    assert ac2["mats1_m"] is None and ac2["gats1_m"] is None
    assert ac2["ats1_m"] is not None
    # benzene leaves ~1e-29 float dust in the variance — must still be
    # treated as zero (NULL), not a dust quotient
    ac3 = autocorrelation_mass(parse_smiles("c1ccccc1"))
    assert ac3["mats1_m"] is None and ac3["gats1_m"] is None


def test_autocorrelation_relabel_invariant():
    a = autocorrelation_mass(parse_smiles("CC(=O)Oc1ccccc1C(=O)O"))
    b = autocorrelation_mass(parse_smiles("O=C(O)c1ccccc1OC(C)=O"))
    for k in a:
        if a[k] is None:
            assert b[k] is None
        else:
            assert a[k] == pytest.approx(b[k], abs=1e-9)


# ---------------------------------------------------------------- BCUT
def test_bcut_ethane_closed_form():
    """Ethane Burden matrix is [[w, 0.11], [0.11, w]] (single bond 0.1 +
    terminal 0.01): eigenvalues w ± 0.11 exactly."""
    w = ATOMIC_MASS["C"] + 3 * ATOMIC_MASS["H"]
    d = bcut_descriptors(parse_smiles("CC"))
    assert d["bcut_mw_hi"] == pytest.approx(w + 0.11, abs=1e-9)
    assert d["bcut_mw_lo"] == pytest.approx(w - 0.11, abs=1e-9)


def test_bcut_single_atom():
    d = bcut_descriptors(parse_smiles("C"))
    w = ATOMIC_MASS["C"] + 4 * ATOMIC_MASS["H"]
    assert d["bcut_mw_hi"] == pytest.approx(w)
    assert d["bcut_mw_lo"] == pytest.approx(w)


def test_bcut_eigen_bounds_and_invariance():
    """Eigenvalues bracket the diagonal weights (Gershgorin) and are
    atom-order invariant."""
    a = bcut_descriptors(parse_smiles("CC(=O)Oc1ccccc1C(=O)O"))
    b = bcut_descriptors(parse_smiles("OC(=O)c1ccccc1OC(C)=O"))
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-9)
    assert a["bcut_mw_hi"] > a["bcut_mw_lo"]
    assert a["bcut_logp_hi"] > a["bcut_logp_lo"]
    assert a["bcut_mr_hi"] > a["bcut_mr_lo"]


def test_extended_block_complete():
    from workbench_spark.chem.extended import EXTENDED_DESCRIPTOR_NAMES

    d = extended_descriptors(parse_smiles("c1ccccc1O"))
    assert set(d) == set(EXTENDED_DESCRIPTOR_NAMES)


def test_spark_stage_carries_extended_columns(spark):
    from workbench_spark.operators.chem import (
        TOPOLOGY_DESCRIPTOR_NAMES,
        topological_descriptors,
    )

    df = spark.createDataFrame(
        [("a", "CCO"), ("b", None), ("c", "(((")], "id string, smiles string"
    )
    out = topological_descriptors(df)
    assert set(TOPOLOGY_DESCRIPTOR_NAMES) <= set(out.columns)
    rows = {r["id"]: r for r in out.collect()}
    assert rows["a"]["maxestateindex"] == pytest.approx(7.569444, abs=1e-6)
    assert rows["a"]["bcut_mw_hi"] is not None
    assert rows["b"]["maxestateindex"] is None
    assert rows["c"]["ats1_m"] is None


@pytest.fixture(scope="session")
def spark():
    from workbench_spark.session import get_spark

    return get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})


# --------------------------------------------- higher chi / alpha kappas
def test_higher_chi_hand_values():
    from workbench_spark.chem.topology import higher_chi_indices

    # butane: two 2-paths (1,2,2) -> 2/2 = 1.0; one 3-path (1,2,2,1) -> 0.5
    d = higher_chi_indices(parse_smiles("CCCC"))
    assert d["chi2"] == pytest.approx(1.0, abs=1e-6)
    assert d["chi3"] == pytest.approx(0.5, abs=1e-6)
    assert d["chi4"] == 0.0
    # isobutane: 2-chi = 3/sqrt(3) (star paths), no 3-paths
    d = higher_chi_indices(parse_smiles("CC(C)C"))
    assert d["chi2"] == pytest.approx(1.732051, abs=1e-6)
    assert d["chi3"] == 0.0


def test_kappa3_alkane_closed_forms():
    from workbench_spark.chem.topology import kappa_indices

    # linear chains: P3 = A-3; odd A -> k3 = (A-1)(A-3)^2/(A-3)^2 = A-1
    assert kappa_indices(parse_smiles("CCCCCCC"))["kappa3"] == pytest.approx(6.0)
    # even A=6: (A-3)(A-2)^2/P3^2 = 3*16/9
    assert kappa_indices(parse_smiles("CCCCCC"))["kappa3"] == pytest.approx(
        5.333333, abs=1e-6
    )


def test_hall_kier_alpha_and_modified_kappas():
    from workbench_spark.chem.topology import hall_kier_alpha, kappa_alpha_indices

    bz = parse_smiles("c1ccccc1")
    assert hall_kier_alpha(bz) == pytest.approx(-0.78, abs=1e-9)
    ka = kappa_alpha_indices(bz)
    # the published RDKit Kappa1/Kappa2 values for benzene
    assert ka["kappa1a"] == pytest.approx(3.412, abs=1e-3)
    assert ka["kappa2a"] == pytest.approx(1.606, abs=1e-3)
    # alkanes: alpha = 0 -> modified == unmodified
    from workbench_spark.chem.topology import kappa_indices

    hx = parse_smiles("CCCCCC")
    k, kam = kappa_indices(hx), kappa_alpha_indices(hx)
    assert kam["kappa1a"] == pytest.approx(k["kappa1"], abs=1e-6)
    assert kam["kappa3a"] == pytest.approx(k["kappa3"], abs=1e-6)


def test_alpha_null_for_unparameterized():
    from workbench_spark.chem.topology import kappa_alpha_indices

    d = kappa_alpha_indices(parse_smiles("C[Si](C)C"))
    assert all(v is None for v in d.values())
