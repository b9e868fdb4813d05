"""Electronic/surface descriptor tier (chem/peoe.py + chem/surface.py):
Gasteiger PEOE charges, charge autocorrelation, Labute VSA families.

Golden anchors are the classic published PEOE ballparks (methane C
-0.078, benzene CH +/-0.062, methanol O -0.40 — reproduced in the
Gasteiger-Marsili 1980 worked examples and quoted across the
descriptor literature); everything else is invariant-tested (charge
conservation, symmetry classes, bin partition, relabel invariance)
because exact RDKit bit-parity is explicitly not claimed for the
VSA scale (Bondi + Pyykko-Atsumi data vs MOE-fitted radii)."""

import math

import pytest

from workbench_spark.chem.peoe import charge_descriptors, gasteiger_charges
from workbench_spark.chem.smiles import parse_smiles
from workbench_spark.chem.surface import (
    SURFACE_DESCRIPTOR_NAMES,
    labute_contributions,
    surface_descriptors,
)


# ------------------------------------------------------------ PEOE
def test_methane_classic_values():
    q, h = gasteiger_charges(parse_smiles("C"))
    assert q[0] == pytest.approx(-0.078, abs=0.005)
    assert h[0] / 4 == pytest.approx(0.0195, abs=0.002)


def test_benzene_symmetry_and_classic_value():
    q, h = gasteiger_charges(parse_smiles("c1ccccc1"))
    assert all(x == pytest.approx(q[0], abs=1e-9) for x in q)
    assert q[0] == pytest.approx(-0.062, abs=0.005)


def test_methanol_oxygen_negative():
    q, h = gasteiger_charges(parse_smiles("CO"))
    assert q[1] == pytest.approx(-0.40, abs=0.02)  # O
    assert q[0] > 0  # C drawn positive by O


def test_charge_conservation_neutral_and_ion():
    for smi, total in [("CC(=O)Oc1ccccc1C(=O)O", 0.0), ("C[N+](C)(C)C", 1.0),
                       ("CC(=O)[O-]", -1.0)]:
        q, h = gasteiger_charges(parse_smiles(smi))
        assert sum(q) + sum(h) == pytest.approx(total, abs=1e-9)


def test_electronegativity_ordering_halomethanes():
    """F pulls more charge than Cl, Cl more than Br."""
    pulls = {}
    for smi, hal in [("CF", "F"), ("CCl", "Cl"), ("CBr", "Br")]:
        q, _ = gasteiger_charges(parse_smiles(smi))
        pulls[hal] = q[1]
    assert pulls["F"] < pulls["Cl"] < pulls["Br"] < 0


def test_relabel_invariance():
    """Same molecule, different atom order -> same multiset of charges."""
    a, _ = gasteiger_charges(parse_smiles("CC(=O)Oc1ccccc1C(=O)O"))
    b, _ = gasteiger_charges(parse_smiles("OC(=O)c1ccccc1OC(C)=O"))
    assert sorted(round(x, 9) for x in a) == sorted(round(x, 9) for x in b)


def test_unparameterized_element_is_null():
    assert gasteiger_charges(parse_smiles("C[Si](C)C")) is None
    d = charge_descriptors(parse_smiles("C[Si](C)C"))
    assert all(v is None for v in d.values())


def test_charge_descriptor_summaries():
    d = charge_descriptors(parse_smiles("CO"))
    assert d["minpartialcharge"] == pytest.approx(-0.40, abs=0.02)
    assert d["maxabspartialcharge"] >= abs(d["maxpartialcharge"]) - 1e-12


# ------------------------------------------------------------ Labute VSA
def test_vsa_positive_and_symmetry():
    vsa, h_area = labute_contributions(parse_smiles("c1ccccc1"))
    assert all(v > 0 for v in vsa)
    assert all(v == pytest.approx(vsa[0], abs=1e-9) for v in vsa)
    assert h_area[0] > 0


def test_bin_families_partition_heavy_vsa():
    for smi in ["CCO", "CC(=O)Oc1ccccc1C(=O)O", "c1ccc2ccccc2c1", "CC(N)C(=O)O"]:
        m = parse_smiles(smi)
        vsa, _ = labute_contributions(m)
        tot = sum(vsa)
        d = surface_descriptors(m)
        for fam in ("slogp_vsa", "smr_vsa", "peoe_vsa", "estate_vsa"):
            fam_sum = sum(v for k, v in d.items() if k.startswith(fam))
            assert fam_sum == pytest.approx(tot, rel=1e-9), (smi, fam)


def test_labuteasa_monotone_in_size():
    sizes = []
    for smi in ["C", "CC", "CCC", "CCCC"]:
        d = surface_descriptors(parse_smiles(smi))
        sizes.append(d["labuteasa"])
    assert sizes == sorted(sizes)


def test_buried_atom_smaller_than_terminal():
    """Quaternary carbon in neopentane is almost fully buried."""
    vsa, _ = labute_contributions(parse_smiles("CC(C)(C)C"))
    center = vsa[1]
    methyl = vsa[0]
    assert center < methyl / 2


def test_surface_null_for_unknown_element():
    d = surface_descriptors(parse_smiles("[SeH2]=[Po]")) if False else None
    # Po is not parseable; use a parseable-but-unparameterized case
    out = surface_descriptors(parse_smiles("C[Si](C)C"))
    # Si HAS radius data -> Labute family present, PEOE family NULL
    assert out["labuteasa"] is not None
    assert all(out[f"peoe_vsa{i}"] is None for i in range(1, 15))


# ------------------------------------------------------------ Spark stage
@pytest.fixture(scope="session")
def spark():
    from workbench_spark.session import get_spark

    return get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})


def test_electronic_stage_spark(spark):
    from workbench_spark.operators.chem import (
        ELECTRONIC_DESCRIPTOR_NAMES,
        electronic_descriptors,
    )

    df = spark.createDataFrame(
        [("a", "CCO"), ("b", "not-a-smiles"), ("c", "c1ccccc1")],
        "id string, smiles string",
    )
    out = electronic_descriptors(df)
    assert set(ELECTRONIC_DESCRIPTOR_NAMES) <= set(out.columns)
    rows = {r["id"]: r for r in out.collect()}
    assert rows["a"]["minpartialcharge"] == pytest.approx(-0.40, abs=0.02)
    assert rows["a"]["labuteasa"] is not None
    assert rows["b"]["labuteasa"] is None
    assert rows["c"]["ats1_c"] is not None
    # benzene: identical charges -> zero variance -> MATS/GATS NULL
    assert rows["c"]["mats1_c"] is None
