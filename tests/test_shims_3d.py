"""Tests: C3 3D-descriptor stage contract, API shims (Compound,
PublicData, Reports), distributed SDF export."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="session")
def spark():
    from workbench_spark.session import get_spark

    return get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})


def test_descriptors_3d_contract_and_gating(spark):
    """Schema contract + real complexity gating (no RDKit in container:
    survivors get skip:no_rdkit, oversized molecules their real skip
    reason — same statuses as mol_descriptors_3d.check_complexity)."""
    from workbench_spark.operators.chem_3d import (
        DIAGNOSTIC_3D_NAMES,
        FEATURE_3D_NAMES,
        compute_descriptors_3d,
    )

    big_chain = "C" * 160  # 160 heavy atoms > MAX_HEAVY_ATOMS (150)
    rows = [
        (1, "CC(=O)Oc1ccccc1C(=O)O"),
        (2, big_chain),
        (3, "((("),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "mol_id int, smiles string")
    out = compute_descriptors_3d(df, partitions=2)
    assert set(FEATURE_3D_NAMES) <= set(out.columns)
    assert set(DIAGNOSTIC_3D_NAMES) <= set(out.columns)
    got = {r["mol_id"]: r for r in out.collect()}
    assert got[1]["desc3d_status"] == "skip:no_rdkit"
    assert got[1]["desc3d_confs_requested"] == 50  # aspirin: 3 rot bonds
    assert got[2]["desc3d_status"] == "skip:heavy_atoms"
    assert got[3]["desc3d_status"] == "skip:parse"
    assert got[4]["desc3d_status"] == "skip:parse"
    assert all(
        got[1][n] is None or math.isnan(got[1][n]) for n in FEATURE_3D_NAMES
    )


def test_check_complexity_tiers():
    from workbench_spark.operators.chem_3d import (
        adaptive_n_conformers_smiles,
        check_complexity_smiles,
    )

    assert check_complexity_smiles("CCO") is None
    assert check_complexity_smiles("C" * 160) == "skip:heavy_atoms"
    # 120 chain carbons pass the 150 heavy-atom gate but fail rot_bonds
    assert check_complexity_smiles("C" * 120) == "skip:rot_bonds"
    # 60 single-bonded chain carbons -> rotatable bonds > 50
    assert check_complexity_smiles("C" + "C" * 60) == "skip:rot_bonds"
    assert adaptive_n_conformers_smiles("CCO") == 50  # rigid tier
    flexible = "C" * 15  # 12 rotatable bonds >= 8
    assert adaptive_n_conformers_smiles(flexible) == 200


def test_check_complexity_ring_and_cost_gates():
    """The two gates added for reference parity (mol_descriptors_3d.py:
    203-225): ring-complexity backstop and the conformer-atom cost cap."""
    from workbench_spark.operators.chem_3d import check_complexity_smiles

    # 11 isolated cyclohexanes -> 11 SSSR rings > MAX_RING_SYSTEMS
    many_rings = ".".join(["C1CCCCC1"] * 11)
    assert check_complexity_smiles(many_rings) == "skip:rings"
    # 6 fused norbornane units: each adds 2 rings + 2 bridgeheads ->
    # complexity 24 > 15 while rings (12) stays... (12 > 10 trips first);
    # use spiro chains instead: 9 spiro-fused cyclohexanes = 9 rings
    # (passes <=10) + 8 spiro atoms -> complexity 17 > 15
    spiro9 = "C1CCC2(CC1)CCC1(CC2)CCC2(CC1)CCC1(CC2)CCC2(CC1)CCC1(CC2)CCC2(CC1)CCC1(CC2)CCCCC1"
    got = check_complexity_smiles(spiro9)
    assert got == "skip:ring_complexity", got
    # cost gate (heavy_atoms × n_conformers > 14000), only active when
    # the planned conformer count is passed; earlier gates still win
    assert check_complexity_smiles("CCO", n_conformers=200) is None  # 600 < cap
    assert check_complexity_smiles("c1ccccc1", n_conformers=3000) == "skip:cost"
    assert check_complexity_smiles("C" * 100, n_conformers=200) == "skip:rot_bonds"


def test_compound_shim():
    from workbench_spark.api.compound import Compound

    c = Compound("AQSOL-123", smiles="c1ccccc1O")
    c.add_tag("druglike")
    c.add_tag("druglike")  # idempotent
    c.add_meta("project", "solubility")
    assert c.details() == {
        "smiles": "c1ccccc1O",
        "tags": ["druglike"],
        "meta": {"project": "solubility"},
    }
    svg = c.image(width=200, height=160)
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert "<line" in svg  # bonds drawn
    assert ">O</text>" in svg  # hetero atom labeled
    assert "invalid SMILES" in Compound("x", smiles="(((").image()
    c.remove_tag("druglike")
    assert c.tags == []
    assert "AQSOL-123" in str(c)


def test_public_data_shim(spark, tmp_path):
    from workbench_spark.api.public_data import PublicData

    (tmp_path / "comp_chem").mkdir()
    spark.range(5).toDF("x").write.parquet(str(tmp_path / "comp_chem" / "aqsol.parquet"))
    pd_api = PublicData(root=str(tmp_path), spark=spark)
    assert pd_api.list() == ["comp_chem/aqsol"]
    assert pd_api.get("comp_chem/aqsol").count() == 5
    assert pd_api.get("missing/name") is None
    d = pd_api.describe("comp_chem/aqsol")
    assert d["rows"] == 5 and d["columns"] == ["x"]
    det = pd_api.details().collect()
    assert len(det) == 1 and det[0]["rows"] == 5


def test_reports_shim(spark, tmp_path):
    from workbench_spark.api.reports import Reports
    from workbench_spark.api.stores import DFStore

    reports = Reports(spark=spark, root=str(tmp_path))
    df = spark.createDataFrame(
        [("model-1", 0.68), ("model-2", 0.71)], "model string, rmse double"
    )
    reports.upsert("/contests/my-endpoint", df)
    assert reports.list() == ["contests/my-endpoint"]
    got = reports.get("/contests/my-endpoint")
    assert got.count() == 2
    # scoping: the full store sees it under reports/, Reports strips it
    assert DFStore(spark=spark, root=str(tmp_path)).list() == [
        "reports/contests/my-endpoint"
    ]
    reports.delete("/contests/my-endpoint")
    assert reports.list() == []


def test_sdf_distributed_roundtrip(spark, tmp_path):
    """distributed=True writes part files; reading the directory back
    recovers every record — the large-export path (no driver collect)."""
    from workbench_spark.operators.chem import df_to_sdf_file, sdf_file_to_df

    n = 500
    blocks = spark.range(n).select(
        F.concat(F.lit("mol"), F.col("id"), F.lit("\n\n\n  0  0\nM  END")).alias(
            "mol_block"
        )
    )
    out_dir = str(tmp_path / "out_sdf")
    df_to_sdf_file(blocks, out_dir, distributed=True)
    back = sdf_file_to_df(spark, out_dir)
    assert back.count() == n
    names = {r["mol_block"].splitlines()[0] for r in back.collect()}
    assert names == {f"mol{i}" for i in range(n)}
