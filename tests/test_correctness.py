"""Run every registered query against its DuckDB oracle at sf0.001
(fast local replica of the driver's t2 gate, which runs at sf0.01)."""

from __future__ import annotations

import os

import pytest

from tests.oracle_utils import compare, duckdb_run

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from workbench_spark.session import get_spark

    s = get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s


def _pairs():
    import __spark_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    return [(name, q[name], o.get(name)) for name in sorted(q)]


@pytest.mark.parametrize("name,fn,oracle", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, name, fn, oracle):
    df = fn(spark, SF_DIR)
    if oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    problems = compare(df, duckdb_run(oracle, SF_DIR))
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    import __spark_entry__ as entry

    df = entry.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
