"""Transform ABC + DAG composition (SURVEY §2.12).

Reference citations:
- Transform template ABC — core/transforms/transform.py:38-152:
  pre_transform → transform_impl → post_transform, typed input/output
  artifact kinds, @final transform().
- DataToDataLight / CleanData example — data_to_data/light/clean_data.py:8-53
- MetaEndpoint DAG + aggregation nodes, statically-validated column
  contracts — utils/aggregation_nodes.py:1-40, api/meta_endpoint.py:1-328

Spark-first: transform_impl maps DataFrame→DataFrame; the DAG validates
column contracts against DataFrame schemas before execution (static,
no job run), then composes branches with the J4 row-id join and A13
aggregators.
"""

from __future__ import annotations

import abc
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class Transform(abc.ABC):
    """User-defined table→table transform with the reference's template
    lifecycle. Subclass and implement transform_impl."""

    def __init__(self, **params):
        self.params = params

    def pre_transform(self, df: DataFrame) -> DataFrame:
        return df

    @abc.abstractmethod
    def transform_impl(self, df: DataFrame) -> DataFrame: ...

    def post_transform(self, df: DataFrame) -> DataFrame:
        return df

    def transform(self, df: DataFrame) -> DataFrame:
        """The @final template (transform.py:38-152)."""
        return self.post_transform(self.transform_impl(self.pre_transform(df)))


class CleanData(Transform):
    """The reference's canonical example transform (clean_data.py:8-53):
    drop rows with NULLs in the subset columns + drop duplicates."""

    def transform_impl(self, df: DataFrame) -> DataFrame:
        subset = self.params.get("subset") or df.columns
        return df.na.drop(subset=subset).dropDuplicates()


class DagNode:
    """One DAG stage: fn(DataFrame)→DataFrame with declared input/output
    column contracts (the feature-endpoint input_columns/output_columns
    contract, api/__init__.py:10-15)."""

    def __init__(
        self,
        name: str,
        fn: Callable[[DataFrame], DataFrame],
        input_columns: list[str],
        output_columns: list[str],
    ):
        self.name = name
        self.fn = fn
        self.input_columns = input_columns
        self.output_columns = output_columns


class MetaEndpointDag:
    """Parallel branches over a shared input, joined on an injected row id
    (J4) then reduced with an ensemble aggregator (A13). Column contracts
    are validated statically before any job runs
    (meta_endpoint.py:1-328 static validation)."""

    ROW_ID = "__dag_row_id"

    def __init__(self, branches: list[DagNode]):
        self.branches = branches

    def validate(self, df: DataFrame) -> list[str]:
        """Static contract check against the input schema; returns problems."""
        problems = []
        cols = set(df.columns)
        for b in self.branches:
            missing = set(b.input_columns) - cols
            if missing:
                problems.append(f"branch {b.name}: missing input columns {sorted(missing)}")
        seen: dict[str, str] = {}
        for b in self.branches:
            for c in b.output_columns:
                if c in seen:
                    problems.append(
                        f"branch {b.name}: output column {c!r} collides with {seen[c]}"
                    )
                seen[c] = b.name
        return problems

    def run(self, df: DataFrame) -> DataFrame:
        problems = self.validate(df)
        if problems:
            raise ValueError("DAG contract validation failed: " + "; ".join(problems))
        from workbench_spark.operators.joins import column_union_join

        base = df.withColumn(self.ROW_ID, F.monotonically_increasing_id())
        outs = []
        for b in self.branches:
            branch_in = base.select(self.ROW_ID, *b.input_columns)
            out = b.fn(branch_in)
            outs.append(out.select(self.ROW_ID, *b.output_columns))
        joined = column_union_join([base] + outs, self.ROW_ID)
        return joined.drop(self.ROW_ID)
