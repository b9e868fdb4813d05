"""Spark-native synthetic data generation — the SyntheticDataGenerator
API surface (reference utils/synthetic_data_generator.py:11-405), used
throughout the reference's tests and demos.

Re-expressed distributively: every dataset is built from ``spark.range``
plus seeded JVM ``rand``/``randn`` column expressions — no driver-side
numpy arrays, so a 10-billion-row synthetic corpus generates in parallel
exactly like a real table scan. Behavioral parity is shape-level, not
bit-level (the reference delegates to sklearn's make_regression /
numpy's global RNG; a distributed generator cannot and should not
reproduce that exact stream): same columns, same distributions, same
correlation structure, tested by measuring the statistics.

Note on seeded rand(): Spark seeds per-partition, so values depend on
the partition layout. Each generator pins its partitioning (repartition
by id) to keep a given (seed, n) call deterministic across runs on the
same cluster size; across different parallelism the DISTRIBUTION holds
but individual rows differ — documented, as with any distributed RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FOODS = ["pizza", "tacos", "steak", "sushi"]


class SyntheticDataGenerator:
    """API parity with the reference generator; every method returns a
    Spark DataFrame."""

    def __init__(self, spark: SparkSession | None = None, seed: int = 42):
        from workbench_spark.session import get_spark

        self.spark = spark or get_spark()
        self.seed = seed

    # ------------------------------------------------------------ ml_data
    def ml_data(
        self,
        n_samples: int = 1000,
        n_features: int = 4,
        target_type: str = "regression",
    ) -> DataFrame:
        """make_regression / make_classification shape: n_features standard
        normals, the first n_features-2 informative. Regression target =
        weighted sum + 10% noise; classification = sign of the same score
        (balanced classes around the median score 0)."""
        if target_type not in ("regression", "classification"):
            raise ValueError(f"Unknown target_type: {target_type}")
        n_inf = max(1, n_features - 2)
        df = self.spark.range(n_samples).repartition(8, "id")
        for i in range(n_features):
            df = df.withColumn(f"feature_{i}", F.randn(self.seed + i))
        # deterministic informative weights in [20, 100) (sklearn draws
        # uniform(0, 100); fixed spread keeps the call reproducible)
        weights = [20.0 + 80.0 * (i + 1) / n_inf for i in range(n_inf)]
        score = sum(
            (F.col(f"feature_{i}") * w for i, w in enumerate(weights)),
            F.lit(0.0),
        )
        if target_type == "regression":
            df = df.withColumn(
                "target", score + F.randn(self.seed + 1000) * 0.1 * score
            )
        else:
            df = df.withColumn("target", (score > 0).cast("int"))
        return df.drop("id")

    # ----------------------------------------------------- confidence_data
    def confidence_data(self, n_samples: int = 2000) -> DataFrame:
        """The S-curve confidence fixture: dense x in [-10, 5], sparse
        quadratic tail in [5, 10], log-shaped target with x-proportional
        noise, plus the coincident-x IQR probe points."""
        n_even = int(n_samples * 7 / 8)
        n_sparse = n_samples - n_even
        even = self.spark.range(n_even).select(
            (F.lit(-10.0) + F.col("id") * (15.0 / max(n_even - 1, 1))).alias("x")
        )
        sparse = self.spark.range(n_sparse).select(
            (
                F.lit(5.0)
                + F.pow(F.col("id") / max(n_sparse - 1, 1), 2.0) * 5.0
            ).alias("x")
        )
        x = even.unionByName(sparse).repartition(8, "x")
        adj = F.when(F.col("x") >= 0, F.col("x") + 1 + 1e-6).otherwise(
            -F.col("x") + 1 + 1e-6
        )
        sgn = F.when(F.col("x") >= 0, F.lit(1.0)).otherwise(F.lit(-1.0))
        y = sgn * F.log(adj) / F.log(F.lit(100.0)) + F.randn(self.seed) * 0.02 * F.abs(
            F.col("x")
        )
        base = x.select(F.col("x").alias("feature_1"), y.alias("target"))
        probe_rows = []
        for i in range(3):
            delta = 0.1 + 0.05 * i
            for off in (-0.1, 0.0, 0.1):
                for xv in (-0.5, 0.0, 0.5):
                    probe_rows.append((xv, -delta + off))
                    probe_rows.append((xv, delta + off))
        probes = self.spark.createDataFrame(
            probe_rows, "feature_1 double, target double"
        )
        return base.unionByName(probes)

    # ----------------------------------------------- ensemble_branch_data
    def ensemble_branch_data(
        self,
        n_samples: int = 2000,
        n_branches: int = 3,
        noise: float = 1.0,
        error_corr: float = 0.0,
        conf_quality: float = 0.5,
        branch_noise: list[float] | None = None,
    ) -> DataFrame:
        """Synthetic child-model prediction branches with CONTROLLED error
        level and inter-branch error correlation — the scenario input of
        the EnsembleSimulator sweep (reference ensemble_simulator.py
        analyzes real cross-fold captures; this generator synthesizes the
        same (target, {p_i}, {c_i}) shape over a parameter grid so
        strategies can be ranked across hypothetical model families).

        Error model: e_i = √ρ·shared + √(1−ρ)·own_i, so
        corr(e_i, e_j) = ρ exactly (in expectation). p_i = y + σ_i·e_i
        with σ_i = noise·(1 + i/4) by default (branches get progressively
        worse so best/worst/inverse-MAE strategies have signal), or
        ``branch_noise`` per branch. Confidence: c_i mixes an oracle
        signal 1/(1+|e_i|) with uniform junk at ``conf_quality`` — q=1 is
        perfectly informative confidence, q=0 pure noise.

        Columns: (id, target, p_0..p_{m-1}, c_0..c_{m-1}). Everything is
        seeded JVM randn/rand over a pinned partitioning (header note)."""
        if not 0.0 <= error_corr <= 1.0:
            raise ValueError(f"error_corr must be in [0,1], got {error_corr}")
        sig = branch_noise or [noise * (1 + i / 4) for i in range(n_branches)]
        if len(sig) != n_branches:
            raise ValueError("branch_noise length must equal n_branches")
        df = self.spark.range(n_samples).repartition(8, "id")
        y = F.col("id").cast("double") % 100 + F.randn(self.seed) * 5.0
        df = df.withColumn("target", y).withColumn(
            "__shared", F.randn(self.seed + 500)
        )
        a = error_corr ** 0.5
        b = (1.0 - error_corr) ** 0.5
        cols = [F.col("id"), F.col("target")]
        for i in range(n_branches):
            e_i = F.lit(a) * F.col("__shared") + F.lit(b) * F.randn(
                self.seed + 1000 + i
            )
            df = df.withColumn(f"__e_{i}", e_i)
            cols.append(
                (F.col("target") + F.lit(sig[i]) * F.col(f"__e_{i}")).alias(f"p_{i}")
            )
        for i in range(n_branches):
            oracle = 1.0 / (1.0 + F.abs(F.col(f"__e_{i}")))
            junk = F.rand(self.seed + 2000 + i)
            cols.append(
                (F.lit(conf_quality) * oracle + F.lit(1 - conf_quality) * junk).alias(
                    f"c_{i}"
                )
            )
        return df.select(*cols)

    # --------------------------------------- regression_with_varying_noise
    def regression_with_varying_noise(self, n_samples: int = 1000) -> DataFrame:
        """feature 0..n, target = feature + 1000 ± 10% heteroscedastic
        noise — the UQ calibration fixture."""
        df = self.spark.range(n_samples).repartition(8, "id")
        feat = F.col("id").cast("float")
        noise = (F.rand(self.seed) * 0.2 - 0.1) * feat
        return df.select(
            feat.alias("feature"),
            (feat + 1000.0 + noise).alias("target"),
        )

    # ------------------------------------------------------------ persons
    def person_data(self, rows: int = 100) -> DataFrame:
        """The EDA demo table: Id/Name/Height/Weight/Salary/Age/IQ_Score/
        Food/Likes_Dogs/Date with the reference's correlation structure
        (weight↗height, salary↗height, age↗salary, IQ↘salary,
        dogs↗IQ), salary outliers, and ~10% Food NULLs."""
        df = self.spark.range(1, rows + 1).repartition(8, "id")
        df = df.select(
            F.col("id").cast("int").alias("Id"),
            F.concat(F.lit("Person "), F.col("id")).alias("Name"),
            (F.lit(68.0) + F.randn(self.seed) * 4.0).alias("Height"),
        )
        df = self.generate_correlated_series(df, "Height", "Weight", 0.2, 100, 300)
        df = self.generate_correlated_series(df, "Height", "Salary", 0.3, 80000, 200000)
        df = self.generate_correlated_series(df, "Salary", "Age", 0.5, 20, 80)
        df = self.generate_correlated_series(df, "Salary", "IQ_Score", -0.6, 100, 150)
        df = self.generate_correlated_series(df, "Salary", "__food", 1.0, -1.5, 4.4)
        df = self.generate_correlated_series(df, "IQ_Score", "__dogs", 0.75, -0.5, 1.5)
        food_arr = F.array(*[F.lit(x) for x in _FOODS])
        food_idx = F.least(
            F.greatest(F.round("__food").cast("int"), F.lit(0)),
            F.lit(len(_FOODS) - 1),
        )
        df = (
            df.withColumn(
                "Food",
                F.when(
                    F.rand(self.seed + 7) < 0.1, F.lit(None).cast("string")
                ).otherwise(F.element_at(food_arr, food_idx + 1)),
            )
            .withColumn(
                "Likes_Dogs",
                F.least(F.greatest(F.round("__dogs"), F.lit(0)), F.lit(1)) == 1,
            )
            .withColumn(
                "Date",
                F.to_timestamp(F.lit("2022-01-01"))
                + F.make_interval(
                    F.lit(0), F.lit(0), F.lit(0),
                    ((F.col("Id") - 1) * 364 / F.lit(max(rows - 1, 1))).cast("int"),
                ),
            )
            .withColumn("Age", F.col("Age").cast("int"))
            .drop("__food", "__dogs")
        )
        # salary outliers: bump the top 4 into the 200-230k band
        top4 = df.orderBy(F.col("Salary").desc()).limit(4).select("Id").withColumn(
            "__bump", F.lit(True)
        )
        return (
            df.join(F.broadcast(top4), "Id", "left")
            .withColumn(
                "Salary",
                F.when(
                    F.col("__bump"),
                    200000 + F.rand(self.seed + 9) * 30000,
                ).otherwise(F.col("Salary")),
            )
            .drop("__bump")
        )

    # ------------------------------------------------------------ helpers
    @staticmethod
    def pearson_correlation(df: DataFrame, x: str, y: str) -> float:
        return float(df.agg(F.corr(x, y)).collect()[0][0])

    def generate_correlated_series(
        self,
        df: DataFrame,
        src_col: str,
        out_col: str,
        target_corr: float,
        min_val: float,
        max_val: float,
    ) -> DataFrame:
        """Closed-form correlated column: y = ρ·z(x) + √(1−ρ²)·ε then
        min-max rescaled into [min_val, max_val]. The reference adjusts a
        numpy series iteratively toward ρ; the closed form hits E[corr]=ρ
        directly (rescaling is affine, so correlation is preserved) —
        same contract, deterministic plan.

        The 1-row stats (μ, σ, lo, hi) are collected eagerly and embedded
        as literals, NOT cross-joined as sub-plans: person_data chains six
        of these, and a lazy agg-crossJoin at each level re-references the
        whole upstream plan ~3×, blowing the logical plan up exponentially
        (3^6 leaf copies — minutes of Catalyst analysis for a 100-row
        fixture). Collecting a single aggregate row is an O(scan) action
        at any SF and keeps the plan a flat chain of withColumns. randn()
        is seeded and the partitioning pinned, so re-evaluating __y after
        the min/max action reproduces the same values."""
        mu, sd = df.agg(
            F.avg(src_col).alias("mu"), F.stddev(src_col).alias("sd")
        ).collect()[0]
        rho = float(target_corr)
        mix = F.lit(rho) * (F.col(src_col) - F.lit(mu)) / F.lit(sd) + F.lit(
            (1 - rho**2) ** 0.5
        ) * F.randn(self.seed + sum(map(ord, out_col)))
        with_y = df.withColumn("__y", mix)
        lo, hi = with_y.agg(
            F.min("__y").alias("lo"), F.max("__y").alias("hi")
        ).collect()[0]
        return with_y.withColumn(
            out_col,
            F.lit(min_val)
            + (F.col("__y") - F.lit(lo))
            / F.lit(hi - lo)
            * (max_val - min_val),
        ).drop("__y")
