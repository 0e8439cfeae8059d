"""Sampling tests: exact stratified sample determinism, per-stratum
counts, and the oracle parity of the registered query."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.operators.sampling import (
    stratified_sample_exact,
    stratified_sample_fraction,
)
from data_quality_checks_in_relational_database_spark.session import load_tables
from tests.conftest import SF_SMOKE


def test_exact_counts_and_determinism(spark):
    o = load_tables(spark, SF_SMOKE, ("orders",))["orders"]
    s1 = stratified_sample_exact(o, ["o_orderstatus"], "o_orderkey", 7)
    counts = {r["o_orderstatus"]: r["n"] for r in
              s1.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()}
    full = {r["o_orderstatus"]: r["n"] for r in
            o.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {k: min(7, v) for k, v in full.items()}
    # partition-invariant: same keys regardless of physical layout
    s2 = stratified_sample_exact(o.repartition(17), ["o_orderstatus"], "o_orderkey", 7)
    assert sorted(r["o_orderkey"] for r in s1.collect()) == sorted(
        r["o_orderkey"] for r in s2.collect()
    )


def test_fraction_sample_runs_map_only(spark):
    o = load_tables(spark, SF_SMOKE, ("orders",))["orders"]
    statuses = [r["o_orderstatus"] for r in o.select("o_orderstatus").distinct().collect()]
    s = stratified_sample_fraction(o, "o_orderstatus", {k: 0.5 for k in statuses})
    assert 0 < s.count() < o.count()
    # no exchange in the plan: sampleBy is a pure map
    plan = s._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_deterministic_shuffle_reproducible(spark, tmp_path):
    o = load_tables(spark, SF_SMOKE, ("orders",))["orders"]
    from data_quality_checks_in_relational_database_spark.operators.sampling import (
        deterministic_shuffle,
    )

    a = deterministic_shuffle(o, "o_orderkey", 4)
    b = deterministic_shuffle(o.repartition(13), "o_orderkey", 4)
    # same permutation independent of input layout: compare the
    # per-partition ordered key sequences
    seq_a = [r["o_orderkey"] for r in a.select("o_orderkey").collect()]
    seq_b = [r["o_orderkey"] for r in b.select("o_orderkey").collect()]
    assert seq_a == seq_b
    assert sorted(seq_a) == sorted(r["o_orderkey"] for r in o.collect())
    assert a.rdd.getNumPartitions() == 4


def test_weighted_sample_deterministic_and_filters_nonpositive(spark):
    from data_quality_checks_in_relational_database_spark.operators.sampling import (
        weighted_sample_exact,
    )

    df = spark.createDataFrame(
        [(1, 10.0, "g"), (2, 1.0, "g"), (3, 0.0, "g"), (4, -5.0, "g"), (5, None, "g"),
         (6, 2.0, "h"), (7, 2.0, "h")],
        "id long, w double, grp string",
    )
    out = weighted_sample_exact(df, "w", "id", k=2, strata=["grp"])
    rows = sorted((r.grp, r.rank, r.id) for r in out.collect())
    # zero/negative/NULL weights never drawn
    assert {r[2] for r in rows} <= {1, 2, 6, 7}
    assert [r[:2] for r in rows] == [("g", 1), ("g", 2), ("h", 1), ("h", 2)]
    # same sample under different partitioning
    again = sorted(
        (r.grp, r.rank, r.id)
        for r in weighted_sample_exact(df.repartition(5), "w", "id", k=2, strata=["grp"]).collect()
    )
    assert again == rows


def test_weighted_sample_is_weight_proportional(spark):
    """A-ES with k=1: P(row wins) = w / Σw exactly. 200 independent
    strata, one heavy row (w=9) vs 9 light rows (w=1 each): the heavy
    row should win ≈ half the strata under the md5 pseudo-uniforms."""
    from pyspark.sql import functions as F

    from data_quality_checks_in_relational_database_spark.operators.sampling import (
        weighted_sample_exact,
    )

    base = spark.range(2000).select(
        F.col("id"),
        (F.col("id") / 10).cast("long").alias("stratum"),
        F.when(F.col("id") % 10 == 0, 9.0).otherwise(1.0).alias("w"),
    )
    won = (
        weighted_sample_exact(base, "w", "id", k=1, strata=["stratum"])
        .filter(F.col("w") == 9.0)
        .count()
    )
    assert 70 <= won <= 130, f"heavy row won {won}/200 strata; expected ≈100"


def test_rebalance_to_min_cuts_to_minority(spark):
    from data_quality_checks_in_relational_database_spark.operators.sampling import (
        rebalance_to_min,
    )

    rows = [(i, "big") for i in range(10)] + [(100 + i, "small") for i in range(3)]
    df = spark.createDataFrame(rows, "id long, cls string")
    kept = rebalance_to_min(df, "cls", "id")
    by_cls = {r["cls"]: r["n"] for r in kept.groupBy("cls").agg(F.count("*").alias("n")).collect()}
    assert by_cls == {"big": 3, "small": 3}
    # deterministic: same selection on re-run and under repartitioning
    a = sorted(r["id"] for r in kept.collect())
    b = sorted(r["id"] for r in rebalance_to_min(df.repartition(7), "cls", "id").collect())
    assert a == b
