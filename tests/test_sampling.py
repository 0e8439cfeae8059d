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
