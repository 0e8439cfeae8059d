"""Property-based invariants (SURVEY §5.4) via hypothesis.

Each property runs a bounded number of examples (Spark jobs are
~100 ms each); the generators are chosen to hit the semantic edges the
differential gate can't sweep — arbitrary partition orders for money
sums, NULL patterns for row-wise stddev, skewed key multisets for the
salted join and two-phase distinct.
"""

from __future__ import annotations

import math
import statistics

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

#: cent-valued amounts (the money domain: exact at 2 decimals)
amounts = st.lists(
    st.integers(min_value=-10_000_00, max_value=10_000_00).map(lambda c: c / 100.0),
    min_size=1,
    max_size=40,
)


@given(vals=amounts, parts=st.integers(min_value=1, max_value=8))
@SET
def test_money_sum_is_partition_order_independent(spark, vals, parts):
    from data_quality_checks_in_relational_database_spark.functions.scalars import money_sum

    base = spark.createDataFrame([(v,) for v in vals], "v: double")
    a = base.coalesce(1).agg(money_sum("v").alias("s")).collect()[0]["s"]
    b = (
        base.repartition(parts)
        .agg(money_sum("v").alias("s"))
        .collect()[0]["s"]
    )
    assert a == b
    # and it equals the exact integer-cents sum
    assert a == round(sum(round(v * 100) for v in vals)) / 100.0


keys = st.lists(
    st.sampled_from(["hot"] * 6 + ["a", "b", "c", "d"]), min_size=1, max_size=30
)


@given(ks=keys, n_salts=st.integers(min_value=1, max_value=5))
@SET
def test_salted_join_equals_plain_join_property(spark, ks, n_salts):
    from data_quality_checks_in_relational_database_spark.operators.skew import salted_join

    big = spark.createDataFrame([(k, i) for i, k in enumerate(ks)], ["k", "v"])
    small = spark.createDataFrame(
        [("hot", 1), ("a", 2), ("z", 3)], ["k", "w"]
    )
    for how in ("inner", "left"):
        plain = sorted(map(tuple, big.join(small, "k", how).collect()))
        salted = sorted(
            map(tuple, salted_join(big, small, "k", n_salts=n_salts, how=how).collect())
        )
        assert plain == salted


@given(ks=keys)
@SET
def test_two_phase_distinct_equals_count_distinct(spark, ks):
    from data_quality_checks_in_relational_database_spark.operators.skew import (
        two_phase_distinct_count,
    )

    df = spark.createDataFrame(
        [(k, i % 4) for i, k in enumerate(ks)], ["g", "u"]
    )
    want = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.count_distinct("u").alias("n")).collect()
    }
    got = {
        r["g"]: r["n_distinct"]
        for r in two_phase_distinct_count(df, "g", "u").collect()
    }
    assert got == want


triples = st.tuples(
    st.one_of(st.none(), st.integers(min_value=0, max_value=10_000)),
    st.one_of(st.none(), st.integers(min_value=0, max_value=10_000)),
    st.one_of(st.none(), st.integers(min_value=0, max_value=10_000)),
)


@given(t=triples)
@SET
def test_rowwise_stddev_matches_pandas_skipna(spark, t):
    """A5 semantics: NULLs skipped, ddof = n_nonnull - 1, NULL when
    fewer than 2 values — pandas ``std(axis=1)``, which the reference
    relies on (data_consistency_checks.py:140)."""
    from data_quality_checks_in_relational_database_spark.functions.scalars import (
        rowwise_stddev_samp,
    )

    df = spark.createDataFrame([t], "a: long, b: long, c: long")
    got = df.select(rowwise_stddev_samp("a", "b", "c").alias("s")).collect()[0]["s"]
    vals = [v for v in t if v is not None]
    if len(vals) < 2:
        assert got is None
    else:
        want = statistics.stdev(vals)
        assert got is not None and math.isclose(got, want, rel_tol=1e-12, abs_tol=1e-12)


@given(
    src=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=20),
    dst_extra=st.integers(min_value=0, max_value=3),
)
@SET
def test_reconciliation_variance_zero_iff_equal(spark, src, dst_extra):
    """PP:239 invariant: variance is 0 exactly when both sides agree."""
    from data_quality_checks_in_relational_database_spark.operators.checks import reconcile

    s = spark.createDataFrame(
        [(1, "t", float(sum(src)))], ["site_id", "table_name", "record_count"]
    )
    d = spark.createDataFrame(
        [(1, "t", float(sum(src) + dst_extra))],
        ["site_id", "table_name", "record_count"],
    )
    row = reconcile(s, d, keys=["site_id", "table_name"]).collect()[0]
    assert (row["variance"] == 0) == (dst_extra == 0)
