"""Tests: snapshot diff classification, salted-join equivalence on
skewed data, bucketed co-located joins (no exchange in the plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.operators.diff import snapshot_diff
from data_quality_checks_in_relational_database_spark.operators.skew import salted_join


def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        ["k", "s", "v"],
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (4, None, 40.0), (5, "e", 50.0)],
        ["k", "s", "v"],
    )
    got = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "unchanged",  # NULL == NULL under null-safe equality
        5: "added",
    }


def test_salted_join_equals_plain_join(spark):
    # skewed: one hot key with 5000 rows, 50 cold keys
    big = spark.range(5000).select(F.lit("hot").alias("k"), F.col("id").alias("v")).unionByName(
        spark.range(50).select(F.concat(F.lit("k"), "id").alias("k"), F.col("id").alias("v"))
    )
    small = spark.createDataFrame(
        [("hot", 1)] + [(f"k{i}", i) for i in range(0, 50, 2)] + [("nomatch", 9)],
        ["k", "w"],
    )
    plain = big.join(small, "k").groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    salted = salted_join(big, small, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    small = spark.createDataFrame([("a", 10)], ["k", "w"])
    rows = {r["k"]: r["w"] for r in salted_join(big, small, "k", how="left").collect()}
    assert rows == {"a": 10, "b": None}


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key co-locates the join: the
    executed plan must contain no hash-partitioning exchange."""
    o = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    li = spark.range(3000).select((F.col("id") % 1000).alias("k"), F.col("id").alias("b"))
    spark.sql("DROP TABLE IF EXISTS b_left")
    spark.sql("DROP TABLE IF EXISTS b_right")
    o.write.bucketBy(8, "k").sortBy("k").saveAsTable("b_left")
    li.write.bucketBy(8, "k").sortBy("k").saveAsTable("b_right")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_right").join(spark.table("b_left"), "k")
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")

def test_psi_report_hand_computed(spark):
    """2-bin toy: base 50/50, current 80/20 — PSI terms must match the
    closed-form (p-q)·ln(p/q) per bin; empty-side bins yield NULL."""
    import math

    from data_quality_checks_in_relational_database_spark.operators.diff import psi_report

    base = spark.createDataFrame([(float(v),) for v in [1] * 5 + [11] * 5], ["v"])
    curr = spark.createDataFrame([(float(v),) for v in [1] * 8 + [11] * 2], ["v"])
    rows = {r["bin"]: r for r in psi_report(base, curr, "v", [0.0, 10.0, 20.0]).collect()}
    assert rows[0]["base_n"] == 5 and rows[0]["curr_n"] == 8
    expect0 = (0.8 - 0.5) * math.log(0.8 / 0.5)
    expect1 = (0.2 - 0.5) * math.log(0.2 / 0.5)
    assert rows[0]["psi_term"] == pytest.approx(expect0, abs=1e-6)
    assert rows[1]["psi_term"] == pytest.approx(expect1, abs=1e-6)
    # clamping: out-of-range values land in the end bins
    base2 = spark.createDataFrame([(-5.0,), (25.0,)], ["v"])
    got = {r["bin"]: r["base_n"] for r in psi_report(base2, base2, "v", [0.0, 10.0, 20.0]).collect()}
    assert got == {0: 1, 1: 1}


def test_psi_empty_side_bin_is_null(spark):
    from data_quality_checks_in_relational_database_spark.operators.diff import psi_report

    base = spark.createDataFrame([(1.0,), (15.0,)], ["v"])
    curr = spark.createDataFrame([(1.0,), (1.0,)], ["v"])
    rows = {r["bin"]: r for r in psi_report(base, curr, "v", [0.0, 10.0, 20.0]).collect()}
    assert rows[1]["curr_n"] == 0 and rows[1]["psi_term"] is None


def test_top_terms_tfidf_crafted(spark):
    """Term unique to one group must out-rank corpus-wide terms there;
    a term in every doc has idf ln(1)=0 and never ranks above it."""
    from data_quality_checks_in_relational_database_spark.operators.text import top_terms_tfidf

    rows = [
        (1, "en", "common zebra zebra"),
        (2, "en", "common zebra"),
        (3, "fr", "common voiture"),
        (4, "fr", "common voiture voiture"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = top_terms_tfidf(df, top_n=2).collect()
    top = {(r["lang"], r["rank"]): r for r in out}
    assert top[("en", 1)]["term"] == "zebra" and top[("en", 1)]["total_tf"] == 3
    assert top[("fr", 1)]["term"] == "voiture"
    # 'common' appears in all 4 docs -> idf = ln(4/4) = 0 -> tfidf 0
    assert top[("en", 2)]["term"] == "common" and top[("en", 2)]["tfidf"] == 0.0


def test_key_skew_report_ranks_and_shares(spark):
    from data_quality_checks_in_relational_database_spark.operators.skew import key_skew_report

    df = spark.createDataFrame(
        [("hot",)] * 10 + [("warm",)] * 3 + [("c1",), ("c2",), ("c3",)], ["k"]
    )
    rows = key_skew_report(df, "k", top_n=3).orderBy("rank").collect()
    assert [(r["key"], r["key_count"], r["rank"]) for r in rows] == [
        ("hot", 10, 1),
        ("warm", 3, 2),
        ("c1", 1, 3),  # count ties break by key ascending
    ]
    assert all(r["n_keys"] == 5 and r["total_rows"] == 16 for r in rows)
    assert rows[0]["share"] == 10 / 16


def test_checksum_reconcile_catches_cell_corruption(spark):
    """Equal row counts with one corrupted cell: count reconciliation
    (the reference's J1) passes, content checksums must not."""
    from pyspark.sql import functions as F

    from data_quality_checks_in_relational_database_spark.operators.diff import (
        checksum_reconcile,
        content_checksum,
    )

    src = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "id long, name string, amount long",
    ).withColumn("grp", F.col("id") % 2)
    dst = src.withColumn(
        "amount", F.when(F.col("id") == 3, 31).otherwise(F.col("amount"))
    )
    out = {r.grp: r for r in checksum_reconcile(src, dst, ["id", "name", "amount"], "grp").collect()}
    # counts agree in every group...
    assert all(out[g].src_rows == out[g].dst_rows == 2 for g in (0, 1))
    # ...but the corrupted group's content does not (id=3 → grp 1)
    assert not out[1].content_match
    assert out[0].content_match
    # identical frames reconcile clean
    clean = checksum_reconcile(src, src, ["id", "name", "amount"], "grp").collect()
    assert all(r.content_match for r in clean)
    # checksum is insensitive to row order / partitioning
    a = content_checksum(src, ["id", "name", "amount"], "grp").collect()
    b = content_checksum(src.repartition(7).sortWithinPartitions("name"), ["id", "name", "amount"], "grp").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_schema_drift_classifies_changes(spark):
    from pyspark.sql import functions as F

    from data_quality_checks_in_relational_database_spark.operators.diff import schema_drift

    old = spark.createDataFrame([(1, "a", 1.5)], "id long, name string, score double")
    new = (
        spark.createDataFrame([(1, "a", 2)], "id long, name string, score long")
        .withColumn("added_col", F.lit("x"))
        .drop("name")
        .select("id", "score", "added_col")
    )
    got = {(r.column, r.change) for r in schema_drift(old, new).collect()}
    assert got == {
        ("added_col", "added"),
        ("name", "removed"),
        ("score", "type_changed"),
    }
    assert schema_drift(old, old).count() == 0


def test_wasserstein_hand_computed(spark):
    """Toy cohorts: a = {0,0,10,10}, b = {0,10,10,10} → ECDFs differ by
    1/4 on [0,10) → W1 = 0.25·10 = 2.5. Shifted-constant cohorts give
    exactly the shift."""
    from data_quality_checks_in_relational_database_spark.operators.diff import (
        wasserstein_two_sample,
    )

    a = spark.createDataFrame([(0.0,), (0.0,), (10.0,), (10.0,)], ["v"])
    b = spark.createDataFrame([(0.0,), (10.0,), (10.0,), (10.0,)], ["v"])
    row = wasserstein_two_sample(a, b, "v").collect()[0]
    assert (row.n_a, row.n_b, row.w1) == (4, 4, 2.5)
    c = spark.createDataFrame([(3.0,), (3.0,)], ["v"])
    d = spark.createDataFrame([(8.0,), (8.0,)], ["v"])
    assert wasserstein_two_sample(c, d, "v").collect()[0].w1 == 5.0
    # identical cohorts → zero distance
    assert wasserstein_two_sample(a, a, "v").collect()[0].w1 == 0.0
