"""Unit tests for the five check primitives on crafted data — pinning
the reference's semantic edges: outer-join NULL variance, pandas-
widening union in the fan-out, missing-table skip, and the audited
sink's post-write verification."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.operators.checks import reconcile
from data_quality_checks_in_relational_database_spark.operators.fanout import run_fanout
from data_quality_checks_in_relational_database_spark.sources.catalog import SlicedFleetCatalog
from data_quality_checks_in_relational_database_spark.sources.sinks import write_report


def test_reconcile_null_variance(spark):
    """pre_and_post_etl_checks.py:239 parity: one-sided rows propagate
    NULL through the variance (pandas NaN arithmetic)."""
    src = spark.createDataFrame(
        [("s1", "obs", 10), ("s1", "enc", 5), ("s2", "obs", 7)],
        ["site_id", "table_name", "record_count"],
    )
    dst = spark.createDataFrame(
        [("s1", "obs", 10), ("s1", "enc", 3), ("s3", "obs", 2)],
        ["site_id", "table_name", "record_count"],
    )
    out = {
        (r["site_id"], r["table_name"]): (
            r["record_count_source"],
            r["record_count_ohdl"],
            r["variance"],
        )
        for r in reconcile(src, dst, keys=["site_id", "table_name"]).collect()
    }
    assert out[("s1", "obs")] == (10, 10, 0)
    assert out[("s1", "enc")] == (5, 3, 2)
    assert out[("s2", "obs")] == (7, None, None)  # source-only → NULL variance
    assert out[("s3", "obs")] == (None, 2, None)  # dest-only → NULL variance


def test_fanout_skips_missing_and_widens_schema(spark):
    t1 = spark.createDataFrame([(1, "x")], ["site", "a"])
    tables = {"t1": t1}
    cat = SlicedFleetCatalog(
        tables,
        slices={"s1": F.lit(True), "s2": F.lit(True), "s3": F.lit(True)},
        missing={("s2", "t1")},
    )
    calls = []

    def check(src, tabs):
        calls.append(src)
        df = tabs["t1"].select(F.lit(src).alias("source"), F.count(F.lit(1)).alias("n"))
        if src == "s3":  # extra column → pandas-style widening on union
            df = df.withColumn("extra", F.lit(1))
        return df

    result = run_fanout(cat, check, required_tables=["t1"])
    assert result.attempted == 3 and result.succeeded == 2
    assert result.skipped == [("s2", "t1")]
    rows = {r["source"]: (r["n"], r["extra"]) for r in result.report.collect()}
    assert rows == {"s1": (1, None), "s3": (1, 1)}  # widened with NULLs


def test_write_report_audit(spark):
    df = spark.range(5).withColumnRenamed("id", "k")
    with tempfile.TemporaryDirectory() as d:
        audit = write_report(df, f"{d}/report", expected_count=5)
        assert audit.ok and audit.rows_written == 5
        audit2 = write_report(df, f"{d}/report", mode="append", expected_count=5)
        assert not audit2.ok and audit2.rows_written == 10  # append doubled

def test_rule_violation_rows_tags_offenders(spark):
    """Side-output must name exactly the rules each bad row breaks,
    cap per-rule samples, and emit nothing for clean data."""
    from data_quality_checks_in_relational_database_spark.operators import rules as R

    df = spark.createDataFrame(
        [(1, "ok", 5.0), (2, None, 5.0), (3, "ok", -1.0), (4, None, -2.0)],
        "id long, status string, amount double",
    )
    rs = [
        R.not_null("t", "status"),
        R.in_range("t", "amount", 0.0, 10.0),
    ]
    got = {
        (r.rule_name, r.id)
        for r in R.rule_violation_rows(df, rs, key_cols=["id"]).collect()
    }
    assert got == {
        ("t.status.not_null", 2),
        ("t.status.not_null", 4),
        ("t.amount.in_range", 3),
        ("t.amount.in_range", 4),
    }
    capped = R.rule_violation_rows(df, rs, key_cols=["id"], max_rows_per_rule=1).collect()
    assert len(capped) == 2  # one sample per rule
    clean = df.filter("id = 1")
    assert R.rule_violation_rows(clean, rs, key_cols=["id"]).count() == 0
