"""Unit tests: declarative rule null-semantics on crafted rows, as-of
join edge cases (ties, no-predecessor, interleaving), approx-distinct
accuracy bound."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.operators import rules as R
from data_quality_checks_in_relational_database_spark.operators.asof import asof_join
from data_quality_checks_in_relational_database_spark.plans.registry import REGISTRY
from data_quality_checks_in_relational_database_spark.session import load_tables
from tests.conftest import SF_SMOKE

TS = datetime.datetime.fromisoformat


def test_rule_null_semantics(spark):
    df = spark.createDataFrame(
        [(1, "A", 5.0), (2, None, 20.0), (None, "B", None), (1, "Z", 0.0)],
        ["k", "status", "v"],
    )
    report = {
        r["rule_name"]: r
        for r in R.evaluate_rules(
            {"t": df},
            [
                R.not_null("t", "k"),
                R.unique_key("t", "k"),
                R.accepted_values("t", "status", ["A", "B"]),
                R.in_range("t", "v", 0.0, 10.0),
                R.expression("t", "v_positive", "v > 0"),
            ],
        ).collect()
    }
    assert report["t.k.not_null"]["n_violations"] == 1
    # duplicate k=1 → 1 excess row; NULL key ignored by uniqueness
    assert report["t.k.unique"]["n_violations"] == 1
    # NULL status and 'Z' both fail accepted_values
    assert report["t.status.accepted_values"]["n_violations"] == 2
    # 20.0 out of range and NULL both fail
    assert report["t.v.in_range"]["n_violations"] == 2
    # 0.0 fails v>0, NULL fails too
    assert report["t.v_positive"]["n_violations"] == 2
    assert all(not r["passed"] for r in report.values())


def test_rule_referential_integrity(spark):
    child = spark.createDataFrame([(1,), (2,), (99,)], ["fk"])
    parent = spark.createDataFrame([(1,), (2,), (3,)], ["pk"])
    rows = R.evaluate_rules(
        {"c": child, "p": parent}, [R.referential_integrity("c", "fk", "p", "pk")]
    ).collect()
    assert rows[0]["n_violations"] == 1 and not rows[0]["passed"]


def test_asof_join_edges(spark):
    left = spark.createDataFrame(
        [
            (1, "u", TS("2024-01-01 10:00:00")),  # no predecessor
            (2, "u", TS("2024-01-02 00:00:00")),  # exact tie with right
            (3, "u", TS("2024-01-05 00:00:00")),  # picks latest of two
            (4, "v", TS("2024-01-05 00:00:00")),  # other key
        ],
        ["event_id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("u", TS("2024-01-02 00:00:00"), 100),
            ("u", TS("2024-01-03 00:00:00"), 200),
            ("v", TS("2024-01-01 00:00:00"), 300),
        ],
        ["k", "rts", "payload"],
    )
    out = {
        r["event_id"]: r["payload"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts", right_payload=["payload"]
        ).collect()
    }
    assert out[1] is None  # nothing at-or-before
    assert out[2] == 100  # tie matches
    assert out[3] == 200  # latest predecessor wins
    assert out[4] == 300  # keys don't bleed


def test_approx_distinct_within_bound(spark):
    """The registered query now carries its own ±5% tolerance verdicts
    as hash-stable booleans; both must hold on real data."""
    row = REGISTRY["approx_distinct"].fn(spark, SF_SMOKE).collect()[0]
    assert row["orders_within_tol"] is True
    assert row["users_within_tol"] is True
    assert row["exact_orders"] > 0 and row["exact_users"] > 0


def test_schema_check_contract(spark):
    df = spark.createDataFrame([(1, "x", 2.0)], ["a", "b", "c"])
    findings = R.schema_check(
        df, "t", {"a": "bigint", "b": "int", "d": "string"}, strict=True
    )
    kinds = {(f["column"], f["kind"]) for f in findings}
    assert kinds == {
        ("b", "type_mismatch"),  # string, not int
        ("d", "missing_column"),
        ("c", "unexpected_column"),
    }
    assert R.schema_check(df, "t", {"a": "bigint", "b": "string", "c": "double"}) == []


def test_schema_check_timestamp_flavors_equal(spark):
    df = spark.range(1).select(F.current_timestamp().alias("ts"))
    assert R.schema_check(df, "t", {"ts": "timestamp_ntz"}) == []


def test_metric_anomaly_detects_planted_spike(spark):
    from data_quality_checks_in_relational_database_spark.operators.anomaly import metric_anomalies

    rows = [("t", f"2024-01-{d:02d}", 100.0 + (d % 3)) for d in range(1, 11)]
    rows.append(("t", "2024-01-11", 500.0))  # 5x spike
    rows.append(("t", "2024-01-12", 101.0))  # normal again (spike inflates window)
    df = spark.createDataFrame(rows, ["k", "day", "v"])
    out = {r["day"]: r for r in metric_anomalies(df, ["k"], "day", "v").collect()}
    assert out["2024-01-11"]["is_anomaly"] is True
    assert out["2024-01-05"]["is_anomaly"] is False
    # first two days lack min_history → never flagged, z is NULL
    assert out["2024-01-01"]["z_score"] is None
    assert out["2024-01-02"]["is_anomaly"] is False


def test_session_window_gap_split(spark):
    ev = spark.createDataFrame(
        [
            (1, TS("2024-01-01 10:00:00")),
            (1, TS("2024-01-01 10:10:00")),
            (1, TS("2024-01-01 11:00:00")),  # 50-min gap → new session
        ],
        ["user_id", "ts"],
    )
    agg = (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .count()
        .orderBy("session_window.start")
        .collect()
    )
    assert [r["count"] for r in agg] == [2, 1]

def test_temporal_gaps_finds_missing_days(spark):
    from data_quality_checks_in_relational_database_spark.operators.completeness import (
        temporal_gaps,
    )

    df = spark.createDataFrame(
        [("a", "2024-01-01"), ("a", "2024-01-02"), ("a", "2024-01-05"),
         ("b", "2024-02-01")],
        ["k", "d"],
    ).selectExpr("k", "CAST(d AS TIMESTAMP) AS ts")
    gaps = {(r["series"], str(r["day"])) for r in temporal_gaps(df, "k", "ts").collect()}
    assert gaps == {("a", "2024-01-03"), ("a", "2024-01-04")}  # b has no span gaps


def test_fd_violation_counts(spark):
    from data_quality_checks_in_relational_database_spark.operators.completeness import (
        fd_violations,
    )

    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "x"), (2, "y"), (3, "z")], ["lhs", "rhs"]
    )
    row = fd_violations(df, "lhs", "rhs").collect()[0]
    assert (row["n_groups"], row["n_violating_groups"], row["max_distinct"]) == (3, 1, 2)


def test_asof_directions_and_tolerance(spark):
    """forward / nearest / tolerance semantics on crafted points:
    right rows at t=100s and t=200s; nearest ties resolve backward."""
    import datetime as dt

    from data_quality_checks_in_relational_database_spark.operators.asof import asof_join

    E = lambda s: dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)
    right = spark.createDataFrame(
        [("u", E(100), 1), ("u", E(200), 2)], ["k", "rts", "val"]
    )
    left = spark.createDataFrame(
        [("u", E(90), "a"), ("u", E(140), "b"), ("u", E(150), "c"), ("u", E(160), "d")],
        ["k", "lts", "tag"],
    )

    def run(**kw):
        out = asof_join(left, right, "k", "lts", "rts", ["val"], **kw)
        return {r["tag"]: r["val"] for r in out.collect()}

    assert run() == {"a": None, "b": 1, "c": 1, "d": 1}  # backward
    assert run(direction="forward") == {"a": 1, "b": 2, "c": 2, "d": 2}
    # nearest: 140→100 (40<60), 150→tie→backward 1, 160→200 (40<60)
    assert run(direction="nearest") == {"a": 1, "b": 1, "c": 1, "d": 2}
    # tolerance 30s: 140 is 40s from either side -> no match; 90→100 ok
    assert run(direction="nearest", tolerance_seconds=30) == {
        "a": 1,
        "b": None,
        "c": None,
        "d": None,
    }
    assert run(tolerance_seconds=50) == {"a": None, "b": 1, "c": 1, "d": None}
