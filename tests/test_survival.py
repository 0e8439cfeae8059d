"""Kaplan-Meier gates: the textbook worked example, censoring
semantics, and the d = n dead-end collapse to exactly 0."""

import pytest

from data_quality_checks_in_relational_database_spark.operators.survival import (
    km_curve,
    user_durations,
)


def test_km_textbook_example(spark):
    # durations: deaths at 1 (n=6, d=1), censored at 2,
    # death at 3 (n=4, d=1), censored at 4, death at 5 (n=2, d=1)
    rows = [
        (1, True),
        (2, False),
        (3, True),
        (4, False),
        (5, True),
        (6, False),
    ]
    df = spark.createDataFrame(rows, "duration long, event boolean")
    got = {r["t"]: (r["n_risk"], r["d_events"], r["survival"]) for r in km_curve(df).collect()}
    s1 = 1 - 1 / 6
    s3 = s1 * (1 - 1 / 4)
    s5 = s3 * (1 - 1 / 2)
    assert got[1] == (6, 1, round(s1, 6))
    assert got[3] == (4, 1, round(s3, 6))
    assert got[5] == (2, 1, round(s5, 6))
    assert set(got) == {1, 3, 5}  # censored-only durations emit no row


def test_km_ties_censored_still_at_risk(spark):
    # death and censoring at the same t: censored subject counts in n
    df = spark.createDataFrame(
        [(1, True), (1, False), (2, True)], "duration long, event boolean"
    )
    got = {r["t"]: (r["n_risk"], r["survival"]) for r in km_curve(df).collect()}
    assert got[1] == (3, round(1 - 1 / 3, 6))


def test_km_dead_end_pins_zero(spark):
    # everyone dies at the last step: survival exactly 0.0, no ln(0)
    df = spark.createDataFrame(
        [(1, True), (2, True), (2, True)], "duration long, event boolean"
    )
    got = {r["t"]: r["survival"] for r in km_curve(df).collect()}
    assert got[2] == 0.0


def test_user_durations_censoring_rule(spark):
    rows = [
        # user 1: span 0 -> day 10 (churned: ends 20 days before horizon)
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-11 00:00:00"),
        # user 2: still active at horizon (censored)
        (2, "2024-01-05 00:00:00"),
        (2, "2024-01-31 00:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string").selectExpr(
        "user_id", "CAST(ts AS TIMESTAMP) AS ts"
    )
    got = {r["user_id"]: (r["duration"], r["event"]) for r in user_durations(ev).collect()}
    assert got[1] == (10, True)
    assert got[2] == (26, False)
