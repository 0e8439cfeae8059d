"""Markov removal-effect gates: a hand-solved journey set (acyclic, so
the fixed-step iteration is exact), plus transition-extraction edge
cases (truncation at first conversion, unconverted tails)."""

from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.operators.attribution import (
    journey_transitions,
    markov_removal_effects,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, f"2024-01-01 00:0{i}:00", t, i) for i, (u, t) in enumerate(rows)],
        "user_id long, ts string, event_type string, event_id long",
    ).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type", "event_id"
    )


def test_journey_transitions_truncate_and_tails(spark):
    ev = _events(
        spark,
        [
            (1, "view"), (1, "click"), (1, "purchase"), (1, "view"),  # post-conv dropped
            (2, "view"), (2, "purchase"),
            (3, "click"),  # never converts -> tail to NULL
        ],
    )
    got = {(r["src"], r["dst"]): r["n"] for r in journey_transitions(ev).collect()}
    assert got == {
        ("START", "view"): 2,
        ("START", "click"): 1,
        ("view", "click"): 1,
        ("view", "CONV"): 1,
        ("click", "CONV"): 1,
        ("click", "NULL"): 1,
    }


def test_removal_effects_hand_solved(spark):
    ev = _events(
        spark,
        [
            (1, "view"), (1, "click"), (1, "purchase"),
            (2, "view"), (2, "purchase"),
            (3, "click"),
        ],
    )
    got = {r["channel"]: r for r in markov_removal_effects(ev).collect()}
    # exact absorption: p_base = 2/3; remove view -> 1/6; remove click -> 1/3
    assert got["view"]["p_base"] == round(2 / 3, 6)
    assert got["view"]["p_removed"] == round(1 / 6, 6)
    assert got["view"]["removal_effect"] == 0.75
    assert got["click"]["p_removed"] == round(1 / 3, 6)
    assert got["click"]["removal_effect"] == 0.5
    assert got["view"]["share"] == 0.6
    assert got["click"]["share"] == 0.4
