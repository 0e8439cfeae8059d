"""Survival analysis: the Kaplan-Meier product-limit estimator.

No counterpart in the reference (two tabular DQ scripts); extension
for the retention-analysis surface next to the cohort triangle
(``retention``) and funnel family: churn curves with CENSORING — users
still active at observation end must not count as churned, which the
plain retention triangle cannot express.

Scale shape:

- one keyed aggregation builds per-subject (duration, event) rows —
  the only corpus-sized shuffle;
- the estimator itself runs on the DISTINCT-duration table (bounded by
  the observation window in days, not by subjects), so the global
  windows below are single-partition over a bounded frame by
  construction;
- the survival product is computed as exp(Σ ln(1 - d/n)) — the
  associative form (a running product has no distributed equivalent);
  a step where d = n (everyone at risk dies) would be ln(0), so a
  cumulative zero-flag pins S to exactly 0.0 from that step on and the
  log-sum skips the zero factor (DuckDB raises on ln(0), Spark would
  return -inf — the flag makes both engines emit the same 0.0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def km_curve(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    prec: int = 6,
) -> DataFrame:
    """Kaplan-Meier curve from per-subject ``(duration, event)`` rows
    (``event`` true = the terminal event was observed, false =
    censored at ``duration``). Output: one row per duration where at
    least one terminal event occurred — ``(t, n_risk, d_events,
    survival)`` with S(t) rounded to ``prec``.

    Ties convention (the standard one): subjects censored at t are
    still at risk for the deaths at t.
    """
    per_t = df.groupBy(F.col(duration_col).alias("t")).agg(
        F.count(F.lit(1)).alias("n_here"),
        F.sum(F.col(event_col).cast("long")).alias("d_events"),
    )
    # at-risk = suffix sum over durations (bounded frame: distinct t's)
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = per_t.withColumn("n_risk", F.sum("n_here").over(w_desc))
    w_asc = Window.orderBy(F.col("t").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dead_end = F.max(
        (F.col("d_events") == F.col("n_risk")).cast("int")
    ).over(w_asc)
    log_sum = F.sum(
        F.when(
            F.col("d_events") < F.col("n_risk"),
            F.log(F.lit(1.0) - F.col("d_events") / F.col("n_risk")),
        )
    ).over(w_asc)
    curve = risk.withColumn(
        "survival",
        F.when(dead_end == 1, F.lit(0.0)).otherwise(F.exp(log_sum)),
    )
    return (
        curve.where(F.col("d_events") > 0)
        .select(
            "t",
            "n_risk",
            F.col("d_events").cast("long").alias("d_events"),
            (F.round("survival", prec) + F.lit(0.0)).alias("survival"),
        )
    )


def user_durations(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    churn_gap_days: int = 7,
) -> DataFrame:
    """Per-user observation spans from an event stream: duration =
    days between first and last event; a user whose last event falls
    within ``churn_gap_days`` of the stream's global maximum timestamp
    is CENSORED (still active at observation end), otherwise their
    span ended in churn. The global max is a 1-row broadcast."""
    spans = events.groupBy(user_col).agg(
        F.min(ts_col).alias("first_ts"), F.max(ts_col).alias("last_ts")
    )
    horizon = events.agg(F.max(ts_col).alias("horizon"))
    return spans.crossJoin(F.broadcast(horizon)).select(
        F.col(user_col),
        F.datediff(F.col("last_ts").cast("date"), F.col("first_ts").cast("date"))
        .cast("long")
        .alias("duration"),
        (
            F.col("last_ts")
            < F.col("horizon") - F.expr(f"INTERVAL {churn_gap_days} DAYS")
        ).alias("event"),
    )
