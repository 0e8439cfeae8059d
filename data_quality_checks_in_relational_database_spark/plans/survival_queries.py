"""Kaplan-Meier retention survival over the events stream, with a
DuckDB oracle replaying the product-limit estimator (suffix-sum at-risk
counts, log-sum product, cumulative dead-end flag) in pure SQL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_quality_checks_in_relational_database_spark.operators.survival import (
    km_curve,
    user_durations,
)
from data_quality_checks_in_relational_database_spark.session import load_tables

# churn gate sized to the synthetic stream: user last-event lag to the
# horizon has median ~7h / p90 ~24h, so a 1-day inactivity gap yields
# churned (uncensored) users at EVERY shipped SF (1/15 at sf0.001,
# 17/150 at sf0.01, 156/1500 at sf0.1) — the r3 value of 7 days
# censored every user and the registered query returned 0 rows
# (vacuous oracle match); pinned non-empty in tests/test_round4_ops.py
_CHURN_GAP_DAYS = 1


def q_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KM churn curve of user lifetimes: duration = days between a
    user's first and last event, censored when the last event is
    within ``_CHURN_GAP_DAYS`` of the stream horizon. One keyed
    aggregation over events; the estimator runs on the bounded
    distinct-duration table."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return km_curve(user_durations(ev, churn_gap_days=_CHURN_GAP_DAYS))


ORACLE_SURVIVAL_KM = f"""
WITH spans AS (
    SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts
    FROM events GROUP BY user_id
),
h AS (SELECT MAX(ts) AS horizon FROM events),
per_user AS (
    SELECT date_diff('day', CAST(first_ts AS DATE), CAST(last_ts AS DATE))
             AS duration,
           last_ts < horizon - INTERVAL {_CHURN_GAP_DAYS} DAY AS event
    FROM spans, h
),
per_t AS (
    SELECT duration AS t, COUNT(*) AS n_here,
           SUM(CASE WHEN event THEN 1 ELSE 0 END) AS d_events
    FROM per_user GROUP BY duration
),
risk AS (
    SELECT t, n_here, d_events,
           SUM(n_here) OVER (ORDER BY t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
    FROM per_t
),
curve AS (
    SELECT t, n_risk, d_events,
           MAX(CASE WHEN d_events = n_risk THEN 1 ELSE 0 END)
               OVER w AS dead_end,
           SUM(CASE WHEN d_events < n_risk
                    THEN LN(1.0 - CAST(d_events AS DOUBLE) / n_risk) END)
               OVER w AS log_sum
    FROM risk
    WINDOW w AS (ORDER BY t ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT t, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d_events AS BIGINT) AS d_events,
       ROUND(CASE WHEN dead_end = 1 THEN 0.0 ELSE EXP(log_sum) END, 6) + 0.0
         AS survival
FROM curve
WHERE d_events > 0
"""


def q_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion experiment readout: users split 50/50 into A/B by
    md5(user_id) parity (deterministic, leakage-safe — same rule as
    ``hash_split``), conversion = the user made at least 14 'purchase'
    events (above the synthetic stream's ~13.3 mean, so both outcomes
    occur at every SF). Output: one row with per-arm sizes and rates
    plus the pooled two-proportion z statistic (NULL if an arm is
    degenerate). One keyed aggregation over events; everything after
    is a 2-row frame."""
    from pyspark.sql import functions as F

    from data_quality_checks_in_relational_database_spark.functions.scalars import md5_u60

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    per_user = ev.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("long")) >= 14
        )
        .cast("int")
        .alias("converted")
    )
    arms = per_user.select(
        F.when(md5_u60(F.col("user_id").cast("string")) % 2 == 0, "A")
        .otherwise("B")
        .alias("arm"),
        "converted",
    )
    g = arms.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    a = g.where(F.col("arm") == "A").select(
        F.col("n").alias("n_a"), F.col("conv").alias("conv_a")
    )
    b = g.where(F.col("arm") == "B").select(
        F.col("n").alias("n_b"), F.col("conv").alias("conv_b")
    )
    j = a.crossJoin(F.broadcast(b))  # two 1-row frames
    p_a = F.col("conv_a") / F.col("n_a")
    p_b = F.col("conv_b") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(pool * (1 - pool) * (1 / F.col("n_a") + 1 / F.col("n_b")))
    return j.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        (F.round(p_a, 6) + F.lit(0.0)).alias("rate_a"),
        (F.round(p_b, 6) + F.lit(0.0)).alias("rate_b"),
        (F.round(F.try_divide(p_a - p_b, se), 6) + F.lit(0.0)).alias("z_score"),
    )


ORACLE_AB_ZTEST = """
WITH per_user AS (
    SELECT user_id,
           CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
                THEN 1 ELSE 0 END AS converted
    FROM events GROUP BY user_id
),
arms AS (
    SELECT CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                     AS BIGINT) % 2 = 0
                THEN 'A' ELSE 'B' END AS arm,
           converted
    FROM per_user
),
g AS (
    SELECT arm, COUNT(*) AS n, SUM(converted) AS conv FROM arms GROUP BY arm
),
j AS (
    SELECT a.n AS n_a, a.conv AS conv_a, b.n AS n_b, b.conv AS conv_b
    FROM (SELECT n, conv FROM g WHERE arm = 'A') a,
         (SELECT n, conv FROM g WHERE arm = 'B') b
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS conv_a,
       CAST(n_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS conv_b,
       ROUND(CAST(conv_a AS DOUBLE) / n_a, 6) + 0.0 AS rate_a,
       ROUND(CAST(conv_b AS DOUBLE) / n_b, 6) + 0.0 AS rate_b,
       ROUND((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
             / NULLIF(SQRT((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)), 0), 6) + 0.0 AS z_score
FROM j
"""
