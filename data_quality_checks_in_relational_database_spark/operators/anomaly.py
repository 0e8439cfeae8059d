"""Metric anomaly detection over DQ check history.

The reference's checks emit point-in-time reports; the operational
question is always "is today's number NORMAL?". This operator answers
it: given a metric time series (e.g. daily row counts per source ×
table — exactly what ``volume_audit`` accumulates run over run), flag
points whose z-score against their trailing window exceeds a
threshold.

Pure window functions — one shuffle on the series key, state bounded
by the frame. The same transform works over the streaming DQA sink
(``streaming.quality``) read back as a batch table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def metric_anomalies(
    history: DataFrame,
    keys: list[str],
    time_col: str,
    value_col: str,
    trailing: int = 7,
    z_threshold: float = 3.0,
    min_history: int = 3,
) -> DataFrame:
    """Append trailing-window stats and an anomaly flag per point.

    The frame is the ``trailing`` PRECEDING rows excluding the current
    one (no self-contamination). Points with fewer than ``min_history``
    predecessors or zero variance are never flagged (insufficient
    evidence), mirroring standard control-chart practice.

    Output: ``(*keys, time_col, value_col, trailing_mean, trailing_std,
    z_score, is_anomaly)``.
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(time_col).asc())
        .rowsBetween(-trailing, -1)
    )
    mean = F.avg(F.col(value_col)).over(w)
    std = F.stddev_samp(F.col(value_col)).over(w)
    n_hist = F.count(F.col(value_col)).over(w)
    z = (F.col(value_col) - F.col("trailing_mean")) / F.col("trailing_std")
    out = (
        history.select(*keys, time_col, value_col)
        .withColumn("trailing_mean", mean)
        .withColumn("trailing_std", std)
        .withColumn("n_history", n_hist)
        .withColumn(
            "z_score",
            F.when(
                (F.col("n_history") >= min_history) & (F.col("trailing_std") > 0), F.round(z, 6)
            ),
        )
        .withColumn(
            "is_anomaly",
            F.coalesce(F.abs(F.col("z_score")) > z_threshold, F.lit(False)),
        )
    )
    return out.drop("n_history")


def ewma_control_chart(
    history: DataFrame,
    keys: list[str],
    time_col: str,
    value_col: str,
    lam: float = 0.2,
    l_sigma: float = 3.0,
) -> DataFrame:
    """EWMA control chart per series — the small-shift detector
    (Roberts 1959; standard SPC): z_t = λ·x_t + (1−λ)·z_{t−1}, flagged
    when |z_t − μ| exceeds L·σ·sqrt(λ/(2−λ)·(1−(1−λ)^{2t})). Where a
    trailing z-score (``metric_anomalies``) needs one big day to
    trigger, the EWMA accumulates a run of small same-direction drifts
    — the typical silent-data-loss signature (e.g. a fleet source
    dropping 5% of rows every day).

    μ/σ are the series' own mean / sample stddev (in-control estimate).
    The recursion folds over the time-sorted collected series per key:
    deterministic evaluation order (exactly hash-stable), state bounded
    by the series length — the same bounded-series contract as the
    retention / dow baselines (a metric history is days × keys, tiny
    next to the data it audits). Output: one row per observation with
    the ewma, the control limit, and the breach flag.
    """
    pts = F.array_sort(
        F.collect_list(F.struct(F.col(time_col).alias("t"), F.col(value_col).cast("double").alias("x")))
    )
    grouped = history.groupBy(*[F.col(k) for k in keys]).agg(
        pts.alias("pts"),
        F.avg(F.col(value_col).cast("double")).alias("mu"),
        F.stddev_samp(F.col(value_col).cast("double")).alias("sigma"),
    )
    # fold: carry (ewma array) — z_0 seed is mu; emit one struct per point
    def step(acc, p):
        prev = F.element_at(acc, -1)["z"]
        z = F.lit(lam) * p["x"] + F.lit(1.0 - lam) * prev
        return F.concat(acc, F.array(F.struct(p["t"].alias("t"), p["x"].alias("x"), z.alias("z"))))

    seeded = F.array(F.struct(F.lit(None).cast(grouped.schema["pts"].dataType.elementType["t"].dataType).alias("t"), F.lit(None).cast("double").alias("x"), F.col("mu").alias("z")))
    walked = F.aggregate(F.col("pts"), seeded, step)
    out = grouped.select(
        *keys,
        "mu",
        "sigma",
        F.posexplode(F.slice(walked, 2, F.size(walked) - 1)).alias("i", "p"),
    )
    i1 = F.col("i") + 1  # 1-based observation index
    width = F.lit(l_sigma) * F.col("sigma") * F.sqrt(
        F.lit(lam / (2.0 - lam)) * (F.lit(1.0) - F.pow(F.lit((1.0 - lam) ** 2), i1.cast("double")))
    )
    return out.select(
        *keys,
        F.col("p.t").alias(time_col),
        F.col("p.x").alias(value_col),
        F.round("p.z", 6).alias("ewma"),
        F.round(width, 6).alias("limit"),
        (F.abs(F.col("p.z") - F.col("mu")) > width).alias("breach"),
    )
