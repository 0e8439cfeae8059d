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
