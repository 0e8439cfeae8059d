"""Streaming freshness/volume checks (Structured Streaming).

The reference runs its checks as cron-style batch scripts
(``data_consistency_checks.py:34`` log cadence); the streaming tier
turns the same check functions into continuously-maintained reports:
``readStream`` → the SAME DataFrame transform used in batch →
``writeStream`` with watermark-bounded state. Batch/stream share one
code path (``windowed_volume`` takes either a batch or streaming
DataFrame), which is what makes the batch DuckDB oracle meaningful for
the streaming operator too.

Scale notes: tumbling-window counts keep O(windows × event_types)
state; the watermark bounds state size and defines late-data cutoff.
At 100 TB/day ingest the shuffle carries only pre-aggregated partial
counts (map-side combine applies to streaming aggregations as well).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: events table schema (TESTDATA.md) — required for readStream over parquet.
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def windowed_volume(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    group_col: str = "event_type",
    watermark: str | None = None,
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or, with ``slide``, sliding/hopping) window volume/value
    report per group — works unchanged on batch and streaming inputs.

    ``slide`` < ``window`` assigns each event to window/slide
    overlapping windows (e.g. 1 hour every 30 minutes → 2); state and
    shuffle grow by the same factor, which is why production monitors
    keep the ratio small. Windows are epoch-aligned in both modes.

    Output: (window_start, <group_col>, n_events, total_value) with the
    money total in exact integer cents (order-independent).
    """
    df = events
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    w = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    agg = df.groupBy(w.alias("w"), F.col(group_col)).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0).alias("total_value"),
    )
    return agg.select(
        F.col("w.start").alias("window_start"), group_col, "n_events", "total_value"
    )


def read_events_stream(spark: SparkSession, path_dir: str, max_files: int = 1) -> DataFrame:
    """File-source stream over a directory of events parquet files.

    ``maxFilesPerTrigger`` bounds per-microbatch work; the driver
    testdata's single file arrives as one microbatch under the
    ``availableNow`` trigger used in tests.
    """
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path_dir)
    )


def windowed_distinct_users(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    group_col: str = "event_type",
    user_col: str = "user_id",
    watermark: str | None = None,
    rsd: float = 0.01,
) -> DataFrame:
    """Distinct users per tumbling window per group — streaming-safe.

    Uses the HLL++ sketch (``approx_count_distinct``): sketch inserts
    are commutative and order-independent, so the STREAMING result is
    bit-identical to running the same function in batch (pinned in
    tests), and state per window-group is one bounded sketch rather
    than the unbounded user set an exact distinct would need. The
    exact batch twin is the registered ``sliding_distinct_users``
    query (two-phase composite-key dedup) — use it for offline audits,
    this one for continuous monitoring.

    Output: (window_start, <group_col>, approx_distinct_users).
    """
    df = events
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    agg = df.groupBy(
        F.window(F.col(ts_col), window).alias("w"), F.col(group_col)
    ).agg(
        F.approx_count_distinct(user_col, rsd=rsd).alias("approx_distinct_users")
    )
    return agg.select(
        F.col("w.start").alias("window_start"), group_col, "approx_distinct_users"
    )


def session_volume(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Per-key activity sessions (dynamic-gap windows) — the same
    ``session_window`` operator in batch and streaming. In streaming
    mode the watermark both closes sessions (a session finalizes when
    the watermark passes its end + gap) and evicts their state, so
    state is O(open sessions), not O(history). Batch output ≡ stream
    output under ``availableNow`` is pinned in tests.

    Output: (key, session_start, n_events).
    """
    df = events
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    agg = df.groupBy(
        F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col)
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return agg.select(
        F.col(key_col),
        F.col("w.start").cast("timestamp").alias("session_start"),
        "n_events",
    )
