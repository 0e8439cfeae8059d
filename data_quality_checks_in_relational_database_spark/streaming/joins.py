"""Stream-stream joins — event attribution with bounded state.

The reference has no streaming surface at all; this is the W3
(SURVEY §2.7) extension that completes the Structured Streaming
story: two live streams joined on key + event-time range, with
watermarks on BOTH sides so the join state is evicted instead of
growing forever.

The transform is mode-agnostic (same function runs on batch frames —
that batch twin is what the DuckDB oracle checks and what the
stream ≡ batch pytest pins), which is the engine's standing pattern
for making streaming operators differentially testable.

Scale shape: a stream-stream inner join shuffles both sides by the
equi-key; the range condition bounds how long a row waits for its
match, and the watermark turns that bound into state eviction. At
100 TB/day the state held is O(key-rate × max_delay), independent of
history length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_events(
    first: DataFrame,
    second: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    max_delay: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Pairs each ``second``-stream event with every ``first``-stream
    event of the same key that happened at-or-before it within
    ``max_delay`` (click→purchase attribution, request→response
    matching, sensor cause→effect pairing).

    Output: (key, first_id, second_id, delay_us >= 0). Works on batch
    or streaming inputs; for streaming BOTH sides must carry a
    watermark (pass ``watermark``) — Spark requires it to bound inner
    stream-stream join state, and it defines the late-data cutoff.
    """
    f = first.select(
        F.col(key_col).alias("k"),
        F.col(ts_col).cast("timestamp").alias("first_ts"),
        F.col(id_col).alias("first_id"),
    )
    s = second.select(
        F.col(key_col).alias("k2"),
        F.col(ts_col).cast("timestamp").alias("second_ts"),
        F.col(id_col).alias("second_id"),
    )
    if watermark and first.isStreaming:
        f = f.withWatermark("first_ts", watermark)
    if watermark and second.isStreaming:
        s = s.withWatermark("second_ts", watermark)
    joined = f.join(
        s,
        (F.col("k") == F.col("k2"))
        & (F.col("second_ts") >= F.col("first_ts"))
        & (F.col("second_ts") <= F.col("first_ts") + F.expr(f"INTERVAL {max_delay}")),
    )
    return joined.select(
        F.col("k").alias(key_col),
        "first_id",
        "second_id",
        (F.unix_micros("second_ts") - F.unix_micros("first_ts")).alias("delay_us"),
    )


def enrich_with_dim(stream: DataFrame, dim: DataFrame, key_col: str) -> DataFrame:
    """Stream-static enrichment: join a live stream to a slowly-changing
    dimension snapshot. Spark re-plans the static side per microbatch,
    so a dim refresh (re-written parquet) is picked up without
    restarting the query — the standard pattern for attaching facility /
    tenant / source metadata to a 100 TB/day event stream.

    The static side is explicitly broadcast: dims are small by contract
    here, and a broadcast join keeps the stream side shuffle-free (no
    state, unlike stream-stream joins — an unmatched stream row emits
    immediately with NULL dim columns via left join).

    Mode-agnostic (works on batch frames) → stream ≡ batch pytest.
    """
    return stream.join(F.broadcast(dim), on=key_col, how="left")


def attribute_events_outer(
    first: DataFrame,
    second: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    max_delay: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """LEFT-OUTER form of :func:`attribute_events`: every first-stream
    event emits — matched rows as they pair, UNMATCHED rows with NULL
    ``second_id``/``delay_us`` once the watermark proves no match can
    still arrive (first_ts + max_delay < watermark). The
    did-the-click-convert-or-not report, which the inner join cannot
    express: an absent conversion is itself the answer.

    Streaming semantics worth pinning (the pytest does): an unmatched
    row is emitted ONLY when the watermark passes its join window —
    at stream end, rows whose window the watermark never crossed stay
    unemitted (they are still "maybe matched"). The batch twin (same
    function on batch frames) emits all unmatched rows immediately —
    the stream result equals the batch result exactly when the final
    watermark clears every window.

    State story at 100 TB/day: identical to the inner join —
    O(key-rate × max_delay) rows held per side, evicted by watermark.
    """
    f = first.select(
        F.col(key_col).alias("k"),
        F.col(ts_col).cast("timestamp").alias("first_ts"),
        F.col(id_col).alias("first_id"),
    )
    s = second.select(
        F.col(key_col).alias("k2"),
        F.col(ts_col).cast("timestamp").alias("second_ts"),
        F.col(id_col).alias("second_id"),
    )
    if watermark and first.isStreaming:
        f = f.withWatermark("first_ts", watermark)
    if watermark and second.isStreaming:
        s = s.withWatermark("second_ts", watermark)
    joined = f.join(
        s,
        (F.col("k") == F.col("k2"))
        & (F.col("second_ts") >= F.col("first_ts"))
        & (F.col("second_ts") <= F.col("first_ts") + F.expr(f"INTERVAL {max_delay}")),
        "left_outer",
    )
    return joined.select(
        F.col("k").alias(key_col),
        "first_id",
        "second_id",
        (F.unix_micros("second_ts") - F.unix_micros("first_ts")).alias("delay_us"),
    )
