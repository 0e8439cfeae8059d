"""Event-sequence analytics: conversion funnels and state history.

Neither exists in the reference (its event surface is row counts and
freshness only — data_consistency_checks.py:60-93); these are the
SURVEY §2.8 event-stream extensions every product/training-telemetry
pipeline runs.

Scale shape: everything is keyed by the entity id. The funnel is one
aggregation per step over the SAME shuffle key (user), so AQE/exchange
reuse keeps it to one shuffle per step with map-side combine, and the
per-step frames the joins touch are pre-aggregated (one row per user)
— the joins broadcast or co-partition, never row-explode. State
history is a single per-key window pass (gaps-and-islands), the
textbook distributed SCD2 build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def funnel_report(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Strict-order funnel: a user converts step i when their earliest
    step-i event is at-or-after their conversion time of step i-1.

    Output: (step bigint 1-based, step_name, n_users bigint) — n_users
    monotonically non-increasing. Timestamps compare at microsecond
    integer precision (cast to TIMESTAMP first; session tz is pinned
    UTC so TIMESTAMP_NTZ inputs are identity-converted).

    Repeated step names are supported: each event maps to the ARRAY of
    step indexes its type occupies (['view','click','view'] maps a
    view event to [0, 2]), and the greedy fold advances whenever the
    accumulator is one of them — so a second 'view' after the click
    converts step 3. One event advances at most one step.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # event type → array of step indexes (bounded literal list; a
    # repeated step name owns several indexes)
    positions: dict[str, list[int]] = {}
    for i, s in enumerate(steps):
        positions.setdefault(s, []).append(i)
    idx = None
    for s, idxs in positions.items():
        arr = F.array(*[F.lit(j) for j in idxs])
        branch = F.when(F.col(type_col) == s, arr)
        idx = branch if idx is None else idx.when(F.col(type_col) == s, arr)
    base = events.select(
        F.col(user_col).alias("u"), us.alias("t"), idx.alias("si")
    ).filter(F.col("si").isNotNull())

    # ONE keyed aggregation builds each user's time-ordered step
    # sequence (bounded by step-events-per-user); a greedy fold over it
    # computes the furthest step reached. Greedy earliest-first
    # matching equals the recursive "earliest step-i at-or-after
    # conv(i-1)" definition; ties at the same timestamp sort by step-
    # index array (lexicographic) so an equal-time next-step event
    # still converts (the >= contract). The old per-step join chain
    # re-scanned the input once per step AND re-derived the chain per
    # count row — O(steps²) scans; this is one scan + one keyed
    # shuffle regardless of steps.
    seqs = base.groupBy("u").agg(
        F.array_sort(F.collect_list(F.struct("t", "si"))).alias("evs")
    )
    reached = F.aggregate(
        F.col("evs"),
        F.lit(0),
        lambda acc, e: F.when(F.array_contains(e["si"], acc), acc + 1).otherwise(acc),
    )
    wide = seqs.select(reached.alias("reached")).agg(
        *[
            # coalesce: the sum over ZERO users is NULL, the funnel says 0
            F.coalesce(F.sum(F.when(F.col("reached") >= i, 1).otherwise(0)), F.lit(0))
            .cast("long")
            .alias(f"s{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    stack = ", ".join(
        f"CAST({i} AS BIGINT), '{s}', s{i}" for i, s in enumerate(steps, start=1)
    )
    return wide.selectExpr(
        f"stack({len(steps)}, {stack}) AS (step, step_name, n_users)"
    )


def state_history(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    id_col: str,
) -> DataFrame:
    """SCD2-style validity intervals: collapse each key's ordered state
    stream into runs of consecutive equal states.

    Output: (key, state, valid_from_us, valid_to_us, n_events) — one
    row per run; valid_to is the run's last event time (closed
    interval; the "current" run's end is its latest observation).
    Total order within a key is (ts, id) so duplicate timestamps are
    deterministic. One window pass partitioned by key — no global
    sort, scales with per-key density.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = events.select(
        F.col(key_col).alias("k"),
        F.col(state_col).alias("state"),
        us.alias("t"),
        F.col(id_col).alias("rid"),
    )
    w = Window.partitionBy("k").orderBy("t", "rid")
    flagged = base.withColumn(
        "new_run",
        F.when(F.lag("state").over(w).eqNullSafe(F.col("state")), 0).otherwise(1),
    )
    runs = flagged.withColumn(
        "run_id", F.sum("new_run").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        runs.groupBy("k", "run_id", "state")
        .agg(
            F.min("t").alias("valid_from_us"),
            F.max("t").alias("valid_to_us"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .select(
            F.col("k").alias(key_col),
            "state",
            "valid_from_us",
            "valid_to_us",
            "n_events",
        )
    )


def transition_matrix(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    id_col: str,
) -> DataFrame:
    """First-order Markov transition counts over each key's ordered
    state stream: ``(from_state, to_state, n)`` — the behavioral
    fingerprint of an event feed. A sudden mass shift in the matrix
    (e.g. view->error displacing view->click) is an instrumentation or
    UX regression a per-type volume count can't see.

    One lead() window pass per key (same shuffle as state_history),
    then a bounded |states|^2 aggregation. Order within a key is
    (ts, id), deterministic under duplicate timestamps.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = events.select(
        F.col(key_col).alias("k"),
        F.col(state_col).alias("from_state"),
        us.alias("t"),
        F.col(id_col).alias("rid"),
    )
    w = Window.partitionBy("k").orderBy("t", "rid")
    return (
        base.withColumn("to_state", F.lead("from_state").over(w))
        .filter(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def rolling_stats(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    n_rows: int,
) -> DataFrame:
    """Per-event trailing window stats: rolling mean/min/max of the
    last ``n_rows`` observations per key (ROWS frame, current row
    inclusive) — the smoothing/debounce primitive for metric streams.

    Output: (key, id, ts_us, value, roll_mean, roll_min, roll_max).
    The frame sums at most ``n_rows`` doubles in deterministic frame
    order, so roll_mean is engine-portable at 6 dp. One window pass
    partitioned by key — never a global sort.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = events.select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("rid"),
        us.alias("ts_us"),
        F.col(value_col).cast("double").alias("value"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("ts_us", "rid")
        .rowsBetween(-(n_rows - 1), 0)
    )
    return base.select(
        F.col("k").alias(key_col),
        F.col("rid").alias(id_col),
        "ts_us",
        "value",
        F.round(F.avg("value").over(w), 6).alias("roll_mean"),
        F.min("value").over(w).alias("roll_min"),
        F.max("value").over(w).alias("roll_max"),
    )


def resample_ffill(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket: str = "1 hour",
) -> DataFrame:
    """Regularize an irregular metric stream onto a fixed grid with
    forward fill: per key, one row per bucket between that key's first
    and last observation; empty buckets carry the last seen value
    (gap-filling for sensor/metric feeds before rate/drift math).

    Output: (key, bucket_start, n_obs, value_ffill, is_filled). Shape:
    one grouped agg per (key, bucket) [last value by (ts, id) order via
    max_by on the bucketed rows], a per-key sequence() explode bounded
    by each key's own span, then one last_value(ignoreNulls) window per
    key — never a global calendar cross join.
    """
    b = F.window(F.col(ts_col).cast("timestamp"), bucket)
    per_bucket = (
        events.groupBy(F.col(key_col).alias("k"), b.alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            F.max_by(
                F.col(value_col).cast("double"),
                F.struct(F.col(ts_col).cast("timestamp"), F.col(value_col).cast("double")),
            ).alias("last_value"),
        )
        .select("k", F.col("w.start").alias("bs"), "n_obs", "last_value")
    )
    spans = per_bucket.groupBy("k").agg(
        F.min("bs").alias("lo"), F.max("bs").alias("hi")
    )
    interval = f"INTERVAL {bucket}"
    grid = spans.select(
        "k",
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr(interval))
        ).alias("bs"),
    )
    joined = grid.join(per_bucket, ["k", "bs"], "left")
    w = (
        Window.partitionBy("k")
        .orderBy("bs")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        F.col("k").alias(key_col),
        F.col("bs").alias("bucket_start"),
        F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
        F.last("last_value", ignorenulls=True).over(w).alias("value_ffill"),
        F.col("n_obs").isNull().alias("is_filled"),
    )


def top_event_paths(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    seq_col: str,
    type_col: str,
    n: int = 3,
    top_k: int = 10,
) -> DataFrame:
    """Most common length-``n`` event paths across users — the
    behavioral "what do people actually do" report (the product-
    analytics sibling of the n-gram corpus ops). A path counts once
    per USER (distinct n-grams of that user's time-ordered event
    sequence), so one loop-happy user can't dominate.

    Output: (rank, path, n_users), path space-joined, rank by
    (n_users DESC, path ASC).

    Scale shape: per-user sequences assemble via one keyed aggregation
    (collect_list of (ts, seq, type) structs, array_sort — bounded by
    events-per-user, the same bound any sessionization carries); path
    extraction is the map-only shingle transform; counts are bounded
    by distinct paths with map-side combine.
    """
    from data_quality_checks_in_relational_database_spark.operators.text import shingles

    seqs = (
        events.groupBy(F.col(user_col))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).cast("timestamp").alias("ts"),
                        F.col(seq_col).alias("seq"),
                        F.col(type_col).alias("t"),
                    )
                )
            ).alias("evs")
        )
        .select(F.transform("evs", lambda e: e["t"]).alias("t"))
    )
    paths = seqs.select(F.explode(shingles(F.col("t"), n)).alias("path"))
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))
    top = counts.orderBy(F.col("n_users").desc(), F.col("path").asc()).limit(top_k)
    w = Window.orderBy(F.col("n_users").desc(), F.col("path").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "path", "n_users"
    )


def conversion_lag(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    from_step: str,
    to_step: str,
) -> DataFrame:
    """Time-to-convert distribution between two funnel steps: for each
    user with a ``to_step`` event at-or-after their first
    ``from_step`` event, the lag in integer seconds — reduced to one
    summary row (n_start, n_converted, mean/p50/min/max lag).

    Integer-seconds lags and a mean from exact integer sums keep the
    summary hash-stable; the exact interpolated median is the
    distributed percentile aggregate (swap percentile_approx at
    100 TB).
    """
    ts = F.col(ts_col).cast("timestamp")
    # earliest to_step AT OR AFTER t0 (not just the global earliest)
    conv = events.groupBy(F.col(user_col)).agg(
        F.min(F.when(F.col(type_col) == from_step, ts)).alias("t0"),
    ).join(
        events.where(F.col(type_col) == to_step).select(
            F.col(user_col), ts.alias("t1")
        ),
        user_col,
        "left",
    ).groupBy(user_col).agg(
        F.first("t0").alias("t0"),
        F.min(F.when(F.col("t1") >= F.col("t0"), F.col("t1"))).alias("t_conv"),
    )
    lag = (F.unix_micros(F.col("t_conv")) - F.unix_micros(F.col("t0"))) / F.lit(
        1_000_000
    )
    lags = conv.filter(F.col("t0").isNotNull()).select(
        F.floor(lag).cast("long").alias("lag_s")
    )
    return lags.agg(
        F.count(F.lit(1)).alias("n_start"),
        F.count("lag_s").alias("n_converted"),
        F.round(F.sum("lag_s") / F.count("lag_s"), 6).alias("mean_lag_s"),
        F.round(F.expr("percentile(lag_s, CAST(0.5 AS DOUBLE))"), 6).alias("p50_lag_s"),
        F.min("lag_s").alias("min_lag_s"),
        F.max("lag_s").alias("max_lag_s"),
    )


def funnel_report_windowed(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_seconds: int,
) -> DataFrame:
    """Conversion-window funnel: like :func:`funnel_report`, but every
    later step must ALSO land within ``within_seconds`` of the user's
    first step-1 event (the anchor) — the "converted within 7 days"
    contract product funnels actually report.

    Anchor semantics: the window opens at the user's EARLIEST step-1
    event (the standard first-touch definition; a later anchor is a
    different metric). Same single-scan shape as the unwindowed form —
    the greedy fold just carries (step, anchor_t) as its accumulator.
    Like :func:`funnel_report`, repeated step names are supported via
    the event → step-index-ARRAY mapping.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w_us = int(within_seconds) * 1_000_000
    positions: dict[str, list[int]] = {}
    for i, s in enumerate(steps):
        positions.setdefault(s, []).append(i)
    idx = None
    for s, idxs in positions.items():
        arr = F.array(*[F.lit(j) for j in idxs])
        branch = F.when(F.col(type_col) == s, arr)
        idx = branch if idx is None else idx.when(F.col(type_col) == s, arr)
    base = events.select(
        F.col(user_col).alias("u"), us.alias("t"), idx.alias("si")
    ).filter(F.col("si").isNotNull())
    seqs = base.groupBy("u").agg(
        F.array_sort(F.collect_list(F.struct("t", "si"))).alias("evs")
    )
    zero = F.struct(
        F.lit(0).alias("step"), F.lit(0).cast("long").alias("t0")
    )
    advance = lambda acc, e: F.struct(
        (acc["step"] + 1).alias("step"),
        F.when(acc["step"] == 0, e["t"]).otherwise(acc["t0"]).alias("t0"),
    )
    eligible = lambda acc, e: F.array_contains(e["si"], acc["step"]) & (
        (acc["step"] == 0) | (e["t"] <= acc["t0"] + F.lit(w_us))
    )
    reached = F.aggregate(
        F.col("evs"),
        zero,
        lambda acc, e: F.when(eligible(acc, e), advance(acc, e)).otherwise(acc),
        lambda acc: acc["step"],
    )
    wide = seqs.select(reached.alias("reached")).agg(
        *[
            F.coalesce(F.sum(F.when(F.col("reached") >= i, 1).otherwise(0)), F.lit(0))
            .cast("long")
            .alias(f"s{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    stack = ", ".join(
        f"CAST({i} AS BIGINT), '{s}', s{i}" for i, s in enumerate(steps, start=1)
    )
    return wide.selectExpr(
        f"stack({len(steps)}, {stack}) AS (step, step_name, n_users)"
    )


def debounce_events(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Greedy per-(user, type) debounce: an event is KEPT iff it is
    the first of its (user, type) stream or fires at least
    ``gap_seconds`` after the last KEPT event — the retry/double-fire
    suppression rule ingestion pipelines apply before counting.

    This is inherently a SEQUENTIAL scan per key (whether an event is
    kept depends on which earlier events were kept — a window lag
    can't express it), so it runs as one Arrow-batched
    ``applyInPandas`` per (user, type) group, bounded by
    events-per-user-per-type; the keyed shuffle is the only exchange.
    Total order within a key is (ts, id) so duplicate timestamps are
    deterministic. Output: (id, user, type, ts_us, kept).
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("ty"),
        us.alias("t"),
        F.col(id_col).alias("rid"),
    )
    gap_us = int(gap_seconds) * 1_000_000

    def run(pdf):
        import pandas as _pd

        pdf = pdf.sort_values(["t", "rid"]).reset_index(drop=True)
        kept = []
        last = None
        for t in pdf["t"]:
            k = last is None or t - last >= gap_us
            if k:
                last = t
            kept.append(k)
        pdf["kept"] = kept
        return pdf[["rid", "u", "ty", "t", "kept"]]

    # derive the Arrow output schema from the INPUT column types (like
    # the streaming twin debounce_progress) — hardcoding long/long/string
    # would cast-fail or null out callers with string ids or non-long
    # user keys
    in_types = {f.name: f.dataType for f in events.schema.fields}
    out_schema = T.StructType(
        [
            T.StructField("rid", in_types[id_col]),
            T.StructField("u", in_types[user_col]),
            T.StructField("ty", in_types[type_col]),
            T.StructField("t", T.LongType()),
            T.StructField("kept", T.BooleanType()),
        ]
    )
    out = base.groupBy("u", "ty").applyInPandas(run, schema=out_schema)
    return out.select(
        F.col("rid").alias(id_col),
        F.col("u").alias(user_col),
        F.col("ty").alias(type_col),
        F.col("t").alias("ts_us"),
        "kept",
    )
