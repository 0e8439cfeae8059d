"""Custom stateful streaming operator: cross-batch keyed duplicate
accounting via ``applyInPandasWithState``.

Spark's built-in ``dropDuplicates`` on a stream silently discards the
duplicates; a DQ engine needs the opposite — keep a per-key ledger of
how many duplicates arrived, when the key was first/last seen, and
emit that ledger continuously. That is per-key mutable state across
microbatches, which no built-in aggregate expresses, so this is the
designed use of ``applyInPandasWithState`` (Arrow-batched, one state
row per key, partitioned by the grouping key across executors).

Reference parity note: the reference has no streaming at all (it is
two cron scripts — ``data_consistency_checks.py:1-171``,
``pre_and_post_etl_checks.py:1-249``); this is a north-star extension
(continuous ingest monitoring) mandated by BASELINE.json's 100 TB
pipeline design point.

Scale notes:
- State is O(distinct live keys), sharded by key across executors —
  the stream itself is never buffered.
- Event-time timeout (watermark + ``state_ttl``) expires idle keys, so
  state does not grow without bound on high-cardinality key spaces;
  expired keys emit a final tombstone row (``expired = true``) before
  removal, so the ledger is complete even with TTL eviction.
- Emission is O(keys-touched-per-batch) rows per trigger — bounded
  report output, never the input rows.

Note on Spark 4's ``transformWithStateInPandas``: the successor API
exists in this PySpark build but its state-server protocol requires
``google.protobuf``, which is not installed in this environment (no
package installs allowed) — the initialization worker import-crashes.
The operators here therefore use ``applyInPandasWithState``, which is
fully supported and has the same bounded-state semantics; migrating is
a mechanical swap once protobuf is available.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

_STATE_SCHEMA = StructType(
    [
        StructField("total", LongType()),
        StructField("first_us", LongType()),
        StructField("last_us", LongType()),
    ]
)


def _out_schema(key_field: StructField) -> StructType:
    return StructType(
        [
            key_field,
            StructField("batch_rows", LongType()),
            StructField("total_rows", LongType()),
            StructField("dup_rows", LongType()),
            StructField("first_seen", TimestampType()),
            StructField("last_seen", TimestampType()),
            StructField("expired", BooleanType()),
        ]
    )


def dedup_ledger(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    watermark: str = "2 hours",
    state_ttl_ms: int = 3_600_000,
) -> DataFrame:
    """Per-key duplicate ledger over an unbounded stream.

    Output (update-mode rows, one per key touched per microbatch):
    ``(key, batch_rows, total_rows, dup_rows, first_seen, last_seen,
    expired)`` where ``dup_rows = total_rows - 1`` (every row after the
    first arrival of a key is a duplicate). When the event-time
    watermark passes ``last_seen + state_ttl_ms`` the key's state is
    evicted and one final row with ``expired = true`` is emitted.

    Works identically on a batch DataFrame? No — and deliberately so:
    this operator exists precisely for the cross-batch case; the batch
    equivalent is a plain ``groupBy(key).agg(...)`` (see
    ``tests/test_streaming.py`` where the two are compared).
    """
    key_field = stream_df.schema[key_col]
    out_schema = _out_schema(key_field)

    def _track(
        key: Tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            total, first_us, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "batch_rows": [0],
                    "total_rows": [total],
                    "dup_rows": [max(total - 1, 0)],
                    "first_seen": [pd.Timestamp(first_us, unit="us")],
                    "last_seen": [pd.Timestamp(last_us, unit="us")],
                    "expired": [True],
                }
            )
            return

        batch_rows = 0
        batch_first_us = None
        batch_last_us = None
        for pdf in pdfs:
            batch_rows += len(pdf)
            ts = pd.to_datetime(pdf[ts_col]).astype("int64") // 1000  # ns -> us
            if len(ts):
                lo, hi = int(ts.min()), int(ts.max())
                batch_first_us = lo if batch_first_us is None else min(batch_first_us, lo)
                batch_last_us = hi if batch_last_us is None else max(batch_last_us, hi)

        if state.exists:
            total, first_us, last_us = state.get
        else:
            total, first_us, last_us = 0, batch_first_us, batch_last_us
        total += batch_rows
        first_us = min(first_us, batch_first_us)
        last_us = max(last_us, batch_last_us)
        state.update((total, first_us, last_us))
        # Expire this key's state once the watermark is state_ttl_ms
        # past the newest event we have seen for it.
        state.setTimeoutTimestamp(last_us // 1000 + state_ttl_ms)

        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "batch_rows": [batch_rows],
                "total_rows": [total],
                "dup_rows": [max(total - 1, 0)],
                "first_seen": [pd.Timestamp(first_us, unit="us")],
                "last_seen": [pd.Timestamp(last_us, unit="us")],
                "expired": [False],
            }
        )

    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            _track,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


_FUNNEL_STATE_SCHEMA = StructType([StructField("reached", LongType())])


def funnel_progress(
    stream_df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Continuous strict-order funnel over a stream — the third custom
    stateful operator: each user's furthest-step-reached is ONE long of
    state, advanced per microbatch by the same greedy (t, step-index)
    fold as the batch :func:`~..operators.funnel.funnel_report`.

    Emits (update mode) one ``(user, reached)`` row per user touched
    per batch; the funnel report is a trivial aggregation over each
    user's LAST emission.

    Ordering contract: equals the batch funnel whenever each user's
    events arrive in event-time order ACROSS microbatches (within a
    batch they are sorted here). A late-arriving earlier-step event
    cannot retroactively advance a user — by design: state is one
    counter, not an event buffer; feeds with cross-batch disorder
    should pre-sort per window or use the batch form on closed data.
    Tests pin stream ≡ batch on a time-split feed.

    Repeated step names are supported exactly like the batch form
    (r4): each event type maps to the ARRAY of step indexes it
    occupies, and the fold advances when the counter is one of them.
    """
    out_schema = StructType(
        [stream_df.schema[user_col], StructField("reached", LongType())]
    )
    positions: dict[str, tuple[int, ...]] = {}
    for i, s in enumerate(steps):
        positions[s] = positions.get(s, ()) + (i,)

    def _track(key, pdfs, state: GroupState):
        if state.hasTimedOut:  # no TTL configured; defensive
            state.remove()
            return
        evs: list[tuple[int, tuple[int, ...]]] = []
        for pdf in pdfs:
            ts = pd.to_datetime(pdf[ts_col]).astype("int64")
            for t, ty in zip(ts, pdf[type_col]):
                idxs = positions.get(ty)
                if idxs is not None:
                    evs.append((int(t), idxs))
        # same tie rule as the batch fold: equal-time events sort by
        # step-index tuple, so an equal-time next-step event still
        # converts
        evs.sort()
        reached = int(state.get[0]) if state.exists else 0
        for _, idxs in evs:
            if reached in idxs:
                reached += 1
        state.update((reached,))
        yield pd.DataFrame({user_col: [key[0]], "reached": [reached]})

    return stream_df.groupBy(user_col).applyInPandasWithState(
        _track,
        outputStructType=out_schema,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_HH_STATE_SCHEMA = StructType(
    [
        StructField("vals", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("total", LongType()),
    ]
)


def heavy_hitters(
    stream_df: DataFrame,
    group_col: str,
    value_col: str,
    capacity: int = 16,
    top_k: int = 5,
) -> DataFrame:
    """Continuous per-group heavy hitters via a Misra-Gries summary in
    ``applyInPandasWithState`` — bounded state (``capacity`` counters
    per group, NEVER the distinct-value set), the second custom
    stateful operator next to :func:`dedup_ledger`.

    Guarantee (mergeable-summaries, Agarwal et al., PODS'12): after
    any sequence of microbatches totalling N rows for a group, every
    value with true count > N/capacity is present, and each reported
    count is an UNDER-estimate by at most (N - Σ surviving counts) /
    capacity ≤ N/capacity. The summary is order-insensitive in its
    guarantees (not bit-identical across batch splits — the error
    bound is what is deterministic; the pytest pins exactly that).

    Emits per batch (update mode): ``(group, value, est_count,
    total_rows, err_bound)`` — the current top_k estimates.
    """
    out_schema = StructType(
        [
            stream_df.schema[group_col],
            StructField("value", LongType()),
            StructField("est_count", LongType()),
            StructField("total_rows", LongType()),
            StructField("err_bound", LongType()),
        ]
    )

    def _track(key, pdfs, state: GroupState):
        if state.hasTimedOut:  # no TTL configured; defensive
            state.remove()
            return
        import collections

        batch = collections.Counter()
        for pdf in pdfs:
            vc = pdf[value_col].value_counts()
            for v, c in vc.items():
                batch[int(v)] += int(c)
        if state.exists:
            vals, counts, total = state.get
            summary = collections.Counter(dict(zip(vals, counts)))
        else:
            summary, total = collections.Counter(), 0
        total += sum(batch.values())
        summary.update(batch)  # exact merge of exact batch counts
        if len(summary) > capacity:
            # Misra-Gries shrink: subtract the (capacity+1)-th largest
            # count from everything, drop the non-positive survivors
            m = sorted(summary.values(), reverse=True)[capacity]
            summary = collections.Counter(
                {v: c - m for v, c in summary.items() if c - m > 0}
            )
        # deterministic storage order: by (count desc, value asc)
        items = sorted(summary.items(), key=lambda kv: (-kv[1], kv[0]))
        state.update(([v for v, _ in items], [c for _, c in items], total))
        err = (total - sum(summary.values())) // max(capacity, 1)
        top = items[:top_k]
        yield pd.DataFrame(
            {
                group_col: [key[0]] * len(top),
                "value": [v for v, _ in top],
                "est_count": [c for _, c in top],
                "total_rows": [total] * len(top),
                "err_bound": [err] * len(top),
            }
        )

    return stream_df.groupBy(group_col).applyInPandasWithState(
        _track,
        outputStructType=out_schema,
        stateStructType=_HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_DEBOUNCE_STATE_SCHEMA = StructType([StructField("last_kept_us", LongType())])


def debounce_progress(
    stream_df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Streaming twin of :func:`..operators.funnel.debounce_events`:
    greedy per-(user, type) debounce over an unbounded stream — the
    retry/double-fire suppressor applied AT INGEST, where it belongs
    (debounce is inherently a streaming decision: keep an event iff
    it fires ≥ gap after the last KEPT one).

    State is ONE long per (user, type) — the last kept event time —
    advanced per microbatch by the same sequential scan as the batch
    form. Emits (update mode) one row per event in the batch with its
    kept/dropped verdict. Same in-order contract as
    :func:`funnel_progress` (tests pin stream ≡ batch on a time-split
    feed); a late-arriving earlier event cannot retroactively change
    past verdicts, by design.
    """
    out_schema = StructType(
        [
            stream_df.schema[id_col],
            stream_df.schema[user_col],
            stream_df.schema[type_col],
            StructField("ts_us", LongType()),
            StructField("kept", BooleanType()),
        ]
    )
    gap_us = int(gap_seconds) * 1_000_000

    def _track(key, pdfs, state: GroupState):
        if state.hasTimedOut:  # no TTL configured; defensive
            state.remove()
            return
        evs: list[tuple[int, object]] = []
        for pdf in pdfs:
            ts = pd.to_datetime(pdf[ts_col]).astype("int64") // 1000
            for t, rid in zip(ts, pdf[id_col]):
                evs.append((int(t), rid))
        evs.sort()
        last = int(state.get[0]) if state.exists else None
        rids, tss, kept = [], [], []
        for t, rid in evs:
            k = last is None or t - last >= gap_us
            if k:
                last = t
            rids.append(rid)
            tss.append(t)
            kept.append(k)
        if last is not None:
            state.update((last,))
        yield pd.DataFrame(
            {
                id_col: rids,
                user_col: [key[0]] * len(rids),
                type_col: [key[1]] * len(rids),
                "ts_us": tss,
                "kept": kept,
            }
        )

    return stream_df.groupBy(user_col, type_col).applyInPandasWithState(
        _track,
        outputStructType=out_schema,
        stateStructType=_DEBOUNCE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Online EWMA control chart (stream + batch twins share one fold)
# ---------------------------------------------------------------------------

_EWMA_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("ewma", DoubleType()),
        StructField("ewmad", DoubleType()),
    ]
)


def _build_ewma_fold():
    """Closure factory (the multimodal codec pickling rationale: Arrow
    stages serialize closure products BY VALUE, so workers without this
    package on ``sys.path`` can run them)."""

    def ewma_fold(evs, state, lam: float, mult: float, warmup: int):
        """The shared sequential EWMA/EWMAD recurrence: ``evs`` is a
        list of (ts_us, id, value) ALREADY sorted; ``state`` is
        (n, ewma, ewmad) or None. Alarm fires when the new value
        deviates from the running mean by more than ``mult`` × the
        running mean absolute deviation, after ``warmup`` observations.
        Returns (rows, new_state) where rows are (id, ts_us, value,
        ewma, ewmad, alarm) — a PURE function, so the batch
        applyInPandas twin and the streaming applyInPandasWithState
        operator produce bit-identical doubles on the same ordered feed
        (both run this exact Python fold)."""
        n, ewma, ewmad = state if state is not None else (0, 0.0, 0.0)
        rows = []
        for t, rid, x in evs:
            x = float(x)
            if n == 0:
                ewma, ewmad, alarm = x, 0.0, False
            else:
                dev = x - ewma
                alarm = bool(n >= warmup and ewmad > 0.0 and abs(dev) > mult * ewmad)
                ewma = lam * x + (1.0 - lam) * ewma
                ewmad = lam * abs(dev) + (1.0 - lam) * ewmad
            n += 1
            rows.append((rid, t, x, ewma, ewmad, alarm))
        return rows, (n, ewma, ewmad)

    return ewma_fold


_ewma_fold = _build_ewma_fold()


def ewma_chart_batch(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    lam: float = 0.2,
    mult: float = 4.0,
    warmup: int = 10,
) -> DataFrame:
    """Batch twin of :func:`ewma_progress`: the ONLINE control chart
    (running EWMA mean + EWMAD dispersion — no global μ/σ, unlike
    ``operators.anomaly.ewma_control_chart``'s in-control SPC form)
    folded over each key's full (ts, id)-ordered history in one
    ``applyInPandas`` pass. Exists so the streaming operator has an
    exact closed-input twin: both run :func:`_ewma_fold`, so a
    time-split feed must reproduce these rows bit-for-bit.

    Scale note: this batch form materializes ONE KEY's full history per
    Arrow group (fine for audit/backfill over bounded-per-key series);
    unbounded per-key histories belong on the streaming twin, whose
    state is three numbers regardless of history length."""

    fold = _ewma_fold  # closure-factory product: pickled by value

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = pd.to_datetime(pdf[ts_col]).astype("int64") // 1000
        evs = sorted(zip((int(t) for t in ts), pdf[id_col], pdf[value_col]))
        rows, _ = fold(evs, None, lam, mult, warmup)
        key = pdf[key_col].iloc[0]
        return pd.DataFrame(
            [(key, r[0], r[1], r[2], r[3], r[4], r[5]) for r in rows],
            columns=[key_col, id_col, "ts_us", "value", "ewma", "ewmad", "alarm"],
        )

    out_schema = StructType(
        [
            df.schema[key_col],
            df.schema[id_col],
            StructField("ts_us", LongType()),
            StructField("value", DoubleType()),
            StructField("ewma", DoubleType()),
            StructField("ewmad", DoubleType()),
            StructField("alarm", BooleanType()),
        ]
    )
    return df.select(key_col, ts_col, id_col, value_col).groupBy(key_col).applyInPandas(
        lambda pdf: run(pdf), schema=out_schema
    )


def ewma_progress(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    lam: float = 0.2,
    mult: float = 4.0,
    warmup: int = 10,
) -> DataFrame:
    """Streaming ONLINE EWMA control chart: per-key running mean +
    running mean-absolute-deviation, alarm when a value deviates by
    more than ``mult`` × EWMAD — the small-shift drift detector applied
    AT INGEST with O(1) state per key (three numbers), where the batch
    SPC chart needs the closed series. Same in-order contract as
    :func:`debounce_progress` (within-batch sort by (ts, id); a
    time-split ordered feed reproduces the batch twin exactly —
    pytest-pinned bit-identical doubles, since both twins run the same
    :func:`_ewma_fold`)."""
    out_schema = StructType(
        [
            stream_df.schema[key_col],
            stream_df.schema[id_col],
            StructField("ts_us", LongType()),
            StructField("value", DoubleType()),
            StructField("ewma", DoubleType()),
            StructField("ewmad", DoubleType()),
            StructField("alarm", BooleanType()),
        ]
    )

    fold = _ewma_fold  # closure-factory product: pickled by value

    def _track(key, pdfs, state: GroupState):
        if state.hasTimedOut:  # no TTL configured; defensive
            state.remove()
            return
        evs = []
        for pdf in pdfs:
            ts = pd.to_datetime(pdf[ts_col]).astype("int64") // 1000
            for t, rid, x in zip(ts, pdf[id_col], pdf[value_col]):
                evs.append((int(t), rid, x))
        evs.sort()
        prev = tuple(state.get) if state.exists else None
        rows, new_state = fold(evs, prev, lam, mult, warmup)
        state.update(new_state)
        yield pd.DataFrame(
            [(key[0], r[0], r[1], r[2], r[3], r[4], r[5]) for r in rows],
            columns=[key_col, id_col, "ts_us", "value", "ewma", "ewmad", "alarm"],
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        _track,
        outputStructType=out_schema,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
