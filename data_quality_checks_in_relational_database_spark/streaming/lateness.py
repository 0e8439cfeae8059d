"""Late-data accounting: surface what the watermark silently dropped.

Watermarks make streaming aggregations correct AND quietly discard
rows that arrive too late — a DQ engine must report that loss, not
just rely on it. Structured Streaming already counts the drops per
stateful operator (``numRowsDroppedByWatermark`` in every progress
event); this module turns the query's progress history into a bounded
report frame so the drop rate can be alerted on like any other check.

Driver-side introspection only (progress events are small JSON kept by
the StreamingQuery handle) — no extra jobs against the stream.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def watermark_drop_stats(query, spark: SparkSession) -> DataFrame:
    """Per-microbatch late-data report from a (running or finished)
    StreamingQuery: ``(batch_id, operator, n_dropped_late, watermark)``
    — one row per stateful operator per progress event.

    Alert shape: ``n_dropped_late`` persistently > 0 means the
    watermark is tighter than the source's real disorder; widen it or
    fix the upstream lag. Zero rows means no stateful operator ran.
    """
    rows = []
    for p in query.recentProgress:
        prog = json.loads(p.json) if hasattr(p, "json") else dict(p)
        batch_id = prog.get("batchId")
        wm = (prog.get("eventTime") or {}).get("watermark")
        for i, op in enumerate(prog.get("stateOperators") or []):
            rows.append(
                (
                    int(batch_id),
                    str(op.get("operatorName") or f"op{i}"),
                    int(op.get("numRowsDroppedByWatermark") or 0),
                    wm,
                )
            )
    return spark.createDataFrame(
        rows, "batch_id long, operator string, n_dropped_late long, watermark string"
    )


def total_dropped_late(query) -> int:
    """Total rows discarded by watermarks across the query's retained
    progress history (the single counter a freshness SLO consumes)."""
    total = 0
    for p in query.recentProgress:
        prog = json.loads(p.json) if hasattr(p, "json") else dict(p)
        for op in prog.get("stateOperators") or []:
            total += int(op.get("numRowsDroppedByWatermark") or 0)
    return total
