"""Continuous data-quality monitoring over streams.

``foreachBatch`` bridges the declarative rule engine
(``operators.rules``) into Structured Streaming: every microbatch is
evaluated against the ruleset and the bounded report (rows ∝ rules) is
appended to a sink with the epoch id — a continuously-growing DQA
table, the streaming analogue of the reference's cron-style report
writes (``data_consistency_checks.py:163-168``).

Scale notes: the per-batch report aggregation is the same single-scan
compiled ruleset as batch mode; state is bounded by the microbatch, so
this monitors unbounded streams with O(rules) output per trigger.

Delivery semantics: a manual write inside ``foreachBatch`` does NOT get
the file-sink's exactly-once log — on microbatch retry a plain append
would duplicate the epoch. We make the write IDEMPOTENT instead: each
epoch overwrites its own ``batch_id=<epoch>`` partition directory, so a
retried batch replaces (not duplicates) its report and the combined
table is effectively exactly-once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.operators.rules import Rule, evaluate_rules


def streaming_rule_monitor(
    stream_df: DataFrame,
    table_name: str,
    rules: list[Rule],
    sink_path: str,
    checkpoint_path: str,
    trigger_available_now: bool = True,
):
    """Start a streaming query that appends one rule report per
    microbatch to ``sink_path``. Returns the StreamingQuery handle.

    Only single-table (row-level) rules are supported — referential
    rules need a second input, which in streaming belongs in a
    stream-static join upstream of this monitor.
    """
    for r in rules:
        if r.kind == "referential_integrity":
            raise ValueError("referential rules need a stream-static join upstream")

    def _evaluate_batch(batch_df: DataFrame, epoch_id: int) -> None:
        report = evaluate_rules({table_name: batch_df}, rules).withColumn(
            "checked_at", F.current_timestamp()
        )
        # epoch-deterministic location: retries overwrite, never append
        # twice; readers recover batch_id via partition discovery
        report.write.mode("overwrite").parquet(f"{sink_path}/batch_id={int(epoch_id)}")

    writer = (
        stream_df.writeStream.foreachBatch(_evaluate_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
