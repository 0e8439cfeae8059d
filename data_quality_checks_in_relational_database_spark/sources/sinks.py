"""Audited report sinks.

The reference writes its DQA report with DROP + replace/append and then
verifies with a post-write ``SELECT COUNT(*)``
(``data_consistency_checks.py:163-168``, ``pre_and_post_etl_checks.py:245-247``).
Write-audit is a first-class DQ primitive here (SURVEY.md §2.1 S9-S11):
write, read back, count, and report expected vs observed.

Report frames are bounded by construction (one row per source × table /
per group), so the sink is never the scale bottleneck; data-scale
outputs (e.g. deduped corpora) go through the same function with
``expected_count=None`` to skip the driver-side expectation.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class WriteAudit:
    """Outcome of an audited write (reference's printed count, made data)."""

    target: str
    mode: str
    rows_written: int
    expected_rows: int | None

    @property
    def ok(self) -> bool:
        return self.expected_rows is None or self.rows_written == self.expected_rows


def write_report(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    fmt: str = "parquet",
    expected_count: int | None = None,
) -> WriteAudit:
    """Write ``df`` to ``path`` and verify by re-counting the sink.

    ``mode='overwrite'`` reproduces DROP + ``if_exists='replace'``
    (``data_consistency_checks.py:163-165``); ``mode='append'`` the
    PP sink (``pre_and_post_etl_checks.py:245-247``). The re-count is a
    fresh scan of the written files, not a cached plan — it audits what
    actually landed.
    """
    df.write.mode(mode).format(fmt).save(path)
    spark: SparkSession = df.sparkSession
    observed = spark.read.format(fmt).load(path).count()
    return WriteAudit(target=path, mode=mode, rows_written=observed, expected_rows=expected_count)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
    fmt: str = "parquet",
    expected_count: int | None = None,
) -> WriteAudit:
    """Hive-style partitioned export — the layout that makes downstream
    per-slice reads PARTITION-PRUNED scans (a filter on a partition
    column prunes directories before any file I/O; the plan shows it
    under ``PartitionFilters``). This is the write shape for sharded
    training-data exports (partition by source/lang/date) and for the
    fleet pattern (one directory per site ↔ the reference's
    one-schema-per-facility layout).

    With ``mode='overwrite'`` and
    ``spark.sql.sources.partitionOverwriteMode=dynamic`` (session
    default here), only partitions present in ``df`` are replaced —
    the idempotent per-slice refresh a scheduled DQ job needs.
    """
    df.write.mode(mode).format(fmt).partitionBy(*partition_by).save(path)
    spark: SparkSession = df.sparkSession
    observed = spark.read.format(fmt).load(path).count()
    return WriteAudit(target=path, mode=mode, rows_written=observed, expected_rows=expected_count)


def write_table(
    df: DataFrame,
    table: str,
    mode: str = "overwrite",
    expected_count: int | None = None,
) -> WriteAudit:
    """``saveAsTable`` variant for catalog-managed warehouses."""
    if mode == "overwrite":
        df.sparkSession.sql(f"DROP TABLE IF EXISTS {table}")
    df.write.mode(mode).saveAsTable(table)
    observed = df.sparkSession.table(table).count()
    return WriteAudit(target=table, mode=mode, rows_written=observed, expected_rows=expected_count)
