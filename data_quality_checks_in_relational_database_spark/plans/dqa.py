"""Top-level DQA orchestration: one call runs the whole audit suite
over a table dictionary and lands an audited report.

This is the engine's equivalent of executing both reference scripts as
one job: volume + freshness + declarative rules + per-column profiles
composed into a single long-format report frame (one lazy DAG — Spark
schedules every table's scans concurrently), written with post-write
verification (``data_consistency_checks.py:163-168``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.operators.checks import FreshnessSpec, freshness_audit, volume_audit
from data_quality_checks_in_relational_database_spark.operators.profile import profile_table
from data_quality_checks_in_relational_database_spark.operators.rules import Rule, evaluate_rules
from data_quality_checks_in_relational_database_spark.sources.sinks import WriteAudit, write_report

#: unified report schema: (section, table_name, item, metric, value_str, passed)
_REPORT_COLS = ["section", "table_name", "item", "metric", "value_str", "passed"]


@dataclass(frozen=True)
class DqaResult:
    report: DataFrame
    audit: WriteAudit | None


def run_dqa(
    tables: dict[str, DataFrame],
    rules: list[Rule] | None = None,
    freshness: list[FreshnessSpec] | None = None,
    profile: list[str] | None = None,
    sink_path: str | None = None,
) -> DqaResult:
    """Compose volume / freshness / rules / profiles into one report.

    Every section is normalized to the same 6-column long format so the
    report is a single appendable table (the shape a DQA history /
    anomaly layer consumes). ``sink_path`` triggers an audited write.
    """
    parts: list[DataFrame] = []

    vol = volume_audit(tables)
    parts.append(
        vol.select(
            F.lit("volume").alias("section"),
            F.col("table_name"),
            F.lit("record_count").alias("item"),
            F.lit("count").alias("metric"),
            F.col("record_count").cast("string").alias("value_str"),
            F.lit(None).cast("boolean").alias("passed"),
        )
    )

    for spec in freshness or []:
        fr = freshness_audit([spec], with_quarter=False)
        parts.append(
            fr.select(
                F.lit("freshness").alias("section"),
                F.col("table_name"),
                F.lit(spec.ts_col).alias("item"),
                F.lit("max_date").alias("metric"),
                F.col("max_date").cast("string").alias("value_str"),
                F.lit(None).cast("boolean").alias("passed"),
            )
        )

    if rules:
        rr = evaluate_rules(tables, rules)
        parts.append(
            rr.select(
                F.lit("rule").alias("section"),
                F.col("table_name"),
                F.col("rule_name").alias("item"),
                F.lit("n_violations").alias("metric"),
                F.col("n_violations").cast("string").alias("value_str"),
                F.col("passed"),
            )
        )

    for tname in profile or []:
        pr = profile_table(tables[tname], tname)
        parts.append(
            pr.select(
                F.lit("profile").alias("section"),
                F.col("table_name"),
                F.col("column").alias("item"),
                F.lit("n_nulls/n_distinct/min/max").alias("metric"),
                F.concat_ws(
                    "|",
                    F.col("n_nulls").cast("string"),
                    F.col("n_distinct").cast("string"),
                    F.coalesce(F.col("min_value"), F.lit("")),
                    F.coalesce(F.col("max_value"), F.lit("")),
                ).alias("value_str"),
                F.lit(None).cast("boolean").alias("passed"),
            )
        )

    report = parts[0]
    for p in parts[1:]:
        report = report.unionByName(p)
    report = report.withColumn("date_created", F.current_date())

    audit = None
    if sink_path:
        audit = write_report(report, sink_path, mode="overwrite")
    return DqaResult(report=report, audit=audit)
