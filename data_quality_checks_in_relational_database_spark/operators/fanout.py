"""Fleet fan-out runner with missing-table tolerance (SURVEY.md §2.8 #5).

The reference loops serially over N MySQL schemas, catching error 1146
and sniffing the missing table out of the error string
(``data_consistency_checks.py:85-116``). Here: enumerate sources from a
:class:`~..sources.catalog.FleetCatalog`, pre-check table existence
(cheap metadata op), build ONE per-source plan each, and union them
into a single lazy DAG — the Spark scheduler then runs every source's
scan concurrently across executors. The driver never touches row data;
it only assembles plans and the bounded audit counters.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame

from data_quality_checks_in_relational_database_spark.sources.catalog import FleetCatalog


@dataclass
class FanoutReport:
    """Union of per-source check outputs + the reference's self-audit
    counters ('y out of x schemas processed',
    ``data_consistency_checks.py:146-147``) made structured."""

    report: DataFrame | None
    attempted: int
    succeeded: int
    skipped: list[tuple[str, str]] = field(default_factory=list)  # (source, missing table)


def run_fanout(
    catalog: FleetCatalog,
    check: Callable[[str, dict[str, DataFrame]], DataFrame],
    required_tables: list[str],
    prefix: str = "",
) -> FanoutReport:
    """Run ``check(source_name, tables)`` over every enumerated source.

    Sources missing any required table are skipped and recorded
    (replaces error-1146 string sniffing with an explicit existence
    pre-check). Per-source outputs are combined with
    ``unionByName(allowMissingColumns=True)`` — reproducing the pandas
    concat schema-widening the reference relies on
    (``pre_and_post_etl_checks.py:112-122``, SURVEY.md §1.3) — into a
    single plan executed as one parallel job.
    """
    sources = catalog.list_sources(prefix)
    parts: list[DataFrame] = []
    skipped: list[tuple[str, str]] = []
    for src in sources:
        missing = [t for t in required_tables if not catalog.table_exists(src, t)]
        if missing:
            skipped.append((src, missing[0]))
            continue
        tables = {t: catalog.read(src, t) for t in required_tables}
        parts.append(check(src, tables))

    report = None
    for p in parts:
        report = p if report is None else report.unionByName(p, allowMissingColumns=True)
    return FanoutReport(
        report=report,
        attempted=len(sources),
        succeeded=len(parts),
        skipped=skipped,
    )
