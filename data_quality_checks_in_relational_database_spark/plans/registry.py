"""Query registry: name → (Spark callable, DuckDB oracle SQL, bench flag).

``__spark_entry__.py`` re-exports :func:`queries` / :func:`oracle_sql`
from here; ``bench.py`` runs the ``headline`` subset. Entries with
``oracle=None`` are genuinely non-SQL-expressible (approximate /
stateful) and get the driver's weaker rows-only check; each of those is
pinned by a deterministic pytest instead.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from data_quality_checks_in_relational_database_spark.plans import reference_queries as rq

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None
    headline: bool = False


REGISTRY: dict[str, QuerySpec] = {
    # --- the five reference check primitives (SURVEY §2.8) ---
    "volume_audit": QuerySpec(rq.q_volume_audit, rq.ORACLE_VOLUME_AUDIT, headline=True),
    "volume_by_status": QuerySpec(rq.q_volume_by_status, rq.ORACLE_VOLUME_BY_STATUS),
    "freshness_audit": QuerySpec(rq.q_freshness_audit, rq.ORACLE_FRESHNESS_AUDIT, headline=True),
    "consistency_score": QuerySpec(
        rq.q_consistency_score, rq.ORACLE_CONSISTENCY_SCORE, headline=True
    ),
    "reconciliation": QuerySpec(rq.q_reconciliation, rq.ORACLE_RECONCILIATION, headline=True),
    "fanout_volume": QuerySpec(rq.q_fanout_volume, rq.ORACLE_FANOUT_VOLUME, headline=True),
    # --- SQL analytics surface ---
    "pricing_summary": QuerySpec(rq.q_pricing_summary, rq.ORACLE_PRICING_SUMMARY, headline=True),
    "revenue_by_nation": QuerySpec(
        rq.q_revenue_by_nation, rq.ORACLE_REVENUE_BY_NATION, headline=True
    ),
    "top_orders_per_status": QuerySpec(
        rq.q_top_orders_per_status, rq.ORACLE_TOP_ORDERS_PER_STATUS
    ),
    "orphan_lineitems": QuerySpec(rq.q_orphan_lineitems, rq.ORACLE_ORPHAN_LINEITEMS),
}


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


def headline_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items() if spec.headline}
