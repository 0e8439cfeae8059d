"""Snapshot diff — keyed table drift between two versions (the
"data-diff" DQ primitive: what was added / removed / changed between
yesterday's and today's load).

Shape: one full-outer join on the key; change classification compares
the non-key columns with null-safe equality. The join shuffles both
snapshots by key once (AQE handles skew); the per-row output can be
consumed directly or collapsed to the bounded summary.

At 100 TB, prefer the summary (aggregation happens map-side after the
join) and pushdown-friendly snapshot predicates (e.g. partition = day)
so each side scans only its snapshot.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key change rows: ``(*keys, change_type)`` with change_type in
    {added, removed, changed, unchanged}."""
    compare_cols = compare_cols or [c for c in old.columns if c not in keys]
    o = old.select(*keys, *[F.col(c).alias(f"__o_{c}") for c in compare_cols], F.lit(1).alias("__in_old"))
    n = new.select(*keys, *[F.col(c).alias(f"__n_{c}") for c in compare_cols], F.lit(1).alias("__in_new"))
    j = o.join(n, keys, "full_outer")
    differs = reduce(
        lambda a, b: a | b,
        [~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")) for c in compare_cols],
    )
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(*keys, change.alias("change_type"))


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Bounded drift report: ``(change_type, n_keys)``."""
    return (
        snapshot_diff(old, new, keys, compare_cols)
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )
