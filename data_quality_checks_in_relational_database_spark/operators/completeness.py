"""Completeness / consistency primitives beyond row-level rules.

- :func:`temporal_gaps` — calendar coverage: for each series, which
  days between its first and last observation have NO data (the silent
  failure mode of ingest pipelines that volume totals hide).
- :func:`fd_violations` — functional-dependency check: does column X
  determine column Y (one distinct Y per X)? The classic consistency
  probe for denormalized warehouse tables.

Both are one-aggregation shapes: grouped min/max + an exploded
calendar for gaps (rows ∝ series × days, bounded by the time range);
two-level aggregation with map-side combine for FDs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def temporal_gaps(
    df: DataFrame,
    series_col: str,
    ts_col: str,
) -> DataFrame:
    """Days with zero rows per series, within each series' own
    [min_day, max_day] span. Output: (series, day) — one row per gap.

    ``sequence(min, max, 1 day)`` explodes each series' calendar (≤
    span days per series — bounded, independent of row count), then a
    left-anti join against the observed days keeps the holes.
    """
    days = df.select(
        F.col(series_col).alias("series"), F.to_date(ts_col).alias("day")
    ).distinct()
    spans = days.groupBy("series").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    calendar = spans.select(
        "series",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    return calendar.join(days, ["series", "day"], "left_anti")


def fk_containment_report(
    pairs: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Foreign-key containment audit over declared candidate relations.

    ``pairs``: (relation_name, child_df, child_key, parent_df,
    parent_key) tuples. For each: how many DISTINCT child keys exist,
    how many have no parent (orphan keys), and the containment ratio —
    the metric schema-discovery tools (e.g. Metanome's IND detection)
    and warehouse DQ suites use to confirm/refute referential
    integrity before trusting a join.

    Output: (relation, n_child_keys, n_orphan_keys, containment),
    one bounded row per declared pair. Plan shape per pair: DISTINCT
    on the child key (composite-key shuffle — skew-safe, same move as
    two_phase_distinct_count), then a left-anti join against the
    parent's (distinct) key — AQE broadcasts the smaller side. NULL
    child keys are excluded (SQL FK semantics: NULL references
    nothing).
    """
    reports = []
    for name, child, child_key, parent, parent_key in pairs:
        ckeys = (
            child.select(F.col(child_key).alias("k"))
            .filter(F.col("k").isNotNull())
            .distinct()
        )
        pkeys = parent.select(F.col(parent_key).alias("k")).distinct()
        orphans = ckeys.join(pkeys, "k", "left_anti")
        n_child = ckeys.agg(F.count(F.lit(1)).alias("n_child_keys"))
        n_orph = orphans.agg(F.count(F.lit(1)).alias("n_orphan_keys"))
        reports.append(
            n_child.crossJoin(n_orph).select(
                F.lit(name).alias("relation"),
                "n_child_keys",
                "n_orphan_keys",
                # empty child table -> NULL containment (no ANSI div/0)
                F.when(
                    F.col("n_child_keys") > 0,
                    (F.col("n_child_keys") - F.col("n_orphan_keys"))
                    / F.col("n_child_keys"),
                ).alias("containment"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def fd_violations(df: DataFrame, determinant: str, dependent: str) -> DataFrame:
    """Does ``determinant`` functionally determine ``dependent``?

    Output (single row): (n_groups, n_violating_groups, max_distinct),
    where a violating group has >1 distinct dependent value. Two
    cascaded aggregations — both partial-aggregated.
    """
    per_group = df.groupBy(determinant).agg(
        F.count_distinct(dependent).alias("n_distinct")
    )
    return per_group.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("n_distinct") > 1, 1).otherwise(0)).cast("long").alias(
            "n_violating_groups"
        ),
        F.max("n_distinct").alias("max_distinct"),
    )


def date_order_violations(
    df: DataFrame,
    orderings: list[tuple[str, str]],
    group_col: str | None = None,
) -> DataFrame:
    """Cross-field temporal-consistency audit: for each declared
    ``(earlier, later)`` column pair, count rows where earlier > later
    (e.g. ship after receipt, commit before order). The lifecycle
    sanity check every warehouse fact table needs and volume/freshness
    totals can't see.

    Output: (rule, n_rows, n_violations, n_null_pairs) — one row per
    declared ordering; all checks evaluate in a single scan (one wide
    conditional aggregate, map-side combined), optionally per group.
    """
    aggs = []
    rows = F.count(F.lit(1))
    out = []
    gcols = [group_col] if group_col else []
    for earlier, later in orderings:
        e, l = F.col(earlier), F.col(later)
        viol = F.sum(F.when(e > l, 1).otherwise(0)).cast("long")
        nulls = F.sum((e.isNull() | l.isNull()).cast("long")).cast("long")
        out.append((f"{earlier}<={later}", viol, nulls))
    wide = df.groupBy(*gcols).agg(
        rows.alias("__n"), *[x.alias(f"v{i}") for i, (_, x, _) in enumerate(out)],
        *[x.alias(f"z{i}") for i, (_, _, x) in enumerate(out)]
    )
    parts = [
        wide.select(
            *gcols,
            F.lit(rule).alias("rule"),
            F.col("__n").alias("n_rows"),
            F.col(f"v{i}").alias("n_violations"),
            F.col(f"z{i}").alias("n_null_pairs"),
        )
        for i, (rule, _, _) in enumerate(out)
    ]
    res = parts[0]
    for p in parts[1:]:
        res = res.unionByName(p)
    return res


def backfill_ranges(
    df: DataFrame,
    series_col: str,
    ts_col: str,
) -> DataFrame:
    """Contiguous missing-day ranges per series — :func:`temporal_gaps`
    collapsed into actionable backfill jobs: (series, gap_start,
    gap_end, n_days). A scheduler replays one range per job instead of
    one day per job.

    Gaps-and-islands over the gap days (lag + datediff per series —
    one bounded window pass; the gap-day frame is ≤ span days per
    series).
    """
    from pyspark.sql.window import Window

    gaps = temporal_gaps(df, series_col, ts_col)
    w = Window.partitionBy("series").orderBy("day")
    runs = gaps.withColumn(
        "brk",
        F.when(
            F.datediff(F.col("day"), F.lag("day").over(w)) == 1, 0
        ).otherwise(1),
    ).withColumn(
        "run_id", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        runs.groupBy("series", "run_id")
        .agg(
            F.min("day").alias("gap_start"),
            F.max("day").alias("gap_end"),
            F.count(F.lit(1)).cast("long").alias("n_days"),
        )
        .select("series", "gap_start", "gap_end", "n_days")
    )
