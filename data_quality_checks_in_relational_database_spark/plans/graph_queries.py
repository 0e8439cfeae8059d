"""Graph-analytics queries over the driver testdata, with DuckDB
oracles.

The reference has no graph operations (SURVEY.md §1.1 — flat tabular
checks only); these are training-data-pipeline extensions: link/
transition-graph authority scores are a standard corpus-quality prior,
and the event transition graph doubles as a product-analytics surface.

Oracle strategy: PageRank is iterative, which recursive CTEs express
awkwardly (the recursive member may reference the working table only
once, but each step needs both the per-node contribution join AND the
global dangling-mass scalar). Since the iteration count is FIXED, the
oracle simply UNROLLS: ``pr0 .. pr{k}`` chained CTEs generated
mechanically below — plain ANSI SQL, no recursion, bit-for-bit the
same recurrence the Spark loop runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.operators.graph import pagerank
from data_quality_checks_in_relational_database_spark.session import load_tables

_ITERS = 10
_DAMPING = 0.85


def q_pagerank_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the first-order event-transition graph: nodes are
    event types, arcs are observed (state -> next state) transitions
    per user (same successor definition as ``transitions``), weighted
    by transition count. One window scan builds the graph; the fixed
    10-iteration rank loop shuffles only (node, rank) pairs
    (operators/graph.py)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    arcs = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    out = pagerank(arcs, "src", "dst", weight_col="w", iters=_ITERS, damping=_DAMPING)
    return out.select(F.col("node").alias("event_type"), "rank").orderBy(
        F.col("rank").desc(), F.col("event_type")
    )


def _pagerank_oracle(iters: int, damping: float) -> str:
    head = """
WITH e0 AS (
    SELECT user_id AS u, event_type AS s, epoch_us(ts) AS t, event_id AS rid
    FROM events
),
tr AS (
    SELECT s AS src, LEAD(s) OVER (PARTITION BY u ORDER BY t, rid) AS dst FROM e0
),
edges AS (
    SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS w
    FROM tr WHERE dst IS NOT NULL GROUP BY src, dst
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
outw AS (SELECT src, SUM(w) AS tw FROM edges GROUP BY src),
pr0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes)"""
    steps = []
    for i in range(1, iters + 1):
        # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and
        # each step references pr{i-1} twice (contribution join +
        # dangling-mass scalar) — inlined, the plan re-expands the whole
        # upstream chain 2^k times and never finishes at k=10.
        steps.append(
            f""",
pr{i} AS MATERIALIZED (
    SELECT nd.node,
           (1 - {damping}) / (SELECT n FROM nn)
           + {damping} * (
                COALESCE(c.contrib, 0)
                + (SELECT COALESCE(SUM(p.r), 0) FROM pr{i - 1} p
                   WHERE p.node NOT IN (SELECT src FROM edges))
                  / (SELECT n FROM nn)
           ) AS r
    FROM nodes nd
    LEFT JOIN (
        SELECT e.dst, SUM(p.r * e.w / o.tw) AS contrib
        FROM pr{i - 1} p
        JOIN edges e ON p.node = e.src
        JOIN outw o ON o.src = e.src
        GROUP BY e.dst
    ) c ON c.dst = nd.node
)"""
        )
    tail = f"""
SELECT node AS event_type, ROUND(r, 6) AS rank
FROM pr{iters}
ORDER BY rank DESC, event_type
"""
    return head + "".join(steps) + tail


ORACLE_PAGERANK_EVENTS = _pagerank_oracle(_ITERS, _DAMPING)
