"""Wider SQL-surface queries: declarative DQ rules, rollup/grouping
sets, set operations, as-of join, session windows — each with a DuckDB
oracle twin. These extend coverage beyond the reference's own operator
set to the surface a DQ/analytics engine is expected to have
(SURVEY.md §2 "built-in when needed" rows, made real and tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.operators import rules as R
from data_quality_checks_in_relational_database_spark.operators.asof import asof_join
from data_quality_checks_in_relational_database_spark.session import load_tables

# ---------------------------------------------------------------------------
# Declarative DQ rules (north-star: "DataFrame validation + quality rules")
# ---------------------------------------------------------------------------


def q_dq_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "lineitem", "customer"))
    ruleset = [
        R.not_null("orders", "o_orderkey"),
        R.unique_key("orders", "o_orderkey"),
        R.accepted_values("orders", "o_orderstatus", ["O", "F", "P"]),
        R.in_range("lineitem", "l_discount", 0.0, 0.1),
        R.matches_regex("customer", "c_name", r"^Customer#[0-9]+$"),
        R.expression("lineitem", "positive_price", "l_extendedprice > 0"),
        R.expression("orders", "orderdate_not_future", "o_orderdate < now()"),
        R.referential_integrity("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ]
    return R.evaluate_rules(t, ruleset)


ORACLE_DQ_RULES = """
WITH o AS (
    SELECT COUNT(*) AS n,
           SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS v_nn,
           COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS v_uq,
           SUM(CASE WHEN COALESCE(o_orderstatus IN ('O','F','P'), FALSE) THEN 0 ELSE 1 END) AS v_av,
           SUM(CASE WHEN COALESCE(o_orderdate < NOW(), FALSE) THEN 0 ELSE 1 END) AS v_fut
    FROM orders
),
l AS (
    SELECT COUNT(*) AS n,
           SUM(CASE WHEN COALESCE(l_discount BETWEEN 0.0 AND 0.1, FALSE) THEN 0 ELSE 1 END) AS v_rng,
           SUM(CASE WHEN COALESCE(l_extendedprice > 0, FALSE) THEN 0 ELSE 1 END) AS v_pos
    FROM lineitem
),
c AS (
    SELECT COUNT(*) AS n,
           SUM(CASE WHEN COALESCE(regexp_matches(c_name, '^Customer#[0-9]+$'), FALSE) THEN 0 ELSE 1 END) AS v_rx
    FROM customer
),
ri AS (
    SELECT (SELECT COUNT(*) FROM lineitem) AS n,
           (SELECT COUNT(*) FROM lineitem li
             WHERE NOT EXISTS (SELECT 1 FROM orders oo WHERE oo.o_orderkey = li.l_orderkey)) AS v
)
SELECT 'orders.o_orderkey.not_null' AS rule_name, 'orders' AS table_name, n AS n_rows,
       CAST(v_nn AS BIGINT) AS n_violations, v_nn = 0 AS passed FROM o
UNION ALL SELECT 'orders.o_orderkey.unique', 'orders', n, CAST(v_uq AS BIGINT), v_uq = 0 FROM o
UNION ALL SELECT 'orders.o_orderstatus.accepted_values', 'orders', n, CAST(v_av AS BIGINT), v_av = 0 FROM o
UNION ALL SELECT 'orders.orderdate_not_future', 'orders', n, CAST(v_fut AS BIGINT), v_fut = 0 FROM o
UNION ALL SELECT 'lineitem.l_discount.in_range', 'lineitem', n, CAST(v_rng AS BIGINT), v_rng = 0 FROM l
UNION ALL SELECT 'lineitem.positive_price', 'lineitem', n, CAST(v_pos AS BIGINT), v_pos = 0 FROM l
UNION ALL SELECT 'customer.c_name.matches_regex', 'customer', n, CAST(v_rx AS BIGINT), v_rx = 0 FROM c
UNION ALL SELECT 'lineitem.l_orderkey.ri.orders.o_orderkey', 'lineitem', n, CAST(v AS BIGINT), v = 0 FROM ri
"""


# ---------------------------------------------------------------------------
# Rollup / grouping sets
# ---------------------------------------------------------------------------


def q_rollup_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(cents) / 100.0).alias("total_price"),
        )
    )


ORACLE_ROLLUP_VOLUME = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0 AS total_price
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUILDING-segment customers that do (INTERSECT) and do not
    (EXCEPT) have open orders, tagged and unioned."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    seg = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    open_ = t["orders"].filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    both = seg.intersect(open_).select(F.lit("with_open_orders").alias("bucket"), "custkey")
    none = seg.exceptAll(open_.distinct()).select(
        F.lit("without_open_orders").alias("bucket"), "custkey"
    )
    return both.unionByName(none)


ORACLE_SET_OPS = """
SELECT 'with_open_orders' AS bucket, custkey FROM (
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
)
UNION ALL
SELECT 'without_open_orders', custkey FROM (
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
)
"""


# ---------------------------------------------------------------------------
# As-of join
# ---------------------------------------------------------------------------


def q_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup: for each event, the user's most recent
    order at-or-before the event timestamp. The right side is
    pre-aggregated to one row per (user, date) so the match is
    deterministic in both engines."""
    t = load_tables(spark, sf_dir, ("events", "orders"))
    right = (
        t["orders"]
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").cast("timestamp").alias("last_orderdate"),
        )
        .agg(F.max("o_orderkey").alias("last_orderkey"))
    )
    left = t["events"].select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    out = asof_join(
        left,
        right,
        on="user_id",
        left_ts="ts",
        right_ts="last_orderdate",
        right_payload=["last_orderkey", "last_orderdate"],
    )
    return out.select("event_id", "user_id", "last_orderkey", "last_orderdate")


ORACLE_ASOF_LAST_ORDER = """
WITH ro AS (
    SELECT o_custkey AS user_id, CAST(o_orderdate AS TIMESTAMP) AS last_orderdate,
           MAX(o_orderkey) AS last_orderkey
    FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, ro.last_orderkey, ro.last_orderdate
FROM events e ASOF LEFT JOIN ro
  ON e.user_id = ro.user_id AND CAST(e.ts AS TIMESTAMP) >= ro.last_orderdate
"""


# ---------------------------------------------------------------------------
# Session windows (gaps-and-islands)
# ---------------------------------------------------------------------------


def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity sessions with a 30-minute inactivity gap.
    Spark's native session_window (same operator Structured Streaming
    uses for stateful sessionization); the oracle reproduces it with a
    lag/cumulative-sum gaps-and-islands query."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    agg = ev.groupBy(
        F.session_window(F.col("ts"), "30 minutes").alias("w"), F.col("user_id")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return agg.select(
        "user_id",
        F.col("w.start").cast("timestamp").alias("session_start"),
        F.col("n_events"),
    )


ORACLE_SESSION_WINDOWS = """
WITH marked AS (
    SELECT user_id, ts,
           -- >= : Spark's session_window is half-open [t, t+gap), so an
           -- event exactly gap after the previous one STARTS a session
           CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
    FROM events
),
islands AS (
    SELECT user_id, ts,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS session_no
    FROM marked
)
SELECT user_id, CAST(MIN(ts) AS TIMESTAMP) AS session_start,
       COUNT(*) AS n_events
FROM islands GROUP BY user_id, session_no
"""


# ---------------------------------------------------------------------------
# Approximate distinct (sketch) — rows-only, pinned vs exact in pytest
# ---------------------------------------------------------------------------


def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile of orders (dtype column excluded from the
    gate — its rendering depends on session timestamp config)."""
    from data_quality_checks_in_relational_database_spark.operators.profile import profile_table

    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return profile_table(o, "orders").drop("dtype")


_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def _oracle_profile() -> str:
    aggs = ["COUNT(*) AS n"]
    for i, c in enumerate(_PROFILE_COLS):
        aggs += [
            f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS nn{i}",
            f"COUNT(DISTINCT {c}) AS nd{i}",
            f"CAST(MIN({c}) AS VARCHAR) AS mn{i}",
            f"CAST(MAX({c}) AS VARCHAR) AS mx{i}",
        ]
    branches = "\nUNION ALL ".join(
        f"SELECT 'orders' AS table_name, '{c}' AS \"column\", n AS n_rows, "
        f"CAST(nn{i} AS BIGINT) AS n_nulls, nd{i} AS n_distinct, "
        f"mn{i} AS min_value, mx{i} AS max_value FROM w"
        for i, c in enumerate(_PROFILE_COLS)
    )
    return f"WITH w AS (SELECT {', '.join(aggs)} FROM orders)\n{branches}"


ORACLE_PROFILE_ORDERS = _oracle_profile()


def q_snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-diff between the orders table and a deterministically
    perturbed 'next load' (drops keys %97, bumps totalprice on %89,
    adds shifted copies of %101): bounded drift summary."""
    from data_quality_checks_in_relational_database_spark.operators.diff import snapshot_diff_summary

    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    k = F.col("o_orderkey")
    new = o.filter(k % 97 != 0).withColumn(
        "o_totalprice",
        F.when(k % 89 == 0, F.col("o_totalprice") + 1).otherwise(F.col("o_totalprice")),
    )
    added = o.filter(k % 101 == 0).withColumn("o_orderkey", k + 10000000)
    new = new.unionByName(added)
    return snapshot_diff_summary(o, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"])


ORACLE_SNAPSHOT_DRIFT = """
WITH newsnap AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice,
           o_orderstatus
    FROM orders WHERE o_orderkey % 97 != 0
    UNION ALL
    SELECT o_orderkey + 10000000, o_totalprice, o_orderstatus
    FROM orders WHERE o_orderkey % 101 = 0
),
j AS (
    SELECT CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN (o.o_totalprice IS DISTINCT FROM n.o_totalprice)
                  OR (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus) THEN 'changed'
                ELSE 'unchanged' END AS change_type
    FROM orders o FULL OUTER JOIN newsnap n ON o.o_orderkey = n.o_orderkey
)
SELECT change_type, COUNT(*) AS n_keys FROM j GROUP BY 1
"""


def q_temporal_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-coverage check over order dates per status: days inside
    each status' own span with zero orders. Summarized per series so
    the report stays bounded."""
    from data_quality_checks_in_relational_database_spark.operators.completeness import temporal_gaps

    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    gaps = temporal_gaps(o, "o_orderstatus", "o_orderdate")
    return gaps.groupBy("series").agg(
        F.count(F.lit(1)).alias("n_gap_days"),
        F.min("day").alias("first_gap"),
        F.max("day").alias("last_gap"),
    )


ORACLE_TEMPORAL_GAPS = """
WITH days AS (
    SELECT DISTINCT o_orderstatus AS series, CAST(o_orderdate AS DATE) AS day FROM orders
),
spans AS (
    SELECT series, MIN(day) AS d0, MAX(day) AS d1 FROM days GROUP BY series
),
calendar AS (
    SELECT s.series, CAST(UNNEST(generate_series(s.d0, s.d1, INTERVAL 1 DAY)) AS DATE) AS day
    FROM spans s
),
gaps AS (
    SELECT c.series, c.day FROM calendar c
    WHERE NOT EXISTS (SELECT 1 FROM days d WHERE d.series = c.series AND d.day = c.day)
)
SELECT series, COUNT(*) AS n_gap_days, MIN(day) AS first_gap, MAX(day) AS last_gap
FROM gaps GROUP BY series
"""


def q_fd_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency probes: c_custkey→c_nationkey must hold
    (key determines attribute); user_id→event_type must not (behavioral
    data)."""
    from data_quality_checks_in_relational_database_spark.operators.completeness import fd_violations

    t = load_tables(spark, sf_dir, ("customer", "events"))
    a = fd_violations(t["customer"], "c_custkey", "c_nationkey").select(
        F.lit("customer.c_custkey->c_nationkey").alias("fd"), "*"
    )
    b = fd_violations(t["events"], "user_id", "event_type").select(
        F.lit("events.user_id->event_type").alias("fd"), "*"
    )
    return a.unionByName(b)


ORACLE_FD_CHECK = """
WITH a AS (
    SELECT COUNT(*) AS n_groups,
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_groups,
           MAX(nd) AS max_distinct
    FROM (SELECT c_custkey, COUNT(DISTINCT c_nationkey) AS nd FROM customer GROUP BY 1)
),
b AS (
    SELECT COUNT(*) AS n_groups,
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_groups,
           MAX(nd) AS max_distinct
    FROM (SELECT user_id, COUNT(DISTINCT event_type) AS nd FROM events GROUP BY 1)
)
SELECT 'customer.c_custkey->c_nationkey' AS fd, n_groups, n_violating_groups, max_distinct FROM a
UNION ALL
SELECT 'events.user_id->event_type', n_groups, n_violating_groups, max_distinct FROM b
"""


def q_cube_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all grouping-set combinations in
    one pass (partial aggregation covers every set)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


ORACLE_CUBE_VOLUME = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_dqa_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-call DQA suite (volume + freshness + rules + profile)
    normalized to a single long-format report."""
    from data_quality_checks_in_relational_database_spark.operators.checks import FreshnessSpec
    from data_quality_checks_in_relational_database_spark.plans.dqa import run_dqa

    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    result = run_dqa(
        t,
        rules=[
            R.not_null("orders", "o_orderkey"),
            R.unique_key("orders", "o_orderkey"),
            R.referential_integrity("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ],
        freshness=[FreshnessSpec("lineitem", t["lineitem"], "l_shipdate")],
        profile=["orders"],
    )
    return result.report.drop("date_created")


ORACLE_DQA_REPORT = """
SELECT 'volume' AS section, 'orders' AS table_name, 'record_count' AS item,
       'count' AS metric, CAST(COUNT(*) AS VARCHAR) AS value_str,
       CAST(NULL AS BOOLEAN) AS passed
FROM orders
UNION ALL
SELECT 'volume', 'lineitem', 'record_count', 'count', CAST(COUNT(*) AS VARCHAR), NULL
FROM lineitem
UNION ALL
SELECT 'freshness', 'lineitem', 'l_shipdate', 'max_date',
       CAST(MAX(CAST(l_shipdate AS DATE)) AS VARCHAR), NULL
FROM lineitem WHERE l_shipdate < NOW()
UNION ALL
SELECT 'rule', 'orders', 'orders.o_orderkey.not_null', 'n_violations',
       CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS VARCHAR),
       SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) = 0
FROM orders
UNION ALL
SELECT 'rule', 'orders', 'orders.o_orderkey.unique', 'n_violations',
       CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS VARCHAR),
       COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) = 0
FROM orders
UNION ALL
SELECT 'rule', 'lineitem', 'lineitem.l_orderkey.ri.orders.o_orderkey', 'n_violations',
       CAST((SELECT COUNT(*) FROM lineitem li
             WHERE NOT EXISTS (SELECT 1 FROM orders oo WHERE oo.o_orderkey = li.l_orderkey)) AS VARCHAR),
       (SELECT COUNT(*) FROM lineitem li
        WHERE NOT EXISTS (SELECT 1 FROM orders oo WHERE oo.o_orderkey = li.l_orderkey)) = 0
UNION ALL
SELECT 'profile', 'orders', col, 'n_nulls/n_distinct/min/max',
       nulls || '|' || dist || '|' || mn || '|' || mx, NULL
FROM (
    SELECT 'o_orderkey' AS col,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS VARCHAR) AS nulls,
           CAST(COUNT(DISTINCT o_orderkey) AS VARCHAR) AS dist,
           CAST(MIN(o_orderkey) AS VARCHAR) AS mn, CAST(MAX(o_orderkey) AS VARCHAR) AS mx
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS VARCHAR),
           CAST(COUNT(DISTINCT o_custkey) AS VARCHAR),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR) FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS VARCHAR),
           CAST(COUNT(DISTINCT o_orderstatus) AS VARCHAR),
           CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR) FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS VARCHAR),
           CAST(COUNT(DISTINCT o_totalprice) AS VARCHAR),
           CAST(MIN(o_totalprice) AS VARCHAR), CAST(MAX(o_totalprice) AS VARCHAR) FROM orders
    UNION ALL
    SELECT 'o_orderdate', CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS VARCHAR),
           CAST(COUNT(DISTINCT o_orderdate) AS VARCHAR),
           CAST(MIN(o_orderdate) AS VARCHAR), CAST(MAX(o_orderdate) AS VARCHAR) FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS VARCHAR),
           CAST(COUNT(DISTINCT o_orderpriority) AS VARCHAR),
           CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR) FROM orders
)
"""


def q_volume_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Control-chart volume check: daily event counts per type, each
    z-scored against its trailing 7 days (excluding itself)."""
    from data_quality_checks_in_relational_database_spark.operators.anomaly import metric_anomalies

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = ev.groupBy(
        F.col("event_type"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("n_events"))
    out = metric_anomalies(
        daily, keys=["event_type"], time_col="day", value_col="n_events"
    )
    return out.select(
        "event_type",
        "day",
        "n_events",
        F.round("trailing_mean", 6).alias("trailing_mean"),
        F.round("trailing_std", 6).alias("trailing_std"),
        "z_score",
        "is_anomaly",
    )


ORACLE_VOLUME_ANOMALIES = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS DOUBLE) AS n_events
    FROM events GROUP BY 1, 2
),
stats AS (
    SELECT event_type, day, n_events,
           AVG(n_events) OVER w AS m,
           STDDEV_SAMP(n_events) OVER w AS s,
           COUNT(n_events) OVER w AS nh
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day, n_events,
       ROUND(m, 6) AS trailing_mean,
       ROUND(s, 6) AS trailing_std,
       CASE WHEN nh >= 3 AND s > 0 THEN ROUND((n_events - m) / s, 6) END AS z_score,
       COALESCE(ABS(CASE WHEN nh >= 3 AND s > 0 THEN ROUND((n_events - m) / s, 6) END) > 3.0,
                FALSE) AS is_anomaly
FROM stats
"""


def q_distribution_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution profiling: exact interpolated percentiles per group
    plus a fixed-width histogram of order totals — the DQ follow-up to
    min/max profiling. Percentiles use the exact sort-based
    ``percentile`` (linear interpolation, same formula as DuckDB's
    quantile_cont); at 100 TB swap in ``percentile_approx`` and drop
    the oracle to a tolerance check."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    pct = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return pct


ORACLE_DISTRIBUTION_STATS = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS median_qty,
       ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of o_totalprice in 50k buckets — pure
    integer floor arithmetic, so buckets are engine-exact."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    bucket = F.floor(F.col("o_totalprice") / 50000).cast("long")
    return o.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n_orders"))


ORACLE_PRICE_HISTOGRAM = """
SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket, COUNT(*) AS n_orders
FROM orders GROUP BY 1
"""


# Engine-dialect-shared SQL: the exact same text runs on Spark SQL and
# DuckDB — exercises the raw-SQL entry point (reference's SQL-string →
# DataFrame boundary, SURVEY.md §3 entry point 3) and a correlated
# aggregate subquery that Catalyst decorrelates.
SQL_SMALL_QUANTITY = """
SELECT p.p_brand,
       COUNT(*) AS n_small,
       -- CAST to DOUBLE: a bare 100.0 literal is DECIMAL in Spark SQL
       -- (decimal division) but DOUBLE in DuckDB — force both to double
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) / CAST(100 AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
)
GROUP BY p.p_brand
"""


def q_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_quality_checks_in_relational_database_spark.session import register_views

    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(SQL_SMALL_QUANTITY)


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketch vs exact distinct, gated: the exact counts are
    oracle-checkable, and the ``*_within_tol`` booleans turn the
    sketch's accuracy contract (±5%) into a hash-stable column — the
    gate goes red if the sketch ever drifts out of tolerance, without
    requiring the raw (engine-specific) approximation to match."""
    t = load_tables(spark, sf_dir, ("lineitem", "events"))
    orders = t["lineitem"].agg(
        # rsd is a *standard deviation*, not a bound; 0.01 keeps the
        # sketch well inside the 5% tolerance gate below
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
    )
    users = t["events"].agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    tol = 0.05
    within = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) <= F.lit(tol) * F.col(e)
    )
    return orders.crossJoin(users).select(
        "exact_orders",
        "exact_users",
        within("approx_orders", "exact_orders").alias("orders_within_tol"),
        within("approx_users", "exact_users").alias("users_within_tol"),
    )


ORACLE_APPROX_DISTINCT = """
SELECT (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS exact_orders,
       (SELECT COUNT(DISTINCT user_id) FROM events) AS exact_users,
       TRUE AS orders_within_tol,
       TRUE AS users_within_tol
"""


# Shared SQL text (runs verbatim on Spark AND DuckDB): LATERAL
# correlated subquery — per outer row, a dependent ordered/limited
# inner query. Catalyst plans this via lateral-join decorrelation into
# a ranked window over the (broadcast) dimension join, not per-row
# re-execution; at scale the equivalent hand-written shape is
# top_orders_per_status's WindowGroupLimit.
SQL_LATERAL_TOP_BAL = """
SELECT n.n_name AS nation, c.c_custkey AS custkey, c.c_acctbal AS acctbal
FROM nation n, LATERAL (
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_nationkey = n.n_nationkey
    ORDER BY c_acctbal DESC, c_custkey ASC
    LIMIT 2
) c
"""


def q_lateral_top_bal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_quality_checks_in_relational_database_spark.session import register_views

    register_views(spark, sf_dir, ("nation", "customer"))
    return spark.sql(SQL_LATERAL_TOP_BAL)


def q_asof_nearest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time as-of with a 30-day tolerance (ties resolve
    backward, the pandas merge_asof convention). Distances are
    integer SECONDS (truncated) on both engines so sub-second event
    fractions cannot flip a comparison one engine sees and the other
    doesn't."""
    from data_quality_checks_in_relational_database_spark.operators.asof import asof_join

    t = load_tables(spark, sf_dir, ("events", "orders"))
    right = (
        t["orders"]
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").cast("timestamp").alias("nearest_orderdate"),
        )
        .agg(F.max("o_orderkey").alias("nearest_orderkey"))
    )
    left = t["events"].select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = asof_join(
        left,
        right,
        on="user_id",
        left_ts="ts",
        right_ts="nearest_orderdate",
        right_payload=["nearest_orderkey"],
        direction="nearest",
        tolerance_seconds=30 * 24 * 3600,
    )
    return out.select("event_id", "user_id", "nearest_orderkey")


ORACLE_ASOF_NEAREST = """
WITH r AS (
    SELECT o_custkey AS user_id, CAST(o_orderdate AS TIMESTAMP) AS rts,
           MAX(o_orderkey) AS nearest_orderkey
    FROM orders GROUP BY 1, 2
),
e AS (
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
           CAST(FLOOR(epoch(ts)) AS BIGINT) AS e_sec
    FROM events
)
SELECT e.event_id, e.user_id, m.nearest_orderkey
FROM e LEFT JOIN LATERAL (
    SELECT r.nearest_orderkey,
           CASE WHEN r.rts <= e.ts THEN e.e_sec - CAST(epoch(r.rts) AS BIGINT)
                ELSE CAST(epoch(r.rts) AS BIGINT) - e.e_sec END AS dist
    FROM r
    WHERE r.user_id = e.user_id
      AND (CASE WHEN r.rts <= e.ts THEN e.e_sec - CAST(epoch(r.rts) AS BIGINT)
                ELSE CAST(epoch(r.rts) AS BIGINT) - e.e_sec END) <= 2592000
    ORDER BY dist ASC,
             CASE WHEN r.rts <= e.ts THEN 0 ELSE 1 END ASC
    LIMIT 1
) m ON TRUE
"""


def q_dq_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table health rollup of the declarative rule suite — the
    scorecard a DQ dashboard renders: rule counts, pass rate, and the
    worst per-rule violation RATE (severity, not just red/green).
    Derives entirely from the bounded ``dq_rules`` report frame."""
    report = q_dq_rules(spark, sf_dir)
    return (
        report.groupBy("table_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rules"),
            F.sum(F.when(F.col("passed"), 1).otherwise(0)).cast("long").alias("n_passed"),
            F.round(
                F.sum(F.when(F.col("passed"), 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("pass_rate"),
            # nullif guard: an empty table's rate is NULL, not an ANSI
            # divide-by-zero error
            F.round(
                F.max(F.col("n_violations") / F.nullif(F.col("n_rows"), F.lit(0))), 6
            ).alias("worst_violation_rate"),
        )
    )


ORACLE_DQ_SCORECARD = f"""
WITH report AS ({ORACLE_DQ_RULES})
SELECT table_name,
       CAST(COUNT(*) AS BIGINT) AS n_rules,
       CAST(SUM(CASE WHEN passed THEN 1 ELSE 0 END) AS BIGINT) AS n_passed,
       ROUND(SUM(CASE WHEN passed THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 6) AS pass_rate,
       ROUND(MAX(n_violations / CAST(n_rows AS DOUBLE)), 6) AS worst_violation_rate
FROM report
GROUP BY table_name
"""
