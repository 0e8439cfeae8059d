"""Advanced join / decorrelation query shapes (TPC-H style).

The reference's checks are single-table aggregates plus one full-outer
reconciliation join (SURVEY.md §2.3-2.4); an engine a reference user
migrates onto must also handle the classic warehouse join shapes those
checks get embedded in: correlated scalar subqueries (decorrelated to
aggregate-broadcast joins), outer-join count distributions, grouped
HAVING semi-joins, multi-EXISTS anti-join chains, and 5-way star joins.
Each query here is the DataFrame-native decorrelation of a well-known
TPC-H pattern, adapted to the driver's testdata schema, with a DuckDB
oracle that keeps the CORRELATED form — so the gate proves the
decorrelation is semantics-preserving, not just self-consistent.

Scale notes (100 TB):
- every decorrelated aggregate side (per-type mins, per-nation
  averages, the global max/avg scalars) is orders of magnitude smaller
  than the fact table and explicitly ``broadcast()`` — no shuffle is
  added over the plain scan;
- fact-fact self-semantics (the EXISTS / NOT EXISTS chain) run as
  LEFT SEMI / LEFT ANTI joins on the join key — Spark's hash variants,
  never a correlated per-row subquery;
- money aggregates use exact integer cents (``money_sum``) so results
  are bit-stable under any partitioning (see functions/scalars.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.functions.scalars import money_sum
from data_quality_checks_in_relational_database_spark.session import load_tables


# ---------------------------------------------------------------------------
# Q2 shape — correlated scalar MIN subquery -> aggregate + broadcast join
# ---------------------------------------------------------------------------


def q_min_price_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts priced at the minimum of their type — the TPC-H Q2
    correlated-subquery shape. The correlated ``MIN(...) WHERE p2.type
    = p.type`` decorrelates into one tiny per-type aggregate (6 rows
    here, bounded by distinct types anywhere) broadcast back onto the
    part scan: zero shuffles on the big side."""
    part = load_tables(spark, sf_dir, ("part",))["part"]
    mins = part.groupBy("p_type").agg(F.min("p_retailprice").alias("min_price"))
    return (
        part.join(F.broadcast(mins), "p_type")
        .filter(F.col("p_retailprice") == F.col("min_price"))
        .select("p_partkey", "p_type", "p_retailprice")
    )


ORACLE_MIN_PRICE_PARTS = """
SELECT p_partkey, p_type, p_retailprice
FROM part p
WHERE p_retailprice = (
    SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type
)
"""


# ---------------------------------------------------------------------------
# Q13 shape — outer-join count distribution
# ---------------------------------------------------------------------------


def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers placed k orders, INCLUDING k=0 — the TPC-H
    Q13 left-outer + double-group shape. The order counts are
    aggregated BEFORE the join (an aggregate pushdown Catalyst does not
    do through outer joins itself): the join shuffles one (custkey,
    count) row per customer instead of every order row, and the left
    join + COALESCE(0) preserves the orderless customers the oracle's
    LEFT OUTER COUNT produces."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    per_key = t["orders"].groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    per_cust = (
        t["customer"]
        .join(per_key, t["customer"].c_custkey == per_key.o_custkey, "left")
        .select(F.coalesce("n", F.lit(0)).alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .select(F.col("c_count").cast("long"), "custdist")
    )


ORACLE_ORDER_COUNT_DISTRIBUTION = """
SELECT CAST(c_count AS BIGINT) AS c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
    FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
)
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# Q15 shape — aggregate, then filter on the aggregate's global MAX
# ---------------------------------------------------------------------------


def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum Q1-1996 revenue — TPC-H Q15's
    view + scalar-MAX-subquery shape. Revenue is exact integer cents,
    so the ``= MAX`` filter is bit-deterministic; the 1-row max is
    broadcast (cross join with a single-row frame), never collected."""
    t = load_tables(spark, sf_dir, ("lineitem", "supplier"))
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(top), rev.total_revenue == top.max_revenue)
        .join(F.broadcast(t["supplier"]), rev.l_suppkey == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


ORACLE_TOP_SUPPLIER_REVENUE = """
WITH revenue AS (
    SELECT l_suppkey,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT)
             / 100.0 AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


# ---------------------------------------------------------------------------
# Q16 shape — NOT IN subquery + grouped COUNT DISTINCT
# ---------------------------------------------------------------------------


def q_supplier_parts_excl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier count per (brand, size) EXCLUDING flagged
    suppliers — TPC-H Q16's NOT-IN + count-distinct shape. The NOT IN
    becomes a LEFT ANTI join against the (tiny, broadcast) flagged-
    supplier list; the count-distinct shuffles only (brand, size,
    suppkey) triples."""
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier"))
    flagged = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["lineitem"]
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(flagged), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(t["part"].select("p_partkey", "p_brand", "p_size")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


ORACLE_SUPPLIER_PARTS_EXCL = """
SELECT p_brand, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
"""


# ---------------------------------------------------------------------------
# Q18 shape — IN over a grouped HAVING subquery
# ---------------------------------------------------------------------------


def q_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total line quantity exceeds 300 — TPC-H Q18's
    grouped-HAVING-IN shape. Quantity totals sum exact integer
    centi-units so the threshold compare can't flip with partition
    order. The qualifying-key set is small (HAVING-filtered) and
    drives SEMI-style joins into orders and customer."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "customer"))
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg((F.sum(F.round(F.col("l_quantity") * 100, 0).cast("long")) / 100.0).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300.0)
    )
    return (
        t["orders"]
        .join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
    )


ORACLE_LARGE_VOLUME_ORDERS = """
WITH big AS (
    SELECT l_orderkey,
           SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) / 100.0 AS sum_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) / 100.0 > 300.0
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
       ROUND(b.sum_qty, 2) AS sum_qty
FROM orders o
JOIN big b ON o.o_orderkey = b.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""


# ---------------------------------------------------------------------------
# Q20 flavor — correlated AVG against the row's own group
# ---------------------------------------------------------------------------


def q_above_avg_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers whose balance beats their nation's average — the
    correlated-AVG shape (TPC-H Q17/Q20 family). The per-nation average
    is computed from exact integer cents (sum/count of longs) so the
    comparison is deterministic, decorrelated into a 25-row broadcast."""
    t = load_tables(spark, sf_dir, ("supplier", "nation"))
    cents = F.round(F.col("s_acctbal") * 100, 0).cast("long")
    nat_avg = (
        t["supplier"]
        .groupBy("s_nationkey")
        .agg((F.sum(cents) / F.count(F.lit(1)) / 100.0).alias("nation_avg"))
    )
    return (
        t["supplier"]
        .join(F.broadcast(nat_avg), "s_nationkey")
        .filter(F.col("s_acctbal") > F.col("nation_avg"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_suppkey",
            "s_name",
            "n_name",
            "s_acctbal",
            F.round("nation_avg", 6).alias("nation_avg"),
        )
    )


ORACLE_ABOVE_AVG_SUPPLIERS = """
WITH nat AS (
    SELECT s_nationkey,
           SUM(CAST(ROUND(s_acctbal * 100, 0) AS BIGINT)) / CAST(COUNT(*) AS DOUBLE) / 100.0
             AS nation_avg
    FROM supplier GROUP BY s_nationkey
)
SELECT s.s_suppkey, s.s_name, n.n_name, s.s_acctbal,
       ROUND(nat.nation_avg, 6) AS nation_avg
FROM supplier s
JOIN nat ON s.s_nationkey = nat.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_acctbal > nat.nation_avg
"""


# ---------------------------------------------------------------------------
# Q21 shape — EXISTS + NOT EXISTS chain -> semi + anti joins
# ---------------------------------------------------------------------------


def q_sole_return_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per supplier: count of multi-supplier orders where THIS supplier
    returned ('R') a line and NO OTHER supplier did — TPC-H Q21's
    EXISTS / NOT-EXISTS chain. Instead of translating the two
    correlated predicates into semi + anti joins (three lineitem
    passes, inequality residuals), both collapse into ONE per-order
    aggregate: EXISTS(other supplier) ⇔ countDistinct(suppkey) ≥ 2,
    NOT EXISTS(other returner) ⇔ countDistinct(R-suppkey) = 1 — so the
    plan is one aggregation plus one equi-join on the order key. The
    oracle keeps the correlated EXISTS/NOT-EXISTS form, proving the
    rewrite is semantics-preserving."""
    t = load_tables(spark, sf_dir, ("lineitem", "supplier"))
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_returnflag")
    per_order = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    base = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    qualified = base.join(
        per_order.where((F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1)),
        "l_orderkey",
        "left_semi",
    )
    return (
        qualified.join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


ORACLE_SOLE_RETURN_SUPPLIERS = """
WITH base AS (
    SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
)
SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM base b
JOIN supplier s ON b.l_suppkey = s.s_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = b.l_orderkey AND l2.l_suppkey <> b.l_suppkey
)
AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = b.l_orderkey AND l3.l_suppkey <> b.l_suppkey
      AND l3.l_returnflag = 'R'
)
GROUP BY s.s_suppkey, s.s_name
"""


# ---------------------------------------------------------------------------
# Q22 shape — global scalar AVG + anti join
# ---------------------------------------------------------------------------


def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per nation: customers with above-average positive balance and
    NO orders — TPC-H Q22's scalar-AVG + NOT-EXISTS shape. The global
    average is one broadcast row (exact cents); NOT EXISTS is a hash
    LEFT ANTI join against the orders key projection."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "nation"))
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    avg_pos = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0)
        .agg((F.sum(cents) / F.count(F.lit(1)) / 100.0).alias("avg_bal"))
    )
    return (
        t["customer"]
        .join(F.broadcast(avg_pos))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            t["orders"].select(F.col("o_custkey")).distinct(),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            money_sum("c_acctbal").alias("totacctbal"),
        )
    )


ORACLE_IDLE_RICH_CUSTOMERS = """
WITH avg_bal AS (
    SELECT SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) / CAST(COUNT(*) AS DOUBLE) / 100.0 AS a
    FROM customer WHERE c_acctbal > 0
)
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS totacctbal
FROM customer c, avg_bal
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_acctbal > avg_bal.a
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY n.n_name
"""


# ---------------------------------------------------------------------------
# Q7 shape — two-dimension star join (supplier nation x customer nation)
# ---------------------------------------------------------------------------


def q_nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-nation revenue flows by year — TPC-H Q7's 5-way star
    join. Both nation dims broadcast; the only shuffles are
    lineitem⋈orders and orders⋈customer on their keys, then one
    map-side-combined aggregate. Supplier/customer dims are small here
    but would still hash-join co-partitioned at 100 TB."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "customer", "supplier", "nation"))
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        t["lineitem"]
        .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"].select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"].select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


ORACLE_NATION_TRADE_FLOWS = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)) AS BIGINT)
         / 100.0 AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l.l_shipdate)
"""


# ---------------------------------------------------------------------------
# Q9 shape — part-filtered profit by nation x year
# ---------------------------------------------------------------------------


def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue on 'red' parts by supplier nation and order year —
    TPC-H Q9's filtered 5-way join. The part filter prunes BEFORE the
    join (pushed into the part scan, then a broadcast semi-shape join
    keeps only matching lineitems), so the big table never carries
    non-matching rows through the shuffle."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "part", "supplier", "nation"))
    red = t["part"].filter(F.col("p_name").contains("red")).select("p_partkey")
    return (
        t["lineitem"]
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["orders"].select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("profit"))
    )


ORACLE_PRODUCT_PROFIT = """
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)) AS BIGINT)
         / 100.0 AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
"""


# ---------------------------------------------------------------------------
# Q14 shape — conditional-aggregate ratio (promo revenue share)
# ---------------------------------------------------------------------------


def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of 1996-Q1 revenue coming from PROMO-type parts — the
    TPC-H Q14 CASE-inside-aggregate ratio. One broadcast join of the
    date-filtered lineitem scan against the part dimension; both sums
    are exact integer cents so the ratio is partition-order stable."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    j = li.join(F.broadcast(t["part"]), li.l_partkey == F.col("p_partkey"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    agg = j.agg(
        money_sum(promo).alias("promo_revenue"),
        money_sum(rev).alias("total_revenue"),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (
            F.round(
                100.0 * F.col("promo_revenue") / F.col("total_revenue"), 6
            )
            + F.lit(0.0)
        ).alias("promo_pct"),
    )


ORACLE_PROMO_REVENUE_SHARE = """
WITH j AS (
    SELECT CASE WHEN p.p_type = 'PROMO'
                THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END AS promo,
           l.l_extendedprice * (1 - l.l_discount) AS rev
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01'
),
agg AS (
    SELECT CAST(SUM(CAST(ROUND(promo * 100, 0) AS BIGINT)) AS BIGINT) / 100.0
             AS promo_revenue,
           CAST(SUM(CAST(ROUND(rev * 100, 0) AS BIGINT)) AS BIGINT) / 100.0
             AS total_revenue
    FROM j
)
SELECT promo_revenue, total_revenue,
       ROUND(100.0 * promo_revenue / total_revenue, 6) + 0.0 AS promo_pct
FROM agg
"""


# ---------------------------------------------------------------------------
# Q19 shape — OR-of-ANDs join predicate (disjunctive pushdown)
# ---------------------------------------------------------------------------


def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue matched by a disjunction of brand/size/quantity clause
    groups — the TPC-H Q19 shape. The whole OR-of-ANDs stays ONE join
    predicate: Catalyst extracts the common p_partkey equi-key for the
    hash join, pushes the brand/size disjunction's common subparts to
    the part scan, and evaluates the residual clauses post-join —
    never a cartesian fallback (pinned by the plan audit)."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li, p = t["lineitem"], t["part"]
    cond = (li.l_partkey == p.p_partkey) & (
        (
            (p.p_brand == "Brand#11")
            & (p.p_size <= 15)
            & (li.l_quantity >= 1)
            & (li.l_quantity <= 20)
        )
        | (
            (p.p_brand == "Brand#23")
            & (p.p_size <= 30)
            & (li.l_quantity >= 10)
            & (li.l_quantity <= 35)
        )
        | (
            (p.p_brand == "Brand#15")
            & (p.p_size <= 50)
            & (li.l_quantity >= 20)
            & (li.l_quantity <= 50)
        )
    )
    j = li.join(F.broadcast(p), cond)
    return j.agg(
        money_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


ORACLE_DISJUNCTIVE_REVENUE = """
SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                     AS BIGINT)) AS BIGINT) / 100.0 AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#11' AND p.p_size <= 15
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#23' AND p.p_size <= 30
       AND l.l_quantity BETWEEN 10 AND 35)
   OR (p.p_brand = 'Brand#15' AND p.p_size <= 50
       AND l.l_quantity BETWEEN 20 AND 50)
"""


# ---------------------------------------------------------------------------
# Q8 shape — national market share (CASE ratio over a 6-way star join)
# ---------------------------------------------------------------------------


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_5 suppliers' share of STANDARD-part revenue sold to
    AMERICA-region customers, per order year — the TPC-H Q8 market-share
    shape. The star resolves dimension-first: part filter, supplier ->
    nation (supplier-nation name), customer -> nation -> region (region
    mask) are all broadcast onto the two fact scans, so the only
    shuffle is lineitem |><| orders on the order key. Both CASE sums
    are exact integer cents, making the per-year ratio bit-stable
    under any partitioning."""
    t = load_tables(
        spark,
        sf_dir,
        ("lineitem", "orders", "customer", "supplier", "part", "nation", "region"),
    )
    nat = t["nation"]
    # customers restricted to the AMERICA region (broadcast chain)
    amer_cust = (
        t["customer"]
        .join(
            F.broadcast(
                nat.join(
                    F.broadcast(
                        t["region"].filter(F.col("r_name") == "AMERICA")
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp_nat = t["supplier"].join(
        F.broadcast(nat.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    std_part = t["part"].filter(F.col("p_type") == "STANDARD").select("p_partkey")
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    j = (
        t["lineitem"]
        .join(F.broadcast(std_part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(amer_cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_rev = F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(F.lit(0.0))
    return (
        j.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            money_sum(nation_rev).alias("nation_revenue"),
            money_sum(rev).alias("total_revenue"),
        )
        .select(
            "o_year",
            "nation_revenue",
            "total_revenue",
            (
                F.round(F.col("nation_revenue") / F.col("total_revenue"), 6)
                + F.lit(0.0)
            ).alias("mkt_share"),
        )
    )


ORACLE_MARKET_SHARE = """
WITH j AS (
    SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
           CASE WHEN sn.n_name = 'NATION_5'
                THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END AS nrev,
           l.l_extendedprice * (1 - l.l_discount) AS rev
    FROM lineitem l
    JOIN part p    ON l.l_partkey = p.p_partkey AND p.p_type = 'STANDARD'
    JOIN orders o  ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
      AND EXISTS (
          SELECT 1 FROM customer c
          JOIN nation cn ON c.c_nationkey = cn.n_nationkey
          JOIN region r  ON cn.n_regionkey = r.r_regionkey
          WHERE c.c_custkey = o.o_custkey AND r.r_name = 'AMERICA'
      )
),
agg AS (
    SELECT o_year,
           CAST(SUM(CAST(ROUND(nrev * 100, 0) AS BIGINT)) AS BIGINT) / 100.0
             AS nation_revenue,
           CAST(SUM(CAST(ROUND(rev * 100, 0) AS BIGINT)) AS BIGINT) / 100.0
             AS total_revenue
    FROM j GROUP BY o_year
)
SELECT o_year, nation_revenue, total_revenue,
       ROUND(nation_revenue / total_revenue, 6) + 0.0 AS mkt_share
FROM agg
"""


# ---------------------------------------------------------------------------
# Q10 shape — returned-item customer ranking (top-N by grouped revenue)
# ---------------------------------------------------------------------------


def q_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 20 customers by revenue lost to returns ('R' lines) on
    1996-Q3 orders — the TPC-H Q10 shape. The return-flag and date
    filters are pushed to both fact scans before the orderkey shuffle;
    customer attributes and the nation name ride in on broadcast
    joins after the group-by keyed on c_custkey. Ties broken on
    c_custkey so the LIMIT is deterministic."""
    t = load_tables(
        spark, sf_dir, ("lineitem", "orders", "customer", "nation")
    )
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_cust = (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(money_sum(rev).alias("revenue"))
    )
    return (
        per_cust.join(
            t["customer"], F.col("o_custkey") == F.col("c_custkey")
        )
        .join(
            F.broadcast(t["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_name", "c_acctbal", "n_name", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


ORACLE_RETURNED_CUSTOMERS = """
SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                     AS BIGINT)) AS BIGINT) / 100.0 AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-07-01'
  AND o.o_orderdate <  TIMESTAMP '1996-10-01'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q12 shape — CASE-count pivot by category (ship-delay priority buckets)
# ---------------------------------------------------------------------------


def q_ship_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per ship-delay bucket, how many lines came from high- vs
    low-priority orders — the TPC-H Q12 CASE-count pivot adapted to
    this schema (no l_shipmode/l_receiptdate; the bucket is
    datediff(shipdate, orderdate)). One orderkey shuffle join, then a
    two-CASE-count aggregate over the derived bucket; the 1996 date
    filter is pushed to the lineitem scan."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    j = li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay <= F.lit(30), "0-30")
        .when(delay <= F.lit(60), "31-60")
        .when(delay <= F.lit(90), "61-90")
        .otherwise("90+")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


ORACLE_SHIP_DELAY_PRIORITY = """
SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 30 THEN '0-30'
            WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 60 THEN '31-60'
            WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 90 THEN '61-90'
            ELSE '90+' END AS delay_bucket,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q4 shape — EXISTS semi-join + grouped count
# ---------------------------------------------------------------------------


def q_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders (in a one-year window) having AT LEAST ONE line item
    shipped more than 90 days after the order date, counted per order
    priority — the TPC-H Q4 EXISTS shape (adapted: the synthetic
    lineitem has no commit/receipt dates, so "late" = shipdate >
    orderdate + 90). The correlated EXISTS decorrelates into one LEFT
    SEMI hash join on the order key; the probe side is pre-filtered so
    only window-eligible orders shuffle."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-01-01"))
    )
    late = t["lineitem"].join(
        o.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey")
    ).filter(
        # timestamp + interval (NOT date_add, which would truncate the
        # timestamp to a date before adding) — mirrors the oracle
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    )
    hit = o.join(
        late.select(F.col("l_orderkey").alias("k")).distinct(),
        o.o_orderkey == F.col("k"),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )


ORACLE_PRIORITY_LATE_ORDERS = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderdate >= DATE '1995-01-01'
  AND o.o_orderdate <  DATE '1996-01-01'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q11 shape — grouped sum HAVING > fraction of a global scalar
# ---------------------------------------------------------------------------


def q_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts earning more than 1.5x the average per-part revenue —
    the TPC-H Q11 "important stock" shape (HAVING SUM(...) > fraction
    × scalar subquery), adapted to lineitem revenue since the
    synthetic schema has no partsupp, with the cut relative to the
    average part so it bites at every scale factor. Decorrelation: the
    global scalar (total cents + part count) is a 1-row aggregate over
    the per-part frame broadcast back onto it — the threshold compare
    is exact integer cents (2·v·n_parts > 3·total), so the cut is
    bit-stable under any partitioning, no double threshold drift."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    per_part = li.groupBy("l_partkey").agg(F.sum(cents).alias("value_cents"))
    total = per_part.agg(
        F.sum("value_cents").alias("total_cents"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        # v > 1.5·total/n_parts <=> 2·v·n_parts > 3·total, exact integers
        .filter(
            F.lit(2) * F.col("value_cents") * F.col("n_parts")
            > F.lit(3) * F.col("total_cents")
        )
        .select(
            "l_partkey",
            (F.col("value_cents").cast("double") / F.lit(100.0)).alias("value"),
            (
                F.col("value_cents").cast("double")
                / F.col("total_cents").cast("double")
                + F.lit(0.0)
            ).alias("revenue_share"),
        )
    )


ORACLE_REVENUE_CONCENTRATION = """
WITH per_part AS (
    SELECT l_partkey,
           SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS value_cents
    FROM lineitem GROUP BY l_partkey
),
tot AS (
    SELECT SUM(value_cents) AS total_cents, COUNT(*) AS n_parts FROM per_part
)
SELECT l_partkey,
       CAST(value_cents AS DOUBLE) / 100.0 AS value,
       CAST(value_cents AS DOUBLE) / CAST(total_cents AS DOUBLE) + 0.0
         AS revenue_share
FROM per_part, tot
WHERE 2 * value_cents * n_parts > 3 * total_cents
"""


#: TPC-H Q6 shape (forecasting revenue change): the pure
#: filter-and-aggregate pattern — every predicate must reach the scan
#: (PushedFilters), and the revenue product is EXACT integer
#: ten-thousandths (price cents × discount cents), so the single-row
#: answer is engine-portable with no rounding anywhere. Shared SQL
#: text: the same string runs on Spark and DuckDB. Completes the
#: Q1–Q22 plan-shape sweep.
SQL_FORECAST_REVENUE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                * CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS BIGINT)
         AS revenue_e4
FROM lineitem
WHERE l_shipdate >= DATE '1995-01-01'
  AND l_shipdate < DATE '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape over the shared SQL text (see
    ``SQL_FORECAST_REVENUE``)."""
    from data_quality_checks_in_relational_database_spark.session import register_views

    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(SQL_FORECAST_REVENUE)
