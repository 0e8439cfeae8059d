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
    EXISTS / NOT-EXISTS chain as hash SEMI + ANTI joins on the order
    key. No correlated per-row execution; three passes over lineitem's
    (orderkey, suppkey, returnflag) projection, all equi-joins."""
    t = load_tables(spark, sf_dir, ("lineitem", "supplier"))
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_returnflag")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    # EXISTS l2: same order, different supplier (any flag)
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    ).distinct().alias("l2")
    # NOT EXISTS l3: same order, different supplier, also returned
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
        .distinct()
        .alias("l3")
    )
    base = l1.select("l_orderkey", "l_suppkey").distinct()
    qualified = (
        base.join(
            l2,
            (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        ).join(
            l3,
            (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
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
