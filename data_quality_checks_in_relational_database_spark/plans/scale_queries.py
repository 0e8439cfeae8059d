"""Round-5 scale-infrastructure queries: data-layout skipping audits,
sketch-accuracy audits, and end-to-end sink roundtrips.

These promote pillars of the 100 TB design from "implemented operator
with unit tests" to first-class oracle-gated queries. The lake-side
additions (``hilbert_skipping``, ``file_balance``, ``merge_upsert``,
``schema_evolution``) follow the same pattern as the original three
below: the Spark side does the REAL physical thing (writes files,
swaps targets, walks curves) while the DuckDB oracle replays only the
deterministic arithmetic that defines the correct answer:

- ``zorder_skipping`` — the Z-order (Morton) clustering key from
  ``operators/layout.py`` measured the way a lakehouse actually
  consumes it: zone-map (per-file min/max) pruning ratios for a 2-D
  range predicate under a Z-ordered layout vs single-column sorted
  layouts (what ``OPTIMIZE ... ZORDER BY`` buys on Delta/Iceberg).
  Extends SURVEY.md §2.8's scan/pushdown theme (reference pushes
  predicates into MySQL by hand, DC:52; at 100 TB the analogous lever
  is which row groups a filter must touch).
- ``minhash_error`` — estimator-quality audit of the MinHash family
  used by the dedup pipeline: signature-estimated Jaccard vs exact
  Jaccard over the verified near-dup candidate pairs, with an
  engine-portable md5 + Carter-Wegman permutation family so a DuckDB
  oracle reproduces every signature bit-for-bit (the ``md5_60``
  SimHash/winnowing trick, narrowed to 32 bits so a·h stays < 2^63).
- ``token_fertility`` — tokens-per-word by detected language: the
  tokenizer-budgeting metric multilingual corpus work tracks (fertility
  ≈ how many subword tokens a whitespace word costs per language).

All aggregates are integer-exact (single final division for the one
ratio), so the differential hashes are partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.functions.scalars import md5_u32, token_count
from data_quality_checks_in_relational_database_spark.operators import dedup as dd
from data_quality_checks_in_relational_database_spark.operators import text as tx
from data_quality_checks_in_relational_database_spark.operators.layout import interleave_bits
from data_quality_checks_in_relational_database_spark.session import load_tables

# ---------------------------------------------------------------------------
# Z-order zone-map skipping audit
# ---------------------------------------------------------------------------

#: Per-dimension bucket resolution (2^8 buckets per dimension; the
#: Z-key is 16 bits, files are its top 8 bits = a 16×16 coarse grid).
_ZBITS = 8
_ZB = 1 << _ZBITS

#: The audited 2-D range predicate, as percentiles of each dimension's
#: [min, max] span: price in [30%, 40%], ship date in [40%, 60%].
_PRED = {"lox": 30, "hix": 40, "loy": 40, "hiy": 60}


def _bucketed_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared audit base: lineitem's (price-cents, shipdate-days)
    bucketed into the 256×256 integer grid plus the audited predicate
    bounds as columns (one bounded global min/max aggregate, broadcast
    back — nothing else shuffles here)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    base = li.select(
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("xc"),
        F.datediff(F.to_date("l_shipdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("yd"),
    ).filter("xc IS NOT NULL AND yd IS NOT NULL")
    stats = base.agg(
        F.min("xc").alias("minx"),
        F.max("xc").alias("maxx"),
        F.min("yd").alias("miny"),
        F.max("yd").alias("maxy"),
    )
    b = base.crossJoin(F.broadcast(stats))
    keyed = b.select(
        "xc",
        "yd",
        F.expr(f"(xc - minx) * {_ZB} DIV (maxx - minx + 1)").alias("xb"),
        F.expr(f"(yd - miny) * {_ZB} DIV (maxy - miny + 1)").alias("yb"),
        F.expr(f"minx + (maxx - minx) * {_PRED['lox']} DIV 100").alias("lox"),
        F.expr(f"minx + (maxx - minx) * {_PRED['hix']} DIV 100").alias("hix"),
        F.expr(f"miny + (maxy - miny) * {_PRED['loy']} DIV 100").alias("loy"),
        F.expr(f"miny + (maxy - miny) * {_PRED['hiy']} DIV 100").alias("hiy"),
    )
    return keyed


def _zonemap_report(keyed: DataFrame, layouts: list[tuple[str, str]]) -> DataFrame:
    """Shared audit tail: build per-file min/max zone maps for both
    dimensions under each (layout, file-id column) assignment and
    report files/rows a 2-D range predicate must touch.

    Rows collapse to the BOUNDED (xb, yb) cell grid first (every
    audited file-id column is a deterministic function of the cell, so
    per-file zone maps / row counts / predicate matches are exact
    re-aggregations of per-cell partials) — the layout explode then
    multiplies ≤ 2¹⁶ cell rows, not the fact table (r8, guide §2.3
    "aggregate before you shuffle": previously 3·|lineitem| exploded
    rows fed the zone shuffle's partial aggregation; now one
    map-side-combined cell collapse feeds a ≤ 3·2¹⁶-row explode)."""
    cell_keys = list(dict.fromkeys(["xb", "yb"] + [col for _, col in layouts]))
    cells = keyed.groupBy(*cell_keys).agg(
        F.count(F.lit(1)).alias("c_rows"),
        F.min("xc").alias("c_min_x"),
        F.max("xc").alias("c_max_x"),
        F.min("yd").alias("c_min_y"),
        F.max("yd").alias("c_max_y"),
        # predicate bounds are globals (identical on every row) — carry
        # them through the agg instead of re-joining the stats row
        F.min("lox").alias("lox"),
        F.min("hix").alias("hix"),
        F.min("loy").alias("loy"),
        F.min("hiy").alias("hiy"),
        F.sum(
            F.when(
                F.col("xc").between(F.col("lox"), F.col("hix"))
                & F.col("yd").between(F.col("loy"), F.col("hiy")),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("c_match"),
    )
    lay = cells.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("layout"), F.col(col).alias("file_id")
                    )
                    for name, col in layouts
                ]
            )
        ).alias("lf"),
        "c_rows",
        "c_min_x",
        "c_max_x",
        "c_min_y",
        "c_max_y",
        "c_match",
        "lox",
        "hix",
        "loy",
        "hiy",
    )
    zone = lay.groupBy(
        F.col("lf.layout").alias("layout"), F.col("lf.file_id").alias("file_id")
    ).agg(
        F.sum("c_rows").alias("n_rows"),
        F.min("c_min_x").alias("min_x"),
        F.max("c_max_x").alias("max_x"),
        F.min("c_min_y").alias("min_y"),
        F.max("c_max_y").alias("max_y"),
        F.min("lox").alias("lox"),
        F.min("hix").alias("hix"),
        F.min("loy").alias("loy"),
        F.min("hiy").alias("hiy"),
        F.sum("c_match").alias("n_match"),
    )
    touched = (
        (F.col("max_x") >= F.col("lox"))
        & (F.col("min_x") <= F.col("hix"))
        & (F.col("max_y") >= F.col("loy"))
        & (F.col("min_y") <= F.col("hiy"))
    )
    return (
        zone.groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(F.when(touched, F.lit(1)).otherwise(F.lit(0))).alias("files_touched"),
            F.sum(F.when(touched, F.col("n_rows")).otherwise(F.lit(0))).alias("rows_touched"),
            F.sum("n_match").alias("rows_matched"),
        )
    )


def q_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map pruning audit: Z-order vs single-column sorted layouts.

    Buckets ``l_extendedprice`` (integer cents) and ``l_shipdate``
    (days since epoch) into 256 equal-width buckets each (integer
    arithmetic only), assigns every row to a "file" under three
    layouts — ``zorder`` (top 8 bits of the interleaved Morton key: a
    16×16 coarse grid), ``price_sort`` (price bucket), ``date_sort``
    (date bucket) — computes per-file min/max zone maps for BOTH
    dimensions, and reports, per layout, how many files and rows a
    2-D range predicate must touch. ``rows_matched`` (identical across
    layouts) is the true selectivity floor.

    Scale shape: one bounded global min/max aggregate broadcast back,
    then a single map-side-combined shuffle into ≤ 3·256 zone-map
    groups — the audit never materializes pairs or sorts globally. At
    real scale the same plan runs on parquet row-group stats instead of
    recomputing from rows.
    """
    keyed = _bucketed_lineitem(spark, sf_dir).withColumn(
        "zfile", F.shiftright(interleave_bits(["xb", "yb"], bits=_ZBITS), _ZBITS)
    )
    return _zonemap_report(
        keyed, [("zorder", "zfile"), ("price_sort", "xb"), ("date_sort", "yb")]
    )


#: Row-balanced file count for the curve-packing audit.
_HNF = 64


def q_hilbert_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map pruning audit #2: Hilbert-curve clustering vs Z-order
    under ROW-BALANCED file packing on the identical 256×256 grid and
    2-D range predicate.

    Files here are what a lakehouse compaction job actually writes:
    sort by the curve key, cut every ``total_rows/64`` rows — NOT
    aligned power-of-4 cell blocks (under aligned blocks the two
    curves are provably identical, since every level-k Hilbert OR
    Morton block is the same axis-aligned square). Row-balanced cuts
    land at arbitrary curve positions, and that is where the curves
    diverge: a Morton segment that straddles a quadrant seam jumps
    across the grid, blowing up its file's min/max zone map, while a
    Hilbert segment stays contiguous. ``files_touched`` /
    ``rows_touched`` for the audited 2-D box quantify exactly that —
    the measured basis for choosing Hilbert (Delta liquid clustering,
    Iceberg hilbert ordering) over classic ZORDER at 100 TB.

    Scale shape: rows collapse to ≤ 2^16 grid cells first (one
    map-side-combined shuffle); the Hilbert position joins in from a
    65,536-row broadcast lookup (:func:`operators.layout.hilbert_lookup`
    — precompute the curve once; never inline the 8-level bit shuffle
    into row expressions); the running row total along each curve uses
    the two-phase :func:`operators.cumulative.bucketed_cumulative`
    (no unpartitioned window even over the bounded cell table).
    """
    from data_quality_checks_in_relational_database_spark.operators.cumulative import (
        bucketed_cumulative,
    )
    from data_quality_checks_in_relational_database_spark.operators.layout import hilbert_lookup

    keyed = _bucketed_lineitem(spark, sf_dir)
    cells = keyed.groupBy("xb", "yb").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("xc").alias("min_x"),
        F.max("xc").alias("max_x"),
        F.min("yd").alias("min_y"),
        F.max("yd").alias("max_y"),
        F.min("lox").alias("lox"),
        F.min("hix").alias("hix"),
        F.min("loy").alias("loy"),
        F.min("hiy").alias("hiy"),
        F.sum(
            F.when(
                F.col("xc").between(F.col("lox"), F.col("hix"))
                & F.col("yd").between(F.col("loy"), F.col("hiy")),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("n_match"),
    )
    lut = hilbert_lookup(spark, bits=_ZBITS)
    cells = (
        cells.join(
            F.broadcast(lut),
            (cells["xb"] == lut["hx"]) & (cells["yb"] == lut["hy"]),
            "inner",  # lut covers the full grid: never drops cells
        )
        .drop("hx", "hy")
        .withColumn("zd", interleave_bits(["xb", "yb"], bits=_ZBITS))
        .localCheckpoint()  # reused by both layout branches below
    )

    def packed(pos_col: str, layout: str) -> DataFrame:
        cum = bucketed_cumulative(cells, pos_col, ["n_rows"], num_buckets=16)
        filed = cum.withColumn(
            "file_id",
            F.expr(f"(cum_n_rows - n_rows) * {_HNF} DIV n_n_rows"),
        )
        return filed.groupBy("file_id").agg(
            F.sum("n_rows").alias("n_rows"),
            F.min("min_x").alias("min_x"),
            F.max("max_x").alias("max_x"),
            F.min("min_y").alias("min_y"),
            F.max("max_y").alias("max_y"),
            F.min("lox").alias("lox"),
            F.min("hix").alias("hix"),
            F.min("loy").alias("loy"),
            F.min("hiy").alias("hiy"),
            F.sum("n_match").alias("n_match"),
        ).withColumn("layout", F.lit(layout))

    zone = packed("hd", "hilbert").unionByName(packed("zd", "zorder"))
    touched = (
        (F.col("max_x") >= F.col("lox"))
        & (F.col("min_x") <= F.col("hix"))
        & (F.col("max_y") >= F.col("loy"))
        & (F.col("min_y") <= F.col("hiy"))
    )
    return zone.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(F.when(touched, F.lit(1)).otherwise(F.lit(0))).alias("files_touched"),
        F.sum(F.when(touched, F.col("n_rows")).otherwise(F.lit(0))).alias("rows_touched"),
        F.sum("n_match").alias("rows_matched"),
    )


def _interleave_sql(xcol: str, ycol: str, bits: int) -> str:
    """DuckDB twin of ``operators.layout.interleave_bits`` for 2
    columns (x in the least-significant lane)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({xcol} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ycol} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def _oracle_zorder_skipping() -> str:
    return f"""
WITH base AS (
    SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS xc,
           CAST(datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS yd
    FROM lineitem
    WHERE l_extendedprice IS NOT NULL AND l_shipdate IS NOT NULL
),
stats AS (
    SELECT MIN(xc) AS minx, MAX(xc) AS maxx, MIN(yd) AS miny, MAX(yd) AS maxy FROM base
),
k AS (
    SELECT xc, yd,
           (xc - minx) * {_ZB} // (maxx - minx + 1) AS xb,
           (yd - miny) * {_ZB} // (maxy - miny + 1) AS yb,
           minx + (maxx - minx) * {_PRED['lox']} // 100 AS lox,
           minx + (maxx - minx) * {_PRED['hix']} // 100 AS hix,
           miny + (maxy - miny) * {_PRED['loy']} // 100 AS loy,
           miny + (maxy - miny) * {_PRED['hiy']} // 100 AS hiy
    FROM base, stats
),
z AS (
    SELECT *, ({_interleave_sql('xb', 'yb', _ZBITS)}) >> {_ZBITS} AS zfile FROM k
),
lay AS (
    SELECT 'zorder' AS layout, zfile AS file_id, xc, yd, lox, hix, loy, hiy FROM z
    UNION ALL
    SELECT 'price_sort', xb, xc, yd, lox, hix, loy, hiy FROM z
    UNION ALL
    SELECT 'date_sort', yb, xc, yd, lox, hix, loy, hiy FROM z
),
zone AS (
    SELECT layout, file_id, COUNT(*) AS n_rows,
           MIN(xc) AS min_x, MAX(xc) AS max_x, MIN(yd) AS min_y, MAX(yd) AS max_y,
           MIN(lox) AS lox, MIN(hix) AS hix, MIN(loy) AS loy, MIN(hiy) AS hiy,
           SUM(CASE WHEN xc BETWEEN lox AND hix AND yd BETWEEN loy AND hiy
                    THEN 1 ELSE 0 END) AS n_match
    FROM lay GROUP BY layout, file_id
)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(CASE WHEN max_x >= lox AND min_x <= hix AND max_y >= loy AND min_y <= hiy
                     THEN 1 ELSE 0 END) AS BIGINT) AS files_touched,
       CAST(SUM(CASE WHEN max_x >= lox AND min_x <= hix AND max_y >= loy AND min_y <= hiy
                     THEN n_rows ELSE 0 END) AS BIGINT) AS rows_touched,
       CAST(SUM(n_match) AS BIGINT) AS rows_matched
FROM zone GROUP BY layout
"""


ORACLE_ZORDER_SKIPPING = _oracle_zorder_skipping()


def _hilbert_grid_sql(bits: int) -> str:
    """Chained-CTE DuckDB twin of ``operators.layout.hilbert_xy2d``
    over the full 2^bits × 2^bits grid: one CTE per curve level (the
    loop body rotates/reflects (gx, gy) and folds the quadrant index
    into hd — every expression reads the PREVIOUS level's columns,
    which is exactly SQL SELECT semantics)."""
    ctes = [
        f"g{bits} AS (SELECT tx.x AS xb, ty.y AS yb, tx.x AS gx, ty.y AS gy,"
        f" 0 AS hd FROM range({1 << bits}) tx(x), range({1 << bits}) ty(y))"
    ]
    for lvl in range(bits - 1, -1, -1):
        s = 1 << lvl
        rx = f"CASE WHEN (gx & {s}) > 0 THEN 1 ELSE 0 END"
        ry = f"CASE WHEN (gy & {s}) > 0 THEN 1 ELSE 0 END"
        ctes.append(
            f"""g{lvl} AS (
    SELECT xb, yb,
           CASE WHEN (gy & {s}) > 0 THEN gx
                WHEN (gx & {s}) > 0 THEN {s - 1} - gy ELSE gy END AS gx,
           CASE WHEN (gy & {s}) > 0 THEN gy
                WHEN (gx & {s}) > 0 THEN {s - 1} - gx ELSE gx END AS gy,
           hd + {s * s} * xor(3 * ({rx}), {ry}) AS hd
    FROM g{lvl + 1}
)"""
        )
    return ",\n".join(ctes)


def _oracle_hilbert_skipping() -> str:
    return f"""
WITH base AS (
    SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS xc,
           CAST(datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS yd
    FROM lineitem
    WHERE l_extendedprice IS NOT NULL AND l_shipdate IS NOT NULL
),
stats AS (
    SELECT MIN(xc) AS minx, MAX(xc) AS maxx, MIN(yd) AS miny, MAX(yd) AS maxy FROM base
),
k AS (
    SELECT xc, yd,
           (xc - minx) * {_ZB} // (maxx - minx + 1) AS xb,
           (yd - miny) * {_ZB} // (maxy - miny + 1) AS yb,
           minx + (maxx - minx) * {_PRED['lox']} // 100 AS lox,
           minx + (maxx - minx) * {_PRED['hix']} // 100 AS hix,
           miny + (maxy - miny) * {_PRED['loy']} // 100 AS loy,
           miny + (maxy - miny) * {_PRED['hiy']} // 100 AS hiy
    FROM base, stats
),
{_hilbert_grid_sql(_ZBITS)},
cells AS (
    SELECT xb, yb, COUNT(*) AS n_rows,
           MIN(xc) AS min_x, MAX(xc) AS max_x, MIN(yd) AS min_y, MAX(yd) AS max_y,
           MIN(lox) AS lox, MIN(hix) AS hix, MIN(loy) AS loy, MIN(hiy) AS hiy,
           SUM(CASE WHEN xc BETWEEN lox AND hix AND yd BETWEEN loy AND hiy
                    THEN 1 ELSE 0 END) AS n_match
    FROM k GROUP BY xb, yb
),
pos AS (
    SELECT c.*, g.hd,
           ({_interleave_sql('xb', 'yb', _ZBITS)}) AS zd
    FROM cells c JOIN g0 g USING (xb, yb)
),
lay AS (
    SELECT 'hilbert' AS layout,
           (SUM(n_rows) OVER (ORDER BY hd ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) - n_rows)
           * {_HNF} // (SUM(n_rows) OVER ()) AS file_id,
           *
    FROM pos
    UNION ALL
    SELECT 'zorder',
           (SUM(n_rows) OVER (ORDER BY zd ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) - n_rows)
           * {_HNF} // (SUM(n_rows) OVER ()) AS file_id,
           *
    FROM pos
),
zone AS (
    SELECT layout, file_id, SUM(n_rows) AS n_rows,
           MIN(min_x) AS min_x, MAX(max_x) AS max_x,
           MIN(min_y) AS min_y, MAX(max_y) AS max_y,
           MIN(lox) AS lox, MIN(hix) AS hix, MIN(loy) AS loy, MIN(hiy) AS hiy,
           SUM(n_match) AS n_match
    FROM lay GROUP BY layout, file_id
)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(CASE WHEN max_x >= lox AND min_x <= hix AND max_y >= loy AND min_y <= hiy
                     THEN 1 ELSE 0 END) AS BIGINT) AS files_touched,
       CAST(SUM(CASE WHEN max_x >= lox AND min_x <= hix AND max_y >= loy AND min_y <= hiy
                     THEN n_rows ELSE 0 END) AS BIGINT) AS rows_touched,
       CAST(SUM(n_match) AS BIGINT) AS rows_matched
FROM zone GROUP BY layout
"""


ORACLE_HILBERT_SKIPPING = _oracle_hilbert_skipping()


# ---------------------------------------------------------------------------
# Sink → layout → audit roundtrip: file-balance report on a written lake
# ---------------------------------------------------------------------------

#: Bucket count for the written dataset (one parquet file per bucket).
_FB_BUCKETS = 16


def q_file_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files / file-skew audit exercised END-TO-END: write
    lineitem as a REAL bucket-partitioned parquet dataset (16 md5
    buckets over the (orderkey, linenumber) row key; ``repartition``
    by bucket ⇒ exactly one file per bucket directory), read it back,
    and report :func:`operators.observe.file_balance_report`'s
    shape over the ACTUAL files via ``input_file_name()``.

    What it gates: the write path (partitioned sink), the read-back
    (partition discovery), and the audit (per-file row counting) in
    one roundtrip — the monitor a 100 TB lake runs after every
    compaction. The md5 bucket makes every per-file row count
    oracle-replayable; skew is reported as the integer
    ``skew_permille`` (= 1000·max/avg, floored) so the differential
    stays FP-free.
    """
    import tempfile

    from data_quality_checks_in_relational_database_spark.operators.observe import (
        file_balance_report,
    )

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    bucket = F.pmod(
        md5_u32(F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))),
        F.lit(_FB_BUCKETS),
    )
    out_dir = tempfile.mkdtemp(prefix="spark_dq_file_balance_")
    (
        li.withColumn("b", bucket)
        .repartition(_FB_BUCKETS, "b")
        .write.mode("overwrite")
        .partitionBy("b")
        .parquet(out_dir)
    )
    rep = file_balance_report(spark, out_dir)
    return rep.select(
        "n_files",
        "n_rows",
        "min_rows",
        "max_rows",
        F.expr(f"max_rows * {_FB_BUCKETS} * 1000 DIV n_rows").alias("skew_permille"),
    )


# ---------------------------------------------------------------------------
# MERGE/upsert sink roundtrip + schema-evolution read
# ---------------------------------------------------------------------------


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed MERGE (upsert) gated END-TO-END: seed a parquet target
    from orders, apply a deterministic CDC batch (every orderkey
    divisible by 5 updated: status→'U', +1000 cents, epoch 1; every
    key ≡ 3 mod 7 inserted under the negated key), run
    :func:`sources.sinks.merge_upsert` (anti-join rewrite +
    write-then-swap — the Delta/Iceberg ``MERGE INTO`` semantic
    contract on plain parquet), read the swapped target back, and emit
    integer checksums over the merged state. The oracle replays the
    merge SEMANTICS (kept ∪ updated ∪ inserted) without ever touching
    files, so a wrong anti-join, a lost carry-row, or a double-applied
    update hash-mismatches. Temp target lives for the query's lifetime
    (the returned frame reads it lazily)."""
    import tempfile

    from data_quality_checks_in_relational_database_spark.sources.sinks import merge_upsert

    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    base = o.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        F.lit(0).cast("long").alias("epoch"),
    )
    target = tempfile.mkdtemp(prefix="spark_dq_merge_") + "/target"
    base.write.mode("overwrite").parquet(target)
    updates = base.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        F.lit("U").alias("status"),
        (F.col("cents") + F.lit(1000)).alias("cents"),
        F.lit(1).cast("long").alias("epoch"),
    )
    inserts = base.filter(F.col("o_orderkey") % 7 == 3).select(
        (-F.col("o_orderkey")).alias("o_orderkey"),
        F.lit("I").alias("status"),
        F.col("cents").alias("cents"),
        F.lit(1).cast("long").alias("epoch"),
    )
    merge_upsert(spark, target, updates.unionByName(inserts), ["o_orderkey"])
    final = spark.read.parquet(target)
    return final.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("epoch") == 1).cast("long")).alias("n_changed"),
        F.sum((F.col("o_orderkey") < 0).cast("long")).alias("n_inserted"),
        F.sum((F.col("status") == "U").cast("long")).alias("n_updated"),
        F.sum("cents").alias("sum_cents"),
        F.sum("o_orderkey").alias("key_checksum"),
    )


ORACLE_MERGE_UPSERT = """
WITH base AS (
    SELECT o_orderkey, o_orderstatus AS status,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
merged AS (
    SELECT o_orderkey, status, cents, 0 AS epoch
    FROM base WHERE o_orderkey % 5 <> 0
    UNION ALL
    SELECT o_orderkey, 'U', cents + 1000, 1 FROM base WHERE o_orderkey % 5 = 0
    UNION ALL
    SELECT -o_orderkey, 'I', cents, 1 FROM base WHERE o_orderkey % 7 = 3
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN epoch = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       CAST(SUM(CASE WHEN o_orderkey < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted,
       CAST(SUM(CASE WHEN status = 'U' THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
FROM merged
"""


def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read gate: two parquet epochs of the same
    table written with DIFFERENT schemas (epoch 0: key+cents; epoch 1
    adds a status column), read back with ``mergeSchema`` — the
    append-only lake pattern when a producer adds a column mid-stream.
    The report pins the semantics that matter: old rows surface the
    new column as NULL (never a default, never an error) and no row or
    value is lost across the union. All-integer checksums."""
    import tempfile

    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    base = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        F.col("o_orderstatus").alias("status"),
    )
    root = tempfile.mkdtemp(prefix="spark_dq_schemaevo_")
    base.filter(F.col("o_orderkey") % 2 == 0).drop("status").write.mode(
        "overwrite"
    ).parquet(root + "/epoch=0")
    base.filter(F.col("o_orderkey") % 2 == 1).write.mode("overwrite").parquet(
        root + "/epoch=1"
    )
    merged = spark.read.option("mergeSchema", "true").option(
        "basePath", root
    ).parquet(root + "/epoch=0", root + "/epoch=1")
    # partition-discovered epoch is int32; cast so both engines emit BIGINT
    return merged.groupBy(F.col("epoch").cast("long").alias("epoch")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("status").isNull().cast("long")).alias("n_null_status"),
        F.count_distinct("status").cast("long").alias("n_statuses"),
        F.sum("cents").alias("sum_cents"),
        F.sum("o_orderkey").alias("key_checksum"),
    )


ORACLE_SCHEMA_EVOLUTION = """
WITH base AS (
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           o_orderstatus AS status
    FROM orders
),
merged AS (
    SELECT 0 AS epoch, o_orderkey, cents, NULL AS status
    FROM base WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT 1, o_orderkey, cents, status FROM base WHERE o_orderkey % 2 = 1
)
SELECT CAST(epoch AS BIGINT) AS epoch,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN status IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_status,
       CAST(COUNT(DISTINCT status) AS BIGINT) AS n_statuses,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
FROM merged GROUP BY epoch
"""


ORACLE_FILE_BALANCE = f"""
WITH per AS (
    SELECT CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '-' ||
                                  CAST(l_linenumber AS VARCHAR)), 1, 8) AS BIGINT)
           % {_FB_BUCKETS} AS b,
           COUNT(*) AS c
    FROM lineitem GROUP BY b
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       CAST(MIN(c) AS BIGINT) AS min_rows,
       CAST(MAX(c) AS BIGINT) AS max_rows,
       CAST(MAX(c) * {_FB_BUCKETS} * 1000 // SUM(c) AS BIGINT) AS skew_permille
FROM per
"""


# ---------------------------------------------------------------------------
# MinHash estimator-accuracy audit (engine-portable hash family)
# ---------------------------------------------------------------------------

#: Mersenne prime 2^31 - 1: coefficients and reduced hashes both stay
#: under 2^31, so a·h + b < 2^62 + 2^31 never overflows signed 64-bit
#: in either engine.
_MH_P = 2_147_483_647

#: Carter-Wegman permutation coefficients (a_k, b_k), fixed literals so
#: the Spark plan and the DuckDB oracle share them verbatim. Knuth
#: multiplicative-hash spacing; a_k reduced into [1, P), b_k into [0, P).
_MH_PERMS: list[tuple[int, int]] = [
    (
        (2_654_435_761 * (k + 1)) % _MH_P or 1,
        (40_503 * (k + 1) * 2_654_435_761 + 97) % _MH_P,
    )
    for k in range(16)
]
_MH_K = len(_MH_PERMS)


def q_minhash_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator-quality audit over the verified near-dup pairs.

    For every exact candidate pair (3-gram Jaccard ≥ 0.5, the corpus's
    registered near-dup definition), compare the K=16-permutation
    MinHash estimate ``matches/K`` against the exact Jaccard
    ``sh/union`` — reported as integer-scaled error
    ``|matches·union − K·sh|`` so the differential hash is exact (the
    one double, ``mean_scaled_err``, is a single division of two exact
    longs). The hash family is engine-portable: md5-low-32 reduced mod
    P=2^31−1, permuted by fixed Carter-Wegman coefficients — the same
    oracle-portability trick as the ``md5_60`` SimHash, narrowed so
    a·h stays < 2^63.

    What it buys at 100 TB: the banded-LSH dedup path's recall pins run
    at test scale; THIS query audits the estimator itself on live data,
    so a drifting corpus (longer docs, skewed shingle frequencies) that
    degrades signature accuracy shows up as a rising error row in the
    standing report — before recall silently decays.

    Scale shape: signatures are one map-side-combined groupBy over the
    exploded shingles (K mins per doc); the audit join touches only the
    bounded verified-pair set.
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    from pyspark import StorageLevel

    sets_ = dd.shingle_sets(docs).persist(StorageLevel.MEMORY_AND_DISK)
    ex = sets_.select("doc_id", F.explode("shingles").alias("s"))
    hp = F.pmod(md5_u32(F.col("s")), F.lit(_MH_P))
    sig = ex.groupBy("doc_id").agg(
        *[
            F.min(F.pmod(F.lit(a) * hp + F.lit(b), F.lit(_MH_P))).alias(f"m{k}")
            for k, (a, b) in enumerate(_MH_PERMS)
        ]
    )
    pairs = dd.ngram_jaccard_pairs(docs, threshold=0.5).select("doc_id_a", "doc_id_b")
    sa = sets_.select(F.col("doc_id").alias("doc_id_a"), F.col("shingles").alias("sh_a"))
    sb = sets_.select(F.col("doc_id").alias("doc_id_b"), F.col("shingles").alias("sh_b"))
    exact = (
        pairs.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("sh_n"),
            (F.size("sh_a") + F.size("sh_b") - F.size(F.array_intersect("sh_a", "sh_b")))
            .cast("long")
            .alias("un"),
        )
    )
    ga = sig.select(F.col("doc_id").alias("doc_id_a"), *[F.col(f"m{k}").alias(f"a{k}") for k in range(_MH_K)])
    gb = sig.select(F.col("doc_id").alias("doc_id_b"), *[F.col(f"m{k}").alias(f"b{k}") for k in range(_MH_K)])
    matches = None
    for k in range(_MH_K):
        term = F.when(F.col(f"a{k}") == F.col(f"b{k}"), F.lit(1)).otherwise(F.lit(0))
        matches = term if matches is None else matches + term
    per = (
        exact.join(ga, "doc_id_a")
        .join(gb, "doc_id_b")
        .select(
            matches.cast("long").alias("matches"),
            "sh_n",
            "un",
        )
        .select(
            "matches",
            F.abs(F.col("matches") * F.col("un") - F.lit(_MH_K) * F.col("sh_n")).alias("serr"),
        )
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.lit(_MH_K).cast("long").alias("k_perm"),
        F.sum("matches").alias("sum_matches"),
        F.sum("serr").alias("sum_scaled_err"),
        F.max("serr").alias("max_scaled_err"),
        (F.sum("serr") / F.count(F.lit(1))).alias("mean_scaled_err"),
    )


def _oracle_minhash_error() -> str:
    mins = ",\n           ".join(
        f"MIN(({a} * hp + {b}) % {_MH_P}) AS m{k}" for k, (a, b) in enumerate(_MH_PERMS)
    )
    match_sum = " + ".join(
        f"CASE WHEN sa.m{k} = sb.m{k} THEN 1 ELSE 0 END" for k in range(_MH_K)
    )
    return f"""
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
    FROM documents WHERE length(trim(text)) > 0
),
sh AS (
    SELECT doc_id,
           list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS s
    FROM toks WHERE len(t) >= 3
),
ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
h AS (
    SELECT doc_id, CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) % {_MH_P} AS hp FROM ex
),
sig AS (
    SELECT doc_id,
           {mins}
    FROM h GROUP BY doc_id
),
pairs AS (
    SELECT doc_id_a, doc_id_b, sh_n, un FROM (
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               len(list_intersect(a.s, b.s)) AS sh_n,
               len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS un,
               len(list_intersect(a.s, b.s)) / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    ) WHERE jaccard >= 0.5
),
per AS (
    SELECT ({match_sum}) AS matches, p.sh_n, p.un
    FROM pairs p
    JOIN sig sa ON sa.doc_id = p.doc_id_a
    JOIN sig sb ON sb.doc_id = p.doc_id_b
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST({_MH_K} AS BIGINT) AS k_perm,
       CAST(SUM(matches) AS BIGINT) AS sum_matches,
       CAST(SUM(ABS(matches * un - {_MH_K} * sh_n)) AS BIGINT) AS sum_scaled_err,
       CAST(MAX(ABS(matches * un - {_MH_K} * sh_n)) AS BIGINT) AS max_scaled_err,
       CAST(SUM(ABS(matches * un - {_MH_K} * sh_n)) AS DOUBLE) / COUNT(*) AS mean_scaled_err
FROM per
"""


ORACLE_MINHASH_ERROR = _oracle_minhash_error()


# ---------------------------------------------------------------------------
# Tokenizer fertility by detected language
# ---------------------------------------------------------------------------


def q_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens-per-word ("fertility") by detected language.

    Fertility — BPE-ish subword tokens per whitespace word — is the
    standard tokenizer-budgeting metric for multilingual corpora: a
    language whose fertility is 2× pays 2× the context window per word.
    Composes the marker-vote language ID with the two token counters;
    all sums are integers, fertility is the single final division.
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    per = tx.detect_language(docs).select(
        "detected_lang",
        F.coalesce(token_count("text"), F.lit(0)).alias("w"),
        F.coalesce(tx.bpe_token_count("text"), F.lit(0)).alias("bpe"),
    )
    g = per.groupBy("detected_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("w").alias("ws_words"),
        F.sum("bpe").alias("bpe_tokens"),
    )
    return g.select(
        "detected_lang",
        "n_docs",
        "ws_words",
        "bpe_tokens",
        F.when(F.col("ws_words") > 0, F.col("bpe_tokens") / F.col("ws_words")).alias(
            "fertility"
        ),
    )


def _oracle_token_fertility() -> str:
    langs = sorted(tx.LANG_MARKERS)
    toks = "CASE WHEN length(trim(text)) = 0 THEN [] ELSE string_split_regex(trim(lower(text)), '\\s+') END"
    score_cols = ",\n           ".join(
        f"len(list_filter({toks}, x -> x IN ({', '.join(repr(w) for w in tx.LANG_MARKERS[lang])}))) AS s_{lang}"
        for lang in langs
    )
    total = " + ".join(f"s_{lang}" for lang in langs)
    branches = "\n            ".join(
        f"WHEN {' AND '.join(f's_{lang} >= s_{other}' for other in langs if other != lang)} THEN '{lang}'"
        for lang in langs
    )
    # standard SQL single-quoted strings do NOT process backslash
    # escapes — embed the pattern verbatim (it contains no quotes)
    bpe_re = tx.BPE_TOKEN_PATTERN
    return f"""
WITH scores AS (
    SELECT text,
           {score_cols}
    FROM documents
),
d AS (
    SELECT text,
           CASE WHEN {total} = 0 THEN 'und'
            {branches}
           END AS detected_lang
    FROM scores
),
per AS (
    SELECT detected_lang,
           CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+')) END AS w,
           CASE WHEN text IS NULL THEN 0
                ELSE len(regexp_extract_all(text, '{bpe_re}')) END AS bpe
    FROM d
)
SELECT detected_lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(w) AS BIGINT) AS ws_words,
       CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
       CASE WHEN SUM(w) > 0 THEN CAST(SUM(bpe) AS BIGINT) / CAST(SUM(w) AS BIGINT) END AS fertility
FROM per GROUP BY detected_lang
"""


ORACLE_TOKEN_FERTILITY = _oracle_token_fertility()


# ---------------------------------------------------------------------------
# Bloom-filter file skipping audit (point lookups vs zone maps)
# ---------------------------------------------------------------------------

#: Bloom geometry: m bits per file, k hash probes per key. With ~10k
#: distinct keys per file at sf0.1, m = 2^17 / k = 2 gives FPR
#: (1 − e^(−kn/m))^k ≈ 2% — the audit's interesting regime: a handful
#: of false-positive files, never a miss.
_BLOOM_FILES = 64
_BLOOM_M = 1 << 17
_BLOOM_K = 2
_BLOOM_PROBES = 25


def _bloom_pos(key_col, j: int):
    """Engine-portable bloom bit position j for a key: md5-low-32 of
    ``key#j`` mod m (DuckDB twin: CAST('0x'||substr(md5(k||'#j'),1,8)
    AS BIGINT) % m)."""
    return F.pmod(
        md5_u32(F.concat_ws("#", key_col, F.lit(j))), F.lit(_BLOOM_M)
    )


def q_bloom_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-skipping audit #3: per-file BLOOM filters vs min/max zone
    maps for POINT lookups on a column the file layout is NOT sorted
    by. Files are date-bucketed (the layout a time-partitioned lake
    actually has), probes are ``l_orderkey`` equality lookups — every
    file's orderkey [min, max] spans nearly the whole domain, so zone
    maps prune ~nothing, while each file's bloom admits only its own
    keys plus an FPR-bounded handful of false positives. This is the
    measured basis for parquet column bloom filters / Delta-style
    bloom indexes on high-cardinality lookup columns at 100 TB: zone
    maps answer RANGE pruning (the two curve audits above), blooms
    answer POINT pruning, and neither subsumes the other.

    Per probe key (a deterministic 25-point grid over the orderkey
    domain — both present and absent keys occur): files that actually
    hold it, files a zone map must touch, files the bloom touches, and
    the bloom's false-positive file count. No false negatives by
    construction — asserted in pytest, visible to the oracle as
    ``files_bloom ≥ files_actual`` row-by-row.

    Scale shape: one bounded min/max aggregate broadcast back; bloom
    construction is one map-side explode to (file, bit) pairs and a
    distinct — ≤ k·|distinct keys| rows of two small ints, the same
    thing a writer would persist as file metadata; every probe-side
    frame (25 keys, 50 positions, 64 files) is broadcast-sized. The
    md5 bit positions make the whole filter oracle-replayable.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    rows = li.select(
        F.col("l_orderkey").alias("k"),
        F.datediff(F.col("l_shipdate"), F.lit("1970-01-01")).alias("d"),
    )
    stats = rows.agg(
        F.min("d").alias("dmin"), F.max("d").alias("dmax"),
        F.min("k").alias("omin"), F.max("k").alias("omax"),
    )
    filed = rows.crossJoin(F.broadcast(stats)).select(
        "k",
        F.expr(
            f"(d - dmin) * {_BLOOM_FILES} DIV (dmax - dmin + 1)"
        ).alias("f"),
    )
    zones = filed.groupBy("f").agg(
        F.min("k").alias("kmin"), F.max("k").alias("kmax")
    )
    bits = (
        filed.select(
            "f",
            F.explode(
                F.array(*[_bloom_pos(F.col("k"), j) for j in range(_BLOOM_K)])
            ).alias("pos"),
        )
        .distinct()
    )
    probes = (
        spark.range(_BLOOM_PROBES)
        .crossJoin(F.broadcast(stats))
        .select(
            F.expr(
                f"omin + id * (omax - omin) DIV {_BLOOM_PROBES - 1}"
            ).alias("probe_key")
        )
        .dropDuplicates(["probe_key"])
    )
    actual = (
        filed.join(F.broadcast(probes), filed["k"] == probes["probe_key"])
        .select("probe_key", "f")
        .distinct()
        .groupBy("probe_key")
        .agg(F.count(F.lit(1)).alias("files_actual"))
    )
    zone_touch = (
        probes.crossJoin(F.broadcast(zones))
        .where((F.col("probe_key") >= F.col("kmin")) & (F.col("probe_key") <= F.col("kmax")))
        .groupBy("probe_key")
        .agg(F.count(F.lit(1)).alias("files_zone"))
    )
    ppos = probes.select(
        "probe_key",
        F.explode(
            F.array(*[_bloom_pos(F.col("probe_key"), j) for j in range(_BLOOM_K)])
        ).alias("pos"),
    ).distinct()
    npos = ppos.groupBy("probe_key").agg(F.count(F.lit(1)).alias("np"))
    # a file claims the key iff EVERY distinct probe position is set
    bloom_touch = (
        bits.join(F.broadcast(ppos), "pos")
        .groupBy("probe_key", "f")
        .agg(F.countDistinct("pos").alias("hits"))
        .join(F.broadcast(npos), "probe_key")
        .where(F.col("hits") == F.col("np"))
        .groupBy("probe_key")
        .agg(F.count(F.lit(1)).alias("files_bloom"))
    )
    return (
        probes.join(actual, "probe_key", "left")
        .join(zone_touch, "probe_key", "left")
        .join(bloom_touch, "probe_key", "left")
        .select(
            "probe_key",
            F.coalesce("files_actual", F.lit(0)).cast("long").alias("files_actual"),
            F.coalesce("files_zone", F.lit(0)).cast("long").alias("files_zone"),
            F.coalesce("files_bloom", F.lit(0)).cast("long").alias("files_bloom"),
            (
                F.coalesce("files_bloom", F.lit(0))
                - F.coalesce("files_actual", F.lit(0))
            ).cast("long").alias("bloom_fp_files"),
        )
    )


ORACLE_BLOOM_SKIPPING = f"""
WITH rows_ AS (
    SELECT l_orderkey AS k,
           datediff('day', DATE '1970-01-01', l_shipdate) AS d
    FROM lineitem
),
stats AS (
    SELECT MIN(d) AS dmin, MAX(d) AS dmax, MIN(k) AS omin, MAX(k) AS omax
    FROM rows_
),
filed AS (
    SELECT k, (d - stats.dmin) * {_BLOOM_FILES} // (stats.dmax - stats.dmin + 1) AS f
    FROM rows_ CROSS JOIN stats
),
zones AS (SELECT f, MIN(k) AS kmin, MAX(k) AS kmax FROM filed GROUP BY f),
bits AS (
    SELECT DISTINCT f, pos FROM (
        SELECT f, CAST('0x' || substr(md5(CAST(k AS VARCHAR) || '#' || j), 1, 8) AS BIGINT)
                  % {_BLOOM_M} AS pos
        FROM filed, unnest(range({_BLOOM_K})) AS t(j)
    )
),
probes AS (
    SELECT DISTINCT stats.omin + i * (stats.omax - stats.omin) // {_BLOOM_PROBES - 1}
           AS probe_key
    FROM unnest(range({_BLOOM_PROBES})) AS t(i) CROSS JOIN stats
),
actual AS (
    SELECT probe_key, COUNT(*) AS files_actual FROM (
        SELECT DISTINCT p.probe_key, filed.f
        FROM filed JOIN probes p ON filed.k = p.probe_key
    ) GROUP BY probe_key
),
zone_touch AS (
    SELECT p.probe_key, COUNT(*) AS files_zone
    FROM probes p JOIN zones z
      ON p.probe_key >= z.kmin AND p.probe_key <= z.kmax
    GROUP BY p.probe_key
),
ppos AS (
    SELECT DISTINCT probe_key,
           CAST('0x' || substr(md5(CAST(probe_key AS VARCHAR) || '#' || j), 1, 8) AS BIGINT)
           % {_BLOOM_M} AS pos
    FROM probes, unnest(range({_BLOOM_K})) AS t(j)
),
npos AS (SELECT probe_key, COUNT(*) AS np FROM ppos GROUP BY probe_key),
bloom_touch AS (
    SELECT probe_key, COUNT(*) AS files_bloom FROM (
        SELECT pp.probe_key, b.f, COUNT(DISTINCT b.pos) AS hits
        FROM bits b JOIN ppos pp ON pp.pos = b.pos
        GROUP BY pp.probe_key, b.f
    ) j JOIN npos USING (probe_key)
    WHERE j.hits = npos.np
    GROUP BY probe_key
)
SELECT p.probe_key,
       CAST(COALESCE(a.files_actual, 0) AS BIGINT) AS files_actual,
       CAST(COALESCE(z.files_zone, 0) AS BIGINT) AS files_zone,
       CAST(COALESCE(b.files_bloom, 0) AS BIGINT) AS files_bloom,
       CAST(COALESCE(b.files_bloom, 0) - COALESCE(a.files_actual, 0) AS BIGINT)
           AS bloom_fp_files
FROM probes p
LEFT JOIN actual a USING (probe_key)
LEFT JOIN zone_touch z USING (probe_key)
LEFT JOIN bloom_touch b USING (probe_key)
"""


# ---------------------------------------------------------------------------
# Approximate query processing: deterministic sample-and-scale with CIs
# ---------------------------------------------------------------------------

_AQP_MOD = 10  # 1-in-10 md5 Bernoulli sample (p = 0.1)
_AQP_P = 1.0 / _AQP_MOD
_AQP_C_ROWS = (1.0 - _AQP_P) / (_AQP_P * _AQP_P)  # Var[N-hat] per sample row


def q_aqp_group_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-query-processing audit: estimate per-group row
    counts and revenue from a DETERMINISTIC 1-in-10 md5 row sample
    (sample-and-scale, the BlinkDB/online-aggregation recipe), attach
    normal-approximation 95% confidence half-widths, and join the EXACT
    answers next to them with a ``within_ci`` verdict — the dashboard
    pattern at 100 TB: scan 10% and know how wrong you might be. The
    md5 membership makes the "random" sample replayable, so estimator,
    half-width arithmetic, and verdicts are all oracle-checked (the
    audit gates the math, not luck: with p = 0.1 and n in the
    thousands per group, the CLT half-width is valid and the verdict
    column shows it).

    Scale shape: ONE filtered scan for the sample (the filter is a
    pushable deterministic predicate), one bounded exact aggregate for
    the comparison — in production the exact side is omitted and only
    the sample scan runs. Count CI: Var[N̂] = n·(1−p)/p²; sum CI via
    the sample variance of scaled per-row contributions, both as
    closed-form doubles over exact integer sums.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    rows = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
        F.pmod(
            md5_u32(F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))),
            F.lit(_AQP_MOD),
        ).alias("m"),
    )
    samp = rows.where(F.col("m") == 0).groupBy("flag").agg(
        F.count(F.lit(1)).alias("n_s"),
        F.sum("cents").alias("sum_s"),
        F.sum(F.col("cents") * F.col("cents")).alias("sum_s2"),
    )
    exact = rows.groupBy("flag").agg(
        F.count(F.lit(1)).alias("exact_rows"),
        F.sum("cents").alias("exact_cents"),
    )
    est_rows = (F.col("n_s") * _AQP_MOD).cast("long")
    est_cents = (F.col("sum_s") * _AQP_MOD).cast("long")
    # the CI constants are computed ONCE in Python and interpolated
    # into BOTH engines' expressions (the oracle repr's the same
    # floats), so every IEEE op sequence is identical
    ci_rows = F.lit(1.96) * F.sqrt(
        F.col("n_s").cast("double") * F.lit(_AQP_C_ROWS)
    )
    # sum estimator: Horvitz-Thompson total under Bernoulli sampling;
    # its textbook variance estimate is (1-p)/p^2 · Σ_{i∈s} y_i² — the
    # same constant as the count CI, applied to the sample's second
    # moment (covers both which-rows and how-big randomness)
    ci_cents = F.lit(1.96) * F.sqrt(
        F.col("sum_s2").cast("double") * F.lit(_AQP_C_ROWS)
    )
    j = exact.join(samp, "flag", "left")
    return j.select(
        "flag",
        F.col("exact_rows").cast("long").alias("exact_rows"),
        est_rows.alias("est_rows"),
        F.round(ci_rows, 4).alias("ci_rows_half"),
        (
            F.abs(est_rows - F.col("exact_rows")).cast("double") <= ci_rows
        ).alias("rows_within_ci"),
        F.col("exact_cents").cast("long").alias("exact_cents"),
        est_cents.alias("est_cents"),
        F.round(ci_cents, 4).alias("ci_cents_half"),
        (
            F.abs(est_cents - F.col("exact_cents")).cast("double") <= ci_cents
        ).alias("cents_within_ci"),
    )


ORACLE_AQP_GROUP_ESTIMATE = f"""
WITH rows_ AS (
    SELECT l_returnflag AS flag,
           CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents,
           CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '-' ||
                CAST(l_linenumber AS VARCHAR)), 1, 8) AS BIGINT) % {_AQP_MOD} AS m
    FROM lineitem
),
samp AS (
    SELECT flag, COUNT(*) AS n_s, SUM(cents) AS sum_s,
           SUM(cents * cents) AS sum_s2
    FROM rows_ WHERE m = 0 GROUP BY flag
),
exact AS (
    SELECT flag, COUNT(*) AS exact_rows, SUM(cents) AS exact_cents
    FROM rows_ GROUP BY flag
),
ci AS (
    SELECT flag, n_s, sum_s,
           1.96e0 * SQRT(CAST(n_s AS DOUBLE) * {_AQP_C_ROWS!r}) AS ci_rows,
           1.96e0 * SQRT(CAST(sum_s2 AS DOUBLE) * {_AQP_C_ROWS!r}) AS ci_cents
    FROM samp
)
SELECT e.flag,
       CAST(e.exact_rows AS BIGINT) AS exact_rows,
       CAST(c.n_s * {_AQP_MOD} AS BIGINT) AS est_rows,
       ROUND(c.ci_rows, 4) AS ci_rows_half,
       CAST(ABS(c.n_s * {_AQP_MOD} - e.exact_rows) AS DOUBLE) <= c.ci_rows
           AS rows_within_ci,
       CAST(e.exact_cents AS BIGINT) AS exact_cents,
       CAST(c.sum_s * {_AQP_MOD} AS BIGINT) AS est_cents,
       ROUND(c.ci_cents, 4) AS ci_cents_half,
       CAST(ABS(c.sum_s * {_AQP_MOD} - e.exact_cents) AS DOUBLE) <= c.ci_cents
           AS cents_within_ci
FROM exact e LEFT JOIN ci c USING (flag)
"""


# ---------------------------------------------------------------------------
# Bucketed co-located join: the shuffle-free fact-fact join
# ---------------------------------------------------------------------------

_BJ_BUCKETS = 8


def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table co-located join END-TO-END: write orders AND
    lineitem as bucketed+sorted tables on the join key
    (``bucketBy(8, orderkey) . sortBy`` — what a lakehouse does ONCE at
    ingest), read them back through the catalog, and join — Spark's
    bucketing metadata proves both sides share the partitioning, so the
    sort-merge join runs with NO shuffle exchange on either side (the
    plan property is pytest-pinned; at 100 TB this turns the nightly
    fact-fact join's dominant cost — two full-table exchanges — into
    zero). The report is the per-priority exact-cents revenue rollup;
    its oracle is the PLAIN join, so the differential proves bucketing
    changed the physical plan and nothing else.

    Same write-then-audit pattern as ``file_balance``/``merge_upsert``:
    the sink work is real (bucket files on disk, catalog metadata), the
    verdict is value-based.
    """
    import shutil
    from urllib.parse import urlparse

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    od = load_tables(spark, sf_dir, ("orders",))["orders"]
    # a FRESH in-memory catalog does not know about a previous
    # session's managed-table directories, so overwrite alone hits
    # LOCATION_ALREADY_EXISTS — drop the catalog entry AND any stale
    # on-disk location first (the write-then-swap hygiene sinks.py's
    # merge_upsert applies, here for catalog tables)
    wh_uri = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    for t in ("spark_dq_bj_orders", "spark_dq_bj_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        if wh_uri.scheme in ("", "file"):
            shutil.rmtree(f"{wh_uri.path}/{t}", ignore_errors=True)
        else:
            # non-local warehouse (s3a://, hdfs://): rmtree on the URI
            # *path* would silently do nothing and leave a stale
            # LOCATION_ALREADY_EXISTS — purge through Hadoop's
            # filesystem API instead, scheme-agnostic
            jvm = spark.sparkContext._jvm
            jsc = spark.sparkContext._jsc
            hpath = jvm.org.apache.hadoop.fs.Path(
                f"{wh_uri.geturl().rstrip('/')}/{t}"
            )
            fs = hpath.getFileSystem(jsc.hadoopConfiguration())
            fs.delete(hpath, True)
    (
        od.select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite")
        .bucketBy(_BJ_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("spark_dq_bj_orders")
    )
    (
        li.select(
            "l_orderkey",
            F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
        )
        .write.mode("overwrite")
        .bucketBy(_BJ_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("spark_dq_bj_lineitem")
    )
    o = spark.table("spark_dq_bj_orders")
    l = spark.table("spark_dq_bj_lineitem")
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )


ORACLE_BUCKETED_JOIN = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
"""


def q_bucketed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table ZERO-EXCHANGE aggregation — the groupBy twin of
    ``bucketed_join`` (r6): write lineitem bucketed on ``l_suppkey``
    once (the ingest-time layout decision), read it back through the
    catalog, and run the per-supplier rollup. The bucketed scan
    already satisfies the aggregate's required hash distribution, so
    the plan contains NO shuffle exchange at all (pytest-pinned) — at
    100 TB the nightly per-key rollup on a bucketed fact table reads
    and folds, never reshuffles. The oracle is the plain groupBy, so
    the differential proves bucketing changed only the physical plan.
    """
    import shutil
    from urllib.parse import urlparse

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    t = "spark_dq_ba_lineitem"
    wh_uri = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    if wh_uri.scheme in ("", "file"):
        shutil.rmtree(f"{wh_uri.path}/{t}", ignore_errors=True)
    else:
        jvm = spark.sparkContext._jvm
        jsc = spark.sparkContext._jsc
        hpath = jvm.org.apache.hadoop.fs.Path(f"{wh_uri.geturl().rstrip('/')}/{t}")
        fs = hpath.getFileSystem(jsc.hadoopConfiguration())
        fs.delete(hpath, True)
    (
        li.select(
            "l_suppkey",
            "l_quantity",
            F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
        )
        .write.mode("overwrite")
        .bucketBy(_BJ_BUCKETS, "l_suppkey")
        .saveAsTable(t)
    )
    return (
        spark.table(t)
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            # l_quantity is an INTEGER-valued double (TESTDATA contract),
            # so its double sum is exact in any partition order
            F.sum("l_quantity").cast("long").alias("qty_sum"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )


ORACLE_BUCKETED_AGG = """
SELECT l_suppkey,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(l_quantity) AS BIGINT) AS qty_sum,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM lineitem GROUP BY l_suppkey
"""


def q_join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality PRE-FLIGHT: the exact output size of the
    lineitem ⋈ lineitem self-join on ``l_partkey`` — computed WITHOUT
    executing the join, from per-key counts alone
    (|A ⋈ B| = Σ_k cntA(k)·cntB(k); here Σ cnt² over one side). This
    is the fanout estimator you run before any key-join whose
    multiplicity you don't control: one keyed COUNT shuffle (key +
    8-byte count travel, never payload rows) prices a join that would
    otherwise materialize Σcnt² rows — the same refusal information
    the linkage family's ``_enforce_candidate_budget`` acts on, as a
    standalone report. Output: one row — key/row counts, the exact
    join cardinality, the biggest key's count and its share of the
    join output (the skew verdict: a top-share ≫ 1/n_keys says salt or
    filter THAT key before joining).
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    per_key = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    return per_key.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("join_rows"),
        F.max("cnt").cast("long").alias("max_key_rows"),
        F.round(
            F.max(F.col("cnt") * F.col("cnt")).cast("double")
            / F.sum(F.col("cnt") * F.col("cnt")).cast("double")
            * 100,
            6,
        ).alias("top_key_share_pct"),
    )


ORACLE_JOIN_CARDINALITY_AUDIT = """
WITH c AS (SELECT l_partkey AS k, COUNT(*) AS cnt FROM lineitem GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       CAST(SUM(cnt * cnt) AS BIGINT) AS join_rows,
       CAST(MAX(cnt) AS BIGINT) AS max_key_rows,
       ROUND(
           CAST(MAX(cnt * cnt) AS DOUBLE) / CAST(SUM(cnt * cnt) AS DOUBLE)
           * 100,
           6
       ) AS top_key_share_pct
FROM c
"""


# ---------------------------------------------------------------------------
# Incremental join-view maintenance (delta-join algebra)
# ---------------------------------------------------------------------------


def q_incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view under inserts on BOTH
    sides — the delta algebra every incremental-ETL engine runs
    (Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB; DBSP/Materialize semantics,
    insert-only case): the per-priority revenue view over
    orders ⋈ lineitem is maintained from the OLD snapshot's aggregate
    plus three DELTA joins whose cost is ∝ |Δ| (each join has a small
    side the optimizer broadcast/filter-pushes), then checked against
    the full recompute over the unioned tables — the ``matches``
    column is the self-verdict, the ``incremental_volume`` pattern
    extended from aggregate views to join views.

    Deltas are deterministic slices (new orders = ``orderkey % 20 ==
    0``, late-arriving lines = ``linenumber > 5``), so both maintenance
    paths are oracle-replayed exactly; every measure is integer
    (counts + exact cents), so the partial aggregates merge
    associatively under any partitioning.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"].select(
        F.col("l_orderkey").alias("lk"),
        F.col("l_linenumber").alias("ln"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
    )
    od = load_tables(spark, sf_dir, ("orders",))["orders"].select(
        F.col("o_orderkey").alias("ok"), F.col("o_orderpriority").alias("prio")
    )
    o_old = od.where(F.col("ok") % 20 != 0)
    o_new = od.where(F.col("ok") % 20 == 0)
    l_old = li.where(F.col("ln") <= 5)
    l_new = li.where(F.col("ln") > 5)

    def agg(o, l):
        return (
            o.join(l, o["ok"] == l["lk"])
            .groupBy("prio")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("cents").alias("c"),
            )
        )

    base = agg(o_old, l_old)
    deltas = (
        agg(o_new, l_old)
        .unionByName(agg(o_old, l_new))
        .unionByName(agg(o_new, l_new))
    )
    inc = (
        base.unionByName(deltas)
        .groupBy("prio")
        .agg(F.sum("n").alias("n_inc"), F.sum("c").alias("cents_inc"))
    )
    full = (
        od.join(li, od["ok"] == li["lk"])
        .groupBy("prio")
        .agg(F.count(F.lit(1)).alias("n_full"), F.sum("cents").alias("cents_full"))
    )
    return (
        full.join(inc, "prio", "full_outer")
        .select(
            F.col("prio").alias("o_orderpriority"),
            F.coalesce("n_inc", F.lit(0)).cast("long").alias("n_inc"),
            F.coalesce("cents_inc", F.lit(0)).cast("long").alias("cents_inc"),
            F.coalesce("n_full", F.lit(0)).cast("long").alias("n_full"),
            F.coalesce("cents_full", F.lit(0)).cast("long").alias("cents_full"),
            (
                (F.coalesce("n_inc", F.lit(0)) == F.coalesce("n_full", F.lit(0)))
                & (
                    F.coalesce("cents_inc", F.lit(0))
                    == F.coalesce("cents_full", F.lit(0))
                )
            ).alias("matches"),
        )
    )


ORACLE_INCREMENTAL_JOIN_VIEW = """
WITH li AS (
    SELECT l_orderkey AS lk, l_linenumber AS ln,
           CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents
    FROM lineitem
),
od AS (SELECT o_orderkey AS ok, o_orderpriority AS prio FROM orders),
parts AS (
    SELECT o.prio, COUNT(*) AS n, SUM(l.cents) AS c
    FROM od o JOIN li l ON o.ok = l.lk
    WHERE o.ok % 20 <> 0 AND l.ln <= 5 GROUP BY o.prio
    UNION ALL
    SELECT o.prio, COUNT(*), SUM(l.cents)
    FROM od o JOIN li l ON o.ok = l.lk
    WHERE o.ok % 20 = 0 AND l.ln <= 5 GROUP BY o.prio
    UNION ALL
    SELECT o.prio, COUNT(*), SUM(l.cents)
    FROM od o JOIN li l ON o.ok = l.lk
    WHERE o.ok % 20 <> 0 AND l.ln > 5 GROUP BY o.prio
    UNION ALL
    SELECT o.prio, COUNT(*), SUM(l.cents)
    FROM od o JOIN li l ON o.ok = l.lk
    WHERE o.ok % 20 = 0 AND l.ln > 5 GROUP BY o.prio
),
inc AS (SELECT prio, SUM(n) AS n_inc, SUM(c) AS cents_inc FROM parts GROUP BY prio),
f AS (
    SELECT o.prio, COUNT(*) AS n_full, SUM(l.cents) AS cents_full
    FROM od o JOIN li l ON o.ok = l.lk GROUP BY o.prio
)
SELECT COALESCE(f.prio, inc.prio) AS o_orderpriority,
       CAST(COALESCE(inc.n_inc, 0) AS BIGINT) AS n_inc,
       CAST(COALESCE(inc.cents_inc, 0) AS BIGINT) AS cents_inc,
       CAST(COALESCE(f.n_full, 0) AS BIGINT) AS n_full,
       CAST(COALESCE(f.cents_full, 0) AS BIGINT) AS cents_full,
       COALESCE(inc.n_inc, 0) = COALESCE(f.n_full, 0)
           AND COALESCE(inc.cents_inc, 0) = COALESCE(f.cents_full, 0)
           AS matches
FROM f FULL OUTER JOIN inc ON inc.prio = f.prio
"""


def q_retraction_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance under DELETES (retractions) — the
    Z-set extension of ``incremental_join_view``'s insert-only delta
    algebra (DBSP/Differential-Dataflow semantics): CDC rows carry a
    sign ∈ {+1, −1}; the maintained (prio, linenumber) revenue view is
    the old aggregate PLUS the sign-weighted delta aggregate, and a
    group whose maintained count reaches zero must VANISH from the
    view (the retraction subtlety a naive merge leaves behind as a
    zero row). The CDC batch deletes EVERY linenumber-7 row — so all
    (prio, 7) groups drain to exactly zero and must disappear — and
    inserts re-priced copies (+777 cents) of a deterministic slice.
    The maintained result is checked against a full recompute over
    base − deletes + inserts; the ``matches`` column is the
    self-verdict. All measures are integer (sign-weighted counts,
    exact cents), so partial aggregates merge associatively under any
    partitioning; at 100 TB the delta aggregation touches ∝ |Δ| rows
    while the base aggregate is the stored view.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"].select(
        F.col("l_orderkey").alias("lk"),
        F.col("l_linenumber").cast("long").alias("ln"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
    )
    od = load_tables(spark, sf_dir, ("orders",))["orders"].select(
        F.col("o_orderkey").alias("ok"), F.col("o_orderpriority").alias("prio")
    )
    joined = od.join(li, od["ok"] == li["lk"]).select("prio", "ln", "cents")
    # the stored view (state before the CDC batch)
    base = joined.groupBy("prio", "ln").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("c")
    )
    # CDC batch: sign −1 for every ln=7 row; sign +1 re-priced copies
    # of (ln=1, lk%13=0) rows
    dels = joined.where(F.col("ln") == 7).select(
        "prio", "ln", F.lit(-1).alias("sign"), F.col("cents")
    )
    ins = (
        od.join(li, od["ok"] == li["lk"])
        .where((F.col("ln") == 1) & (F.col("lk") % 13 == 0))
        .select(
            "prio", "ln", F.lit(1).alias("sign"),
            (F.col("cents") + 777).alias("cents"),
        )
    )
    cdc = dels.unionByName(ins)
    delta = cdc.groupBy("prio", "ln").agg(
        F.sum("sign").alias("n"),
        F.sum(F.col("sign") * F.col("cents")).alias("c"),
    )
    maintained = (
        base.unionByName(delta)
        .groupBy("prio", "ln")
        .agg(F.sum("n").alias("n_inc"), F.sum("c").alias("cents_inc"))
        .where(F.col("n_inc") > 0)  # retraction GC: drained groups vanish
    )
    # full recompute over base − deletes + inserts
    after = (
        joined.where(F.col("ln") != 7)
        .unionByName(
            od.join(li, od["ok"] == li["lk"])
            .where((F.col("ln") == 1) & (F.col("lk") % 13 == 0))
            .select("prio", "ln", (F.col("cents") + 777).alias("cents"))
        )
        .groupBy("prio", "ln")
        .agg(F.count(F.lit(1)).alias("n_full"), F.sum("cents").alias("cents_full"))
    )
    return (
        after.join(maintained, ["prio", "ln"], "full_outer")
        .select(
            F.col("prio").alias("o_orderpriority"),
            F.col("ln").alias("linenumber"),
            F.coalesce("n_inc", F.lit(0)).cast("long").alias("n_inc"),
            F.coalesce("cents_inc", F.lit(0)).cast("long").alias("cents_inc"),
            F.coalesce("n_full", F.lit(0)).cast("long").alias("n_full"),
            F.coalesce("cents_full", F.lit(0)).cast("long").alias("cents_full"),
            (
                (F.coalesce("n_inc", F.lit(0)) == F.coalesce("n_full", F.lit(0)))
                & (
                    F.coalesce("cents_inc", F.lit(0))
                    == F.coalesce("cents_full", F.lit(0))
                )
            ).alias("matches"),
        )
    )


ORACLE_RETRACTION_VIEW = """
WITH li AS (
    SELECT l_orderkey AS lk, CAST(l_linenumber AS BIGINT) AS ln,
           CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents
    FROM lineitem
),
od AS (SELECT o_orderkey AS ok, o_orderpriority AS prio FROM orders),
j AS (SELECT o.prio, l.ln, l.cents, l.lk FROM od o JOIN li l ON o.ok = l.lk),
base AS (SELECT prio, ln, COUNT(*) AS n, SUM(cents) AS c FROM j GROUP BY prio, ln),
cdc AS (
    SELECT prio, ln, -1 AS sign, cents FROM j WHERE ln = 7
    UNION ALL
    SELECT prio, ln, 1 AS sign, cents + 777 FROM j WHERE ln = 1 AND lk % 13 = 0
),
delta AS (
    SELECT prio, ln, SUM(sign) AS n, SUM(sign * cents) AS c
    FROM cdc GROUP BY prio, ln
),
merged AS (
    SELECT prio, ln, SUM(n) AS n_inc, SUM(c) AS cents_inc FROM (
        SELECT * FROM base UNION ALL SELECT * FROM delta
    ) GROUP BY prio, ln
),
maintained AS (SELECT * FROM merged WHERE n_inc > 0),
after AS (
    SELECT prio, ln, COUNT(*) AS n_full, SUM(cents) AS cents_full FROM (
        SELECT prio, ln, cents FROM j WHERE ln <> 7
        UNION ALL
        SELECT prio, ln, cents + 777 FROM j WHERE ln = 1 AND lk % 13 = 0
    ) GROUP BY prio, ln
)
SELECT COALESCE(a.prio, m.prio) AS o_orderpriority,
       COALESCE(a.ln, m.ln) AS linenumber,
       CAST(COALESCE(m.n_inc, 0) AS BIGINT) AS n_inc,
       CAST(COALESCE(m.cents_inc, 0) AS BIGINT) AS cents_inc,
       CAST(COALESCE(a.n_full, 0) AS BIGINT) AS n_full,
       CAST(COALESCE(a.cents_full, 0) AS BIGINT) AS cents_full,
       COALESCE(m.n_inc, 0) = COALESCE(a.n_full, 0)
           AND COALESCE(m.cents_inc, 0) = COALESCE(a.cents_full, 0) AS matches
FROM after a FULL OUTER JOIN maintained m ON m.prio = a.prio AND m.ln = a.ln
"""


_BLOOM_FPP_PROBES = 64


def q_bloom_fpp_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured bloom FALSE-POSITIVE rate — the sketch-error audit for
    the file-bloom index (the ``minhash_error`` pattern applied to
    ``bloom_skipping``'s filters): probe every file's bloom with 64
    keys GUARANTEED absent from the corpus (strictly above the key
    domain's max), so every pass is a false positive by construction.
    Output per file: ``(file, n_keys, bits_set, false_passes)`` — the
    load factor (bits_set/m) drives the theoretical FPR ≈
    (bits_set/m)^k, and the measured ``false_passes``/64 must sit near
    it (pytest pins the aggregate); a file whose measured rate blows
    past theory has a broken hash or an over-full filter. At 100 TB
    this is the audit you run before trusting bloom pruning stats in a
    query planner.

    A probe passes a file iff ALL its k bit positions are set in that
    file's filter — including the k-collision case (both hashes landing
    on one bit), handled by comparing against the probe's DISTINCT
    position count. Everything is exact integers over broadcast-sized
    probe frames; the md5 bit positions keep it oracle-replayable.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    rows = li.select(
        F.col("l_orderkey").alias("k"),
        F.datediff(F.col("l_shipdate"), F.lit("1970-01-01")).alias("d"),
    )
    stats = rows.agg(
        F.min("d").alias("dmin"), F.max("d").alias("dmax"),
        F.max("k").alias("omax"),
    )
    filed = rows.crossJoin(F.broadcast(stats)).select(
        "k",
        F.expr(
            f"(d - dmin) * {_BLOOM_FILES} DIV (dmax - dmin + 1)"
        ).alias("f"),
    )
    bits = (
        filed.select(
            "f",
            F.explode(
                F.array(*[_bloom_pos(F.col("k"), j) for j in range(_BLOOM_K)])
            ).alias("pos"),
        )
        .distinct()
    )
    probes = (
        spark.range(_BLOOM_FPP_PROBES)
        .crossJoin(F.broadcast(stats))
        .select((F.col("omax") + 1 + F.col("id") * 17).alias("probe_key"))
    )
    ppos = probes.select(
        "probe_key",
        F.explode(
            F.array(*[_bloom_pos(F.col("probe_key"), j) for j in range(_BLOOM_K)])
        ).alias("pos"),
    ).distinct()
    need = ppos.groupBy("probe_key").agg(F.count(F.lit(1)).alias("n_need"))
    passes = (
        ppos.join(bits, "pos")
        .groupBy("probe_key", "f")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .join(F.broadcast(need), "probe_key")
        .where(F.col("n_hit") == F.col("n_need"))
        .groupBy("f")
        .agg(F.count(F.lit(1)).alias("false_passes"))
    )
    per_file = bits.groupBy("f").agg(F.count(F.lit(1)).alias("bits_set"))
    nkeys = filed.distinct().groupBy("f").agg(F.count(F.lit(1)).alias("n_keys"))
    return (
        nkeys.join(per_file, "f")
        .join(passes, "f", "left")
        .select(
            F.col("f").cast("long").alias("file"),
            F.col("n_keys").cast("long").alias("n_keys"),
            F.col("bits_set").cast("long").alias("bits_set"),
            F.coalesce("false_passes", F.lit(0)).cast("long").alias("false_passes"),
        )
    )


ORACLE_BLOOM_FPP_AUDIT = f"""
WITH rows_ AS (
    SELECT l_orderkey AS k,
           datediff('day', DATE '1970-01-01', l_shipdate) AS d
    FROM lineitem
),
stats AS (SELECT MIN(d) AS dmin, MAX(d) AS dmax, MAX(k) AS omax FROM rows_),
filed AS (
    SELECT k, (d - stats.dmin) * {_BLOOM_FILES} // (stats.dmax - stats.dmin + 1) AS f
    FROM rows_ CROSS JOIN stats
),
bits AS (
    SELECT DISTINCT f, pos FROM (
        SELECT f, CAST('0x' || substr(md5(CAST(k AS VARCHAR) || '#' || j), 1, 8) AS BIGINT)
                  % {_BLOOM_M} AS pos
        FROM filed, unnest(range({_BLOOM_K})) AS t(j)
    )
),
probes AS (
    SELECT stats.omax + 1 + i * 17 AS probe_key
    FROM unnest(range({_BLOOM_FPP_PROBES})) AS t(i) CROSS JOIN stats
),
ppos AS (
    SELECT DISTINCT probe_key,
           CAST('0x' || substr(md5(CAST(probe_key AS VARCHAR) || '#' || j), 1, 8) AS BIGINT)
           % {_BLOOM_M} AS pos
    FROM probes, unnest(range({_BLOOM_K})) AS t(j)
),
need AS (SELECT probe_key, COUNT(*) AS n_need FROM ppos GROUP BY probe_key),
passes AS (
    SELECT f, COUNT(*) AS false_passes FROM (
        SELECT p.probe_key, b.f, COUNT(*) AS n_hit
        FROM ppos p JOIN bits b ON b.pos = p.pos
        GROUP BY p.probe_key, b.f
    ) h JOIN need n ON n.probe_key = h.probe_key AND h.n_hit = n.n_need
    GROUP BY f
),
per_file AS (SELECT f, COUNT(*) AS bits_set FROM bits GROUP BY f),
nkeys AS (
    SELECT f, COUNT(*) AS n_keys FROM (SELECT DISTINCT k, f FROM filed) GROUP BY f
)
SELECT CAST(nk.f AS BIGINT) AS file,
       CAST(nk.n_keys AS BIGINT) AS n_keys,
       CAST(pf.bits_set AS BIGINT) AS bits_set,
       CAST(COALESCE(ps.false_passes, 0) AS BIGINT) AS false_passes
FROM nkeys nk
JOIN per_file pf ON pf.f = nk.f
LEFT JOIN passes ps ON ps.f = nk.f
"""
