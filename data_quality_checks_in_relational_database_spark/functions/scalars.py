"""Scalar expression helpers with pinned semantics.

These pin the semantic edges catalogued in SURVEY.md §1.2/§2.6: the
MySQL ``*1`` string→number coercion (0, not NULL, on garbage), pandas'
half-even rounding, the proleptic-Gregorian date ordinal used by the
reference's consistency score (``data_consistency_checks.py:136-141``),
and pandas' NaN-skipping row-wise sample stddev
(``data_consistency_checks.py:140``).

Everything here is a pure Column expression — JVM-side, inside
whole-stage codegen; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: days from 0001-01-01 (proleptic Gregorian ordinal 1) to 1970-01-01.
EPOCH_ORDINAL = 719163


def rebalance(df, partitions: int | None = None):
    """Spread a narrow input across the cluster before compute-heavy
    per-row work.

    Small report/dimension tables often arrive as ONE file → ONE
    partition, which serializes downstream per-row compute (shingling,
    sketching, scoring) on a single core no matter how wide the
    cluster is. At real scale inputs already have many partitions and
    this is a no-op — it only rescues the small-input degenerate case.

    The gate is ``df.inputFiles()`` — driver-side plan inspection, no
    RDD materialization (``df.rdd`` would build a Python RDD lineage
    and force conversion on every operator invocation). Non-file plans
    (in-memory test frames, JDBC) return no files and are left alone:
    their partitioning was chosen upstream (numSlices / numPartitions)
    and a blind repartition would *collapse* a wide scan to
    ``defaultParallelism`` at cluster scale.
    """
    target = partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # non-analyzable / exotic source: leave untouched
        return df
    if 0 < n_files < target:
        return df.repartition(target)
    return df


def date_ordinal(col: Column | str) -> Column:
    """Proleptic-Gregorian day number of a date column.

    Matches ``pandas.Timestamp.toordinal`` (reference
    ``data_consistency_checks.py:136-138``): 1970-01-01 → 719163.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.datediff(c.cast("date"), F.to_date(F.lit("1970-01-01"))) + F.lit(EPOCH_ORDINAL)).cast(
        "long"
    )


def round_half_even(col: Column | str, scale: int = 0) -> Column:
    """Banker's rounding — parity with ``pandas.Series.round`` used by the
    reference's consistency score (``data_consistency_checks.py:141``).
    Spark's ``round`` is half-up; ``bround`` is half-even."""
    c = F.col(col) if isinstance(col, str) else col
    return F.bround(c, scale)


def mysql_num(col: Column | str) -> Column:
    """MySQL's implicit ``col * 1`` string→number coercion
    (``pre_and_post_etl_checks.py:47``): non-numeric strings become 0,
    not NULL. Spark's plain ``cast`` yields NULL — we coalesce to 0 for
    verbatim parity. Use ``col.cast(...)`` directly when NULL-on-garbage
    is preferable."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.try_cast("double").try_cast("long"), F.lit(0))


def money_sum(col: Column | str, decimals: int = 2) -> Column:
    """Order-independent exact SUM of a fixed-point-valued double column.

    Doubles summed in different partition orders differ in the last
    ulps, which breaks hash-stable comparison and is generally
    nondeterministic at 100 TB (shuffle order varies run to run). We
    instead round each value to its known fixed-point scale, sum exact
    integers (map-side partial agg still applies), and divide back —
    bit-identical regardless of partitioning.
    """
    c = F.col(col) if isinstance(col, str) else col
    scale = 10**decimals
    return F.sum(F.round(c * scale, 0).cast("long")) / F.lit(float(scale))


def rowwise_stddev_samp(*cols: Column | str) -> Column:
    """Sample stddev (ddof=1) across N columns of one row, skipping NULLs.

    Parity with ``DataFrame.std(axis=1)`` in the reference's
    consistency score (``data_consistency_checks.py:140``): NaN values
    are skipped and the divisor is (n_non_null - 1); NULL when fewer
    than two values. Pure higher-order-function expression (no UDF, no
    shuffle — evaluated per-row inside codegen).
    """
    arr = F.array(*[(F.col(c) if isinstance(c, str) else c).cast("double") for c in cols])
    xs = F.filter(arr, lambda v: v.isNotNull())
    n = F.size(xs)
    mean = F.aggregate(xs, F.lit(0.0), lambda acc, v: acc + v) / n
    ss = F.aggregate(xs, F.lit(0.0), lambda acc, v: acc + (v - mean) * (v - mean))
    return F.when(n >= 2, F.sqrt(ss / (n - 1).cast("double")))


def md5_u60(col: Column | str) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT — an
    engine-portable 60-bit hash.

    Bit-for-bit reproducible in any engine with md5: the DuckDB twin is
    ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`` (parity pinned in
    tests, unicode included). 15 hex chars = 60 bits < 2^63, so the
    value is exact in a signed 64-bit integer in every engine — no
    unsigned/overflow edge. Use for sketches that must be verifiable by
    a differential oracle (portable SimHash / winnowing); prefer
    ``F.xxhash64`` where only Spark-internal determinism is needed
    (same JVM codegen path, ~3× cheaper per call).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_u32(col: Column | str) -> Column:
    """First 32 bits of md5 as a non-negative BIGINT (DuckDB twin:
    ``CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)``). The narrow
    sibling of :func:`md5_u60` for sketches whose downstream arithmetic
    must stay under 2^63 after multiplying by a permutation
    coefficient (portable MinHash: a·h < 2^31·2^32 = 2^63)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


#: Named hash families for sketch operators: engine-portable vs fast.
#: Values: (column_fn, sketch_bits).
SKETCH_HASHES: dict[str, tuple] = {
    "xxhash64": (F.xxhash64, 64),
    "md5_60": (md5_u60, 60),
}


def token_count(col: Column | str) -> Column:
    """Whitespace token count; 0 for empty/blank strings (Spark's
    ``split('')`` returns [''], which must not count as one token)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("long")
