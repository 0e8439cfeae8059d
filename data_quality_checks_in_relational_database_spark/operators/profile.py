"""Table profiling — per-column statistics in ONE aggregate pass.

The standard first step of any DQ engagement: for every column, null
counts, distinct counts, min/max, and (for numerics) sums. All columns
profile in a single scan (one wide aggregate with map-side combine);
the report is bounded by column count.

Output values are strings (min/max/sum rendered via CAST) so one
long-format report covers heterogeneous column types — the same trick
the SQL oracle uses, keeping the differential gate exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_table(df: DataFrame, table_name: str) -> DataFrame:
    """(table_name, column, dtype, n_rows, n_nulls, n_distinct,
    min_value, max_value) — one row per column, one scan total."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, f in enumerate(df.schema.fields):
        c = F.col(f.name)
        aggs += [
            F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"nn{i}"),
            F.count_distinct(c).alias(f"nd{i}"),
            F.min(c).cast("string").alias(f"mn{i}"),
            F.max(c).cast("string").alias(f"mx{i}"),
        ]
    wide = df.agg(*aggs)
    parts = []
    for i, f in enumerate(df.schema.fields):
        parts.append(
            wide.select(
                F.lit(table_name).alias("table_name"),
                F.lit(f.name).alias("column"),
                F.lit(f.dataType.simpleString()).alias("dtype"),
                F.col("__n").alias("n_rows"),
                F.col(f"nn{i}").cast("long").alias("n_nulls"),
                F.col(f"nd{i}").cast("long").alias("n_distinct"),
                F.col(f"mn{i}").alias("min_value"),
                F.col(f"mx{i}").alias("max_value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def is_numeric(df: DataFrame, col: str) -> bool:
    return isinstance(df.schema[col].dataType, NumericType)


#: round(1000 * log10(1 + 1/d)) for d = 1..9 — Benford's law expected
#: first-digit shares in milli-units. Precomputed literals so both this
#: operator and its SQL oracle carry identical integers (no cross-engine
#: libm log10 ulp risk in the gate).
BENFORD_EXPECTED_MILLI: tuple[int, ...] = (301, 176, 125, 97, 79, 67, 58, 51, 46)


def benford_report(df: DataFrame, value_col: str, decimals: int = 2) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated-numbers / truncated-feed detector for financial
    and metering columns.

    Output: (digit, n, share, expected_milli, dev_milli) for digits
    1..9; ``share`` is an exact bigint/bigint division, ``dev_milli`` =
    |round(1000*share) - expected| in milli-units.

    Digit extraction avoids float log10 entirely: the value scales to
    an integer (10^decimals), casts to string (exact for integers in
    every engine), and takes the first character — portable and
    whole-stage-codegen'd. Rows with value <= 0 are excluded (Benford
    applies to positive magnitudes).
    """
    scaled = F.round(F.col(value_col) * (10**decimals)).cast("long")
    digit = F.substring(scaled.cast("string"), 1, 1).cast("int")
    pos = df.filter((F.col(value_col) > 0) & (scaled >= 1)).select(digit.alias("digit"))
    counts = pos.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__total"))
    expected = F.element_at(
        F.array(*[F.lit(v) for v in BENFORD_EXPECTED_MILLI]), F.col("digit")
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            (F.col("n") / F.col("__total")).alias("share"),
            expected.alias("expected_milli"),
            F.abs(
                F.round(F.col("n") / F.col("__total") * 1000).cast("int") - expected
            ).alias("dev_milli"),
        )
    )
