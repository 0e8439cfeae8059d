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
