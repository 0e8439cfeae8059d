"""Z-order layout key: bit-interleave correctness vs a Python
reference, and the locality property the layout exists for."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.operators.layout import (
    interleave_bits,
    zorder_key,
)


def _morton2(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_interleave_matches_python_reference(spark):
    rows = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 5)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", interleave_bits(["x", "y"], bits=8)).collect()
    }
    assert got == {(x, y): _morton2(x, y, 8) for x, y in rows}


def test_interleave_null_and_range_guard(spark):
    df = spark.createDataFrame([(1, None)], "x long, y long")
    assert df.withColumn("z", interleave_bits(["x", "y"], bits=8)).collect()[0].z is None
    with pytest.raises(ValueError):
        interleave_bits(["a", "b", "c", "d"], bits=16)


def test_zorder_layout_improves_2d_locality(spark):
    """The point of the layout: with a 2-d selective box filter, z-order
    sorted files have min/max stats that exclude far more files than a
    single-column linear sort. Model 16 'files' as equal slices of the
    sort order and count slices whose (x, y) min/max box intersects the
    query box."""
    import random

    random.seed(7)
    rows = [(random.randrange(4096), random.randrange(4096)) for _ in range(4096)]
    df = spark.createDataFrame(rows, "x long, y long").cache()

    from pyspark.sql.window import Window

    def files_touched(keyed_df, key):
        ranked = keyed_df.withColumn(
            "file", F.floor((F.row_number().over(Window.orderBy(key)) - 1) / 256)
        )
        stats = (
            ranked.groupBy("file")
            .agg(F.min("y").alias("y0"), F.max("y").alias("y1"))
            .collect()
        )
        return sum(1 for r in stats if not (r.y1 < 2000 or r.y0 > 2300))

    # filter on the SECOND sort dimension only — the case single-column
    # linear layout cannot skip at all (every x-slice file spans all y),
    # while z-order bounds y per file too.
    zkeyed = df.withColumn("k", zorder_key(df, ["x", "y"], bits=12))
    linear = df.withColumn("k", F.col("x"))
    z_touch, lin_touch = files_touched(zkeyed, "k"), files_touched(linear, "k")
    assert lin_touch == 16  # every file touched under linear-x layout
    # y-slab crosses one z-square row boundary → ≈2 of 4 square-rows ×
    # 4 columns ≈ 8 squares, plus file/square misalignment jitter
    assert z_touch <= 10, z_touch
