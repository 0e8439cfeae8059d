"""Multi-dimensional file layout — Z-order (Morton) clustering keys.

At 100 TB the dominant read cost is how many row groups a filter must
touch. Range-partitioning on ONE column makes filters on that column
cheap and every other filter a full scan; sorting by an interleaved
Z-order key of the 2-4 hottest filter columns gives every one of them
partial min/max locality, which is what parquet row-group stats and
lakehouse data-skipping indexes consume. (Same trick Delta/Iceberg
expose as ``OPTIMIZE ... ZORDER BY``; here it is a plain column
expression usable with ``df.repartitionByRange(zkey).sortWithinPartitions``
before any parquet write.)

Pure JVM bit arithmetic — no UDF, no shuffle of its own.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton/Z-order key: interleave the low ``bits`` bits of each
    (non-negative integer) column, first column in the least
    significant lane. ``len(cols) * bits`` must fit in 63 bits.

    Inputs are clamped into [0, 2^bits) (values above the range keep
    their low bits' locality contract only if the caller pre-buckets —
    see :func:`zorder_key`). NULL in any column yields NULL (sort
    last / dedicated partition).
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed 64-bit key")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    key: Column = F.lit(0).cast("long")
    mask = (1 << bits) - 1
    for j, c in enumerate(cs):
        v = c.cast("long").bitwiseAND(F.lit(mask))
        for i in range(bits):
            bit = F.shiftright(v, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j))
    return key


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
) -> Column:
    """Z-order key over arbitrary numeric columns: each column is
    bucketed into its [min, max] range scaled to 2^bits equal-width
    buckets (one tiny stats aggregation, broadcast back by the caller's
    plan as a scalar subquery-free literal expression via
    ``df.agg(...).collect()`` — bounded, one row), then interleaved.

    Returns the key COLUMN to use as
    ``df.repartitionByRange(n, key).sortWithinPartitions(key)`` before
    writing. Collecting the 1-row min/max frame is the documented
    bounded driver pull (same contract as the similarity query sets).
    """
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    scaled: list[Column] = []
    top = (1 << bits) - 1
    for i, c in enumerate(cols):
        mn, mx = stats[f"mn_{i}"], stats[f"mx_{i}"]
        span = (mx - mn) or 1.0
        scaled.append(
            F.least(
                F.lit(top),
                F.floor((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * (1 << bits)).cast(
                    "long"
                ),
            )
        )
    return interleave_bits(scaled, bits)
