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


def hilbert_xy2d(side: int, x: int, y: int) -> int:
    """Hilbert-curve index of cell (x, y) on a ``side``×``side`` grid
    (``side`` a power of two) — the public iterative rotate-and-fold
    algorithm (Wikipedia "Hilbert curve", convert (x,y) to d).

    Pure driver-side Python: the distributed consumer is
    :func:`hilbert_lookup`, which materializes the full grid mapping
    once and broadcast-joins it — the production shape for
    space-filling-curve clustering (Delta's liquid clustering, Iceberg
    Hilbert ordering precompute per-byte tables the same way) and it
    keeps the 8-level bit shuffle out of whole-stage codegen entirely
    (an inlined per-row expression tree would be ~1k nodes and risk
    the janino method-size cliff the bootstrap_ci fix removed).
    """
    d = 0
    s = side // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:  # rotate quadrant
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def hilbert_lookup(spark, bits: int = 8) -> DataFrame:
    """(x, y) → Hilbert-d lookup table for a 2^bits × 2^bits bucket
    grid, as a broadcastable DataFrame (columns ``hx, hy, hd``).

    At bits=8 this is 65,536 rows ≈ 1.5 MB — a textbook broadcast dim.
    Callers bucket their two hot columns into [0, 2^bits) (same
    equal-width scheme as :func:`zorder_key`) and broadcast-join to get
    the curve position; ``hd >> bits`` is then a balanced "file id"
    whose cells are spatially contiguous (Hilbert never jumps, unlike
    Morton's quadrant seams).
    """
    if bits > 12:  # 4^13 = 67M rows is no longer a broadcast dim
        raise ValueError(
            f"hilbert_lookup(bits={bits}) would materialize {4 ** bits:,} "
            "rows driver-side; keep bits <= 12 (16.7M cells) and bucket "
            "coarser, or precompute the table to a parquet dim instead"
        )
    side = 1 << bits
    rows = [
        (x, y, hilbert_xy2d(side, x, y)) for x in range(side) for y in range(side)
    ]
    return spark.createDataFrame(rows, "hx long, hy long, hd long")


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
