"""Two-phase range-bucketed running totals (scale-safe cumulative).

A cumulative sum ordered by a value column is the core of KS / W1 drift
and exact distribution-counting quantiles. The naive plan —
``Window.orderBy(v)`` with no partition — moves EVERY distinct value to
one partition: fine when the value domain is bounded (integer cents,
token counts), quadratic-memory wrong for a continuous double column
whose distinct cardinality ≈ row count. This module implements the
textbook two-phase fix (the r4 verdict's ask, previously only
documented on ``exact_global_quantiles``):

1. bucket by EXPLICIT approx-quantile boundaries collected once to the
   driver (≤ num_buckets-1 doubles, a bounded pull) and embedded as an
   array literal — NOT ``repartitionByRange`` + ``spark_partition_id``:
   the bucketed frame is consumed by TWO subtrees (per-bucket totals
   and per-row windows), and a range exchange that materializes twice
   can sample DIFFERENT boundaries per materialization (exchange reuse
   is an optimization, not a guarantee), silently skewing every offset
   after the first divergent boundary. Literal boundaries make the
   bucket id a pure deterministic expression, identical in both
   subtrees by construction;
2. per-bucket running totals via a PARTITIONED window
   (``partitionBy(bucket).orderBy(v)`` — each bucket sorts only its own
   slice, spilling locally if needed);
3. bucket OFFSETS (sum of all earlier buckets) from a bounded
   ``collect_list`` of per-bucket totals — ≤ ``num_buckets`` structs in
   one row, prefix-summed with ``transform``/``aggregate`` expressions
   and posexploded back, broadcast onto the bucketed rows.

The global ordered window never materializes; no unpartitioned
WindowExec appears in the plan. Output is IDENTICAL to the naive plan
(bucket boundaries cancel out of the arithmetic), so existing oracles
are unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bucketed_cumulative(
    df: DataFrame,
    value_col: str,
    count_cols: Sequence[str],
    num_buckets: int = 64,
    lead_value: bool = False,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Running totals of ``count_cols`` ordered by ``value_col``
    (then ``tiebreak_col`` when given).

    Returns the input columns plus, per count column ``c``:
    ``cum_<c>`` (running total, rows ordered by ``value_col``) and
    ``n_<c>`` (grand total), and — when ``lead_value`` — ``next_v``
    (the next row's value in global ``value_col`` order; NULL on the
    last row), which KS/W1 use for the inter-value gap without a
    global ``lead`` window.

    Requirements: ``value_col`` must be non-NULL and unique per row
    (callers aggregate to per-value counts first — that is also what
    bounds the data this operator touches) — unless ``tiebreak_col``
    is given, in which case the PAIR (value, tiebreak) must be unique
    and the running totals follow the lexicographic (value, tiebreak)
    order. The tiebreak exists for rank semantics where tied values
    split deterministically (row_number, not a value-group rank):
    without it, a heavy-tie column (e.g. order counts, where millions
    of rows share one value) cannot be split by value boundaries and
    one bucket swallows the whole tied group — the exact single-
    reducer sort this operator exists to avoid. With a tiebreak, the
    bucket boundaries cut a COMPOSITE ``value·2⁴⁰ + tiebreak`` double,
    which CAN split ties; the within-bucket window still compares the
    original integer pair exactly, so composite rounding never affects
    the output order — only where the (arbitrary, monotone) bucket
    cuts land. Contract when ``tiebreak_col`` is used: both columns
    integral, ``tiebreak ∈ [0, 2⁴⁰)`` and ``|value| < 2⁴⁵`` — then the
    rounded composite is provably monotone in the lexicographic order
    (adjacent values differ by 2⁴⁰ in the exact composite while the
    double ULP at |value·2⁴⁰| ≤ 2⁸⁵ is ≤ 2³³, so distinct values never
    reorder, and equal values order by the exactly-added tiebreak).
    """
    cc = list(count_cols)
    assert not (lead_value and tiebreak_col), (
        "lead_value is a per-VALUE gap (KS/W1); it has no meaning under "
        "a row-splitting tiebreak order"
    )
    # pin the (already per-value-bounded) input: it is consumed THREE
    # times — the boundary quantile pass below plus the per-bucket
    # totals and per-row window subtrees — and an unpinned plan would
    # recompute its whole upstream (scan + keyed aggregation) each time
    # (measured 7× wall on exact_global_quantiles at sf0.1). Purely a
    # performance pin: correctness comes from the literal boundaries,
    # which stay valid under any recompute because every upstream here
    # is deterministic.
    from pyspark import StorageLevel

    # the expression the bucket boundaries cut: the value itself, or —
    # when ranks must split ties — the composite double (monotone in
    # the lexicographic (value, tiebreak) order under the documented
    # range contract; see docstring). The expression is written over
    # the REAL input columns, never a projected alias: the bucket-id
    # lambda below closes over it, and an outer reference to a
    # withColumn alias inside a higher-order-function lambda dangles
    # when Catalyst collapses the projection (observed
    # INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND); the alias below exists only
    # for the driver-side approxQuantile call, which needs a name.
    if tiebreak_col is not None:
        cut_expr = F.col(value_col).cast("double") * float(1 << 40) + F.col(
            tiebreak_col
        ).cast("double")
    else:
        cut_expr = F.col(value_col).cast("double")
    if df.storageLevel == StorageLevel.NONE:  # caller may have pinned it
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
    # bucket id = #{boundaries strictly below v}: monotone in v, so all
    # of bucket i precedes bucket i+1 in value order — the only property
    # the offset arithmetic needs. Boundary precision does not matter
    # (any consistent monotone cut works); determinism does.
    probs = [i / num_buckets for i in range(1, num_buckets)]
    bounds = sorted(
        set(df.withColumn("_cv", cut_expr).approxQuantile(
            "_cv", probs, 1.0 / (4 * num_buckets)
        ))
        if probs
        else []
    )
    if bounds:
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        bucket_id = F.aggregate(
            barr,
            F.lit(0),
            lambda acc, b: acc + F.when(cut_expr > b, 1).otherwise(0),
        )
    else:  # num_buckets=1, constant column, or empty frame
        bucket_id = F.lit(0)
    part = df.withColumn("_b", bucket_id)

    btot = part.groupBy("_b").agg(
        *[F.sum(c).alias(f"t_{c}") for c in cc],
        F.min(value_col).alias("bmin"),
    )
    # bounded: ≤ num_buckets structs in ONE row; prefix sums + grand
    # totals as JVM-side array expressions (no window of any kind)
    off_exprs = ", ".join(
        f"aggregate(slice(arr, 1, i), 0L, (a, y) -> a + y.t_{c}) AS off_{c}"
        for c in cc
    )
    tot_exprs = ", ".join(
        f"aggregate(arr, 0L, (a, y) -> a + y.t_{c}) AS n_{c}" for c in cc
    )
    offs = (
        btot.agg(F.array_sort(F.collect_list(F.struct("_b", *[f"t_{c}" for c in cc], "bmin"))).alias("arr"))
        .select(
            F.posexplode(
                F.expr(
                    f"transform(arr, (x, i) -> struct(x._b AS _b, {off_exprs}, "
                    f"{tot_exprs}, try_element_at(arr, i + 2).bmin AS next_bmin))"
                )
            ).alias("pos", "r")
        )
        .select("r.*")
    )

    order_cols = [value_col] + ([tiebreak_col] if tiebreak_col else [])
    wb = (
        Window.partitionBy("_b")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = part.join(F.broadcast(offs), "_b")
    for c in cc:
        out = out.withColumn(f"cum_{c}", F.sum(c).over(wb) + F.col(f"off_{c}"))
    if lead_value:
        out = out.withColumn(
            "next_v",
            F.coalesce(
                F.lead(value_col).over(Window.partitionBy("_b").orderBy(value_col)),
                F.col("next_bmin"),
            ),
        )
    keep = (
        [c for c in df.columns if c != "_cv"]
        + [f"cum_{c}" for c in cc]
        + [f"n_{c}" for c in cc]
        + (["next_v"] if lead_value else [])
    )
    return out.select(*keep)
