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
from pyspark.sql.window import Window


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
    # ONE select over the single wide row emits every column's profile
    # row (inline of a struct array) — a per-column wide.select would
    # re-run the whole multi-distinct aggregation once per column
    profile_rows = F.array(
        *[
            F.struct(
                F.lit(table_name).alias("table_name"),
                F.lit(f.name).alias("column"),
                F.lit(f.dataType.simpleString()).alias("dtype"),
                F.col("__n").alias("n_rows"),
                F.col(f"nn{i}").cast("long").alias("n_nulls"),
                F.col(f"nd{i}").cast("long").alias("n_distinct"),
                F.col(f"mn{i}").alias("min_value"),
                F.col(f"mx{i}").alias("max_value"),
            )
            for i, f in enumerate(df.schema.fields)
        ]
    )
    return wide.select(F.inline(profile_rows))


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


def iqr_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: float = 1.5,
) -> DataFrame:
    """Tukey-fence outlier report per group: count values outside
    [q1 - k*IQR, q3 + k*IQR] with exact interpolated quartiles.

    Output: (group, n, q1, q3, n_low, n_high) — quartiles rounded to
    6 dp for the report; the fences the counts use are the UNROUNDED
    values (rounding the fence would shift boundary rows).

    Shape: one grouped percentile aggregate (sort-based exact — swap
    approx_percentile at 100 TB, documented tradeoff), broadcast-joined
    back by group, then one grouped count pass. Two scans total, both
    map-side combined.
    """
    v = F.col(value_col).cast("double")
    qs = df.groupBy(F.col(group_col).alias("g")).agg(
        F.expr(f"percentile({value_col}, 0.25)").alias("q1"),
        F.expr(f"percentile({value_col}, 0.75)").alias("q3"),
    )
    lo = F.col("q1") - k * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + k * (F.col("q3") - F.col("q1"))
    return (
        df.join(F.broadcast(qs), F.col(group_col) == F.col("g"))
        .groupBy(F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.first("q1"), 6).alias("q1"),
            F.round(F.first("q3"), 6).alias("q3"),
            F.sum((v < lo).cast("long")).cast("long").alias("n_low"),
            F.sum((v > hi).cast("long")).cast("long").alias("n_high"),
        )
    )


def categorical_entropy(
    df: DataFrame,
    cat_col: str,
    group_col: str,
) -> DataFrame:
    """Shannon entropy (nats) of a categorical column per group — the
    one-number summary of label balance (0 = degenerate single value;
    ln(k) = uniform over k values). A collapsed-diversity alarm for
    partitioned feeds: a source whose lang/entity mix suddenly
    flattens shows up here before any per-value rule fires.

    Output: (group, n, n_cats, entropy) with entropy =
    -sum(p * ln p) rounded to 6 dp, p from exact integer counts. Two
    bounded grouped aggregations (value-level then group-level) — no
    windows, no collect.
    """
    counts = (
        df.filter(F.col(cat_col).isNotNull())
        .groupBy(F.col(group_col).alias("g"), F.col(cat_col).alias("c"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = counts.groupBy("g").agg(F.sum("n").alias("tot"))
    p = F.col("n") / F.col("tot")
    return (
        counts.join(F.broadcast(tot), "g")
        .groupBy(F.col("g").alias(group_col))
        .agg(
            F.max("tot").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("n_cats"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        )
    )


def mutual_information(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Mutual information between two categorical columns — the
    dependence audit behind redundant-feature detection and
    leakage hunting (MI ≈ 0 → independent; MI ≈ min(H_a, H_b) → one
    column determines the other). The per-cell decomposition of
    :func:`categorical_entropy`'s cross-column sibling (Deequ exposes
    the same statistic as ``MutualInformation``).

    Output: one row per observed (a, b) cell —
    (a, b, n, p_ab, mi_term) with
    ``mi_term = p_ab · ln(p_ab / (p_a · p_b))`` from exact integer
    counts, 6-dp rounded; total MI = SUM(mi_term), output bounded by
    |A|·|B|. NULL in either column excludes the row (MI is defined
    over observed pairs).

    Scale shape: one contingency aggregation (map-side combined), two
    bounded marginal aggregations derived FROM the contingency table
    (never a second scan), broadcast-joined back.
    """
    from pyspark.storagelevel import StorageLevel

    # pin the bounded |A|·|B| contingency table: marginals, totals and
    # the final projection all derive from it — unpinned, each consumer
    # re-scans the raw input
    cells = (
        df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ma = cells.groupBy("a").agg(F.sum("n").alias("n_a"))
    mb = cells.groupBy("b").agg(F.sum("n").alias("n_b"))
    tot = cells.agg(F.sum("n").cast("double").alias("t"))
    p_ab = F.col("n").cast("double") / F.col("t")
    p_a = F.col("n_a").cast("double") / F.col("t")
    p_b = F.col("n_b").cast("double") / F.col("t")
    return (
        cells.join(F.broadcast(ma), "a")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            "n",
            F.round(p_ab, 6).alias("p_ab"),
            F.round(p_ab * F.log(p_ab / (p_a * p_b)), 6).alias("mi_term"),
        )
    )


def pattern_profile(
    df: DataFrame,
    cols: list[str],
    top_k: int = 5,
) -> DataFrame:
    """Format-shape profiling: collapse every value to its character
    SHAPE (digits → ``9``, lowercase → ``a``, uppercase → ``A``,
    everything else kept verbatim) and report each column's dominant
    shapes — the "what formats live in this column" answer that
    catches mixed date formats, stray whitespace, or a second id
    scheme hiding in a clean-looking column.

    Output: (column, shape, n, share, rank), top_k shapes per column
    by (n DESC, shape ASC); share is a ratio of exact integer counts,
    6-dp. NULLs are excluded (completeness is a different report).

    Scale shape: columns stack to (column, shape) long form in one
    scan (the shape collapse is three codegen'd regexp_replace passes),
    aggregate to bounded (column, shape) counts, rank with a keyed
    window over that bounded table.
    """
    shape = lambda c: F.regexp_replace(
        F.regexp_replace(F.regexp_replace(c, "[0-9]", "9"), "[a-z]", "a"),
        "[A-Z]",
        "A",
    )
    stack_args = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in cols)
    stacked = df.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (column, value)"
    ).filter(F.col("value").isNotNull())
    from pyspark.storagelevel import StorageLevel

    # pin the bounded (column, shape) table — per-column totals and the
    # rank window both consume it
    counts = (
        stacked.select("column", shape(F.col("value")).alias("shape"))
        .groupBy("column", "shape")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tot = counts.groupBy("column").agg(F.sum("n").alias("tot"))
    w = Window.partitionBy("column").orderBy(F.col("n").desc(), F.col("shape").asc())
    return (
        counts.join(F.broadcast(tot), "column")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select(
            "column",
            "shape",
            "n",
            F.round(F.col("n") / F.col("tot"), 6).alias("share"),
            "rank",
        )
    )
