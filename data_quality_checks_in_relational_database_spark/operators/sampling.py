"""Sampling for training-data pipelines.

Two tiers:

- :func:`stratified_sample_exact` — deterministic "n rows per stratum"
  selection, reproducible across engines and partitionings: rows are
  ranked inside each stratum by ``md5(key)`` (a uniform, engine-
  -portable pseudo-random order) and the first n kept. Because md5 is
  identical everywhere, the SAME sample comes out of Spark, DuckDB, or
  any ANSI engine — which makes a sampling operator oracle-checkable,
  normally impossible with seeded RNG sampling.
- :func:`stratified_sample_fraction` — Spark-native ``sampleBy`` (per-
  -stratum Bernoulli, no shuffle, no window): the at-scale path when
  approximate fractions are fine. Map-only; seeded but Spark-specific.

Scale notes: the exact variant is one window per stratum — a keyed
shuffle on the strata columns; skewed strata behave like any skewed
groupBy (AQE skew handling applies). n·|strata| output rows, bounded.
The fraction variant is a pure map — prefer it when exactness of the
per-stratum count doesn't matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def stratified_sample_exact(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    n_per_stratum: int,
) -> DataFrame:
    """Keep exactly min(n, |stratum|) rows per stratum, chosen by the
    md5 hash-order of ``key_col`` — deterministic, partition-invariant,
    and unbiased when keys are unrelated to row content ordering."""
    h = F.md5(F.col(key_col).cast("string"))
    w = Window.partitionBy(*strata_cols).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def stratified_sample_fraction(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling via native ``sampleBy`` — map-
    -only, shuffle-free; approximate per-stratum counts."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Reproducible global permutation for training-data export: order
    rows by ``md5(key)`` and range-partition on that hash so every
    output partition is a contiguous slice of the SAME permutation
    regardless of input layout or cluster size.

    This is the materialization step after sample/dedup: training
    loaders want data pre-shuffled on disk (sequential reads, no
    shuffle buffer), and hash-order is both uniform and re-derivable —
    re-running the export yields byte-identical file contents.
    Range partitioning samples hash boundaries, so output files are
    near-equal-sized even when the key distribution is skewed.
    """
    h = F.md5(F.col(key_col).cast("string"))
    shuffled = df.withColumn("_h", h)
    if num_partitions is not None:
        shuffled = shuffled.repartitionByRange(num_partitions, "_h")
    else:
        shuffled = shuffled.repartitionByRange("_h")
    return shuffled.sortWithinPartitions("_h").drop("_h")


def mixture_weights(
    df,
    group_col: str,
    weight_col,
    target_mix: dict[str, float],
):
    """Per-group sampling weights to hit a declared corpus mixture —
    the knob every multi-source training pipeline tunes (e.g. "web 60%,
    code 25%, reference 15%" by token share).

    ``weight_col`` is the Column whose per-group share defines the
    actual mix (token counts for LLM mixes; pass ``F.lit(1)`` for doc
    share). Output: (group, n_rows, total_weight, actual_frac,
    target_frac, sample_weight) where sample_weight = target/actual
    (apply as the per-group acceptance ratio; >1 means the group must
    be upsampled/repeated). Fractions rounded to 6 dp; groups absent
    from ``target_mix`` get target 0.

    One grouped integer aggregate + a broadcast of |groups| rows.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    per = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(weight_col).cast("long").alias("total_weight"),
    )
    target = F.lit(None).cast("double")
    expr = None
    for k, v in sorted(target_mix.items()):
        expr = (F.when(F.col("grp") == k, F.lit(float(v))) if expr is None
                else expr.when(F.col("grp") == k, F.lit(float(v))))
    target = expr.otherwise(F.lit(0.0)) if expr is not None else F.lit(0.0)
    tot = F.sum("total_weight").over(Window.partitionBy())
    actual = F.col("total_weight") / tot
    return per.select(
        F.col("grp").alias(group_col),
        "n_rows",
        "total_weight",
        F.round(actual, 6).alias("actual_frac"),
        target.alias("target_frac"),
        F.round(target / actual, 6).alias("sample_weight"),
    )


def temperature_mixture(
    df,
    group_col: str,
    weight_col,
    alpha: float = 0.3,
):
    """Temperature-scaled sampling mixture: p_i ∝ share_i^alpha — the
    standard upsampling rule for low-resource groups in multilingual /
    multi-source training mixes (alpha→1 keeps natural proportions,
    alpha→0 approaches uniform; mBERT/XLM-R use alpha ≈ 0.3-0.7).

    Output: (group, total_weight, natural_frac, sampled_frac,
    boost) where sampled_frac = natural^alpha / Σ natural^alpha and
    boost = sampled/natural (the per-group up/downsampling factor).

    Numerically cross-engine-stable: the only inputs to the float math
    are exact integer totals; pow/sum-of-|groups|-doubles happen once
    over a bounded broadcast-sized frame, rounded to 6 dp.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    per = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.sum(weight_col).cast("long").alias("total_weight")
    )
    w = Window.partitionBy()
    natural = F.col("total_weight") / F.sum("total_weight").over(w)
    # materialize the rounded natural share so the pow() input is the
    # SAME double in any engine regardless of partition-order sum drift
    staged = per.select(
        "grp", "total_weight", F.round(natural, 6).alias("natural_frac")
    )
    powed = F.pow(F.col("natural_frac"), F.lit(float(alpha)))
    sampled = powed / F.sum(powed).over(w)
    return staged.select(
        F.col("grp").alias(group_col),
        "total_weight",
        "natural_frac",
        F.round(sampled, 6).alias("sampled_frac"),
        F.round(sampled / F.col("natural_frac"), 6).alias("boost"),
    )


def weighted_sample_exact(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    k: int,
    strata: list[str] | None = None,
) -> DataFrame:
    """Weighted sampling without replacement, deterministic and
    engine-portable: Efraimidis–Spirakis A-ES with the uniform drawn
    from the row id's md5 instead of a seeded RNG.

    Each row gets ``u = (md5_60(id) + 1) / 2^60`` (uniform in (0, 1],
    identical in any md5-capable engine) and the selection key
    ``ln(u) / w`` — taking the top-``k`` keys per stratum is exactly
    weight-proportional sampling without replacement (the log-transformed
    ``u^(1/w)`` trick). Like :func:`stratified_sample_exact`, the SAME
    sample falls out of Spark and DuckDB, so a weighted sampler becomes
    oracle-checkable — impossible with ``rand()``-based designs.

    Non-positive / NULL weights are excluded (zero-weight rows must
    never be drawn). One keyed window per stratum; the top-k filter
    runs as WindowGroupLimit (per-partition heads before the shuffle).
    Output: (*strata, id, weight, rank).
    """
    from data_quality_checks_in_relational_database_spark.functions.scalars import md5_u60

    strata = strata or []
    u = (md5_u60(F.col(id_col).cast("string")) + F.lit(1)).cast("double") / float(1 << 60)
    key = F.log(u) / F.col(weight_col).cast("double")
    keyed = (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .select(*strata, F.col(id_col), F.col(weight_col), key.alias("__es_key"))
    )
    w = Window.partitionBy(*[F.col(c) for c in strata]).orderBy(
        F.col("__es_key").desc(), F.col(id_col).asc()
    )
    return (
        keyed.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .drop("__es_key")
    )


def global_row_index(
    df: DataFrame,
    order_cols: list[str],
    index_col: str = "row_idx",
) -> DataFrame:
    """Global 1-based row numbering in ``order_cols`` order WITHOUT the
    single-partition window (`row_number() OVER (ORDER BY ...)` with no
    PARTITION BY collapses all data onto one task — the classic silent
    scale killer for export numbering / stable sample ids).

    ``order_cols`` must be a TOTAL order (include a unique key last);
    ties could otherwise split across range-partition boundaries and
    make the assignment layout-dependent.

    Two-phase shape: range-partition on the order (so partition i
    holds ranks strictly before partition i+1), number rows locally
    per partition (keyed window on the partition id — never one task),
    and add per-partition offsets computed from a bounded
    #partitions-row count table (cumulative sum over a tiny window,
    broadcast back). The staged frame is pinned for CORRECTNESS, not
    just reuse: the offset table and the numbering must see the SAME
    physical partitioning, and an unpinned plan would re-evaluate the
    range exchange (AQE may re-plan it) per consumer.
    """
    from pyspark.storagelevel import StorageLevel

    staged = (
        df.repartitionByRange(*[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = staged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    # exclusive prefix sum over the bounded counts table (≤ #partitions
    # rows) as ONE collect_list + transform/aggregate expression — no
    # window node at all, so no unpartitioned WindowExec ever appears
    # in callers' plans
    offsets = (
        counts.agg(F.array_sort(F.collect_list(F.struct("_pid", "_n"))).alias("arr"))
        .select(
            F.posexplode(
                F.expr(
                    "transform(arr, (x, i) -> struct(x._pid AS _pid, "
                    "aggregate(slice(arr, 1, i), 0L, (a, y) -> a + y._n) AS _offset))"
                )
            ).alias("pos", "r")
        )
        .select("r.*")
    )
    w_local = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    return (
        staged.withColumn("_local", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(index_col, (F.col("_offset") + F.col("_local")).cast("long"))
        .drop("_pid", "_local", "_offset")
    )


def rebalance_to_min(
    df: DataFrame,
    class_col: str,
    key_col: str,
) -> DataFrame:
    """Class-balanced downsampling: every class is cut to the MINORITY
    class's size, members chosen by md5 hash-order of ``key_col`` (the
    same engine-portable pseudo-random order as
    :func:`stratified_sample_exact`, so the selected SET — not just the
    counts — is reproducible anywhere). The balancing target is
    data-dependent (min class count), carried as a 1-row broadcast.

    Output: the kept rows plus ``_class_rank`` (1-based hash rank
    inside the class). One keyed window shuffle + one bounded
    aggregate."""
    counts = df.groupBy(class_col).agg(F.count(F.lit(1)).alias("_n"))
    target = counts.agg(F.min("_n").alias("_target"))  # 1 row, broadcast
    h = F.md5(F.col(key_col).cast("string"))
    w = Window.partitionBy(class_col).orderBy(h.asc(), F.col(key_col).asc())
    ranked = df.withColumn("_class_rank", F.row_number().over(w))
    return (
        ranked.crossJoin(F.broadcast(target))
        .filter(F.col("_class_rank") <= F.col("_target"))
        .drop("_target")
    )


def negative_sample(
    cands: DataFrame,
    anchor_col: str,
    key_col: str,
    k: int,
    salt_buckets: int = 32,
) -> DataFrame:
    """Exact k smallest-by-hash rows per anchor — deterministic
    pseudo-random negative sampling for contrastive pairs. The hash is
    md5(anchor ':' key), so the sample is a pure function of the pair
    (re-runs, engines, and layouts agree row-for-row).

    Two-phase top-k, never a per-anchor window over the full corpus
    (each anchor would otherwise pull N rows into ONE task): phase 1
    ranks within (anchor, salt) buckets — a window over the salted key,
    which Spark executes with a SPILLING external sort, so executor
    memory stays bounded regardless of bucket size (r3's collect_list
    form buffered the whole bucket in one aggregation buffer) — and
    keeps rank ≤ k; the final window then runs over ≤ salt_buckets·k
    rows per anchor. Output: (anchor, rank 1..k, key, h)."""
    h = F.md5(
        F.concat_ws(
            ":", F.col(anchor_col).cast("string"), F.col(key_col).cast("string")
        )
    )
    salt = F.pmod(F.xxhash64(F.col(key_col)), F.lit(salt_buckets))
    w_salted = Window.partitionBy("__a", "__s").orderBy(
        F.col("h").asc(), F.col("key").asc()
    )
    partial = (
        cands.select(
            F.col(anchor_col).alias("__a"),
            salt.alias("__s"),
            h.alias("h"),
            F.col(key_col).alias("key"),
        )
        .withColumn("__pr", F.row_number().over(w_salted))
        .filter(F.col("__pr") <= k)
        .select("__a", "h", "key")
    )
    w = Window.partitionBy("__a").orderBy(F.col("h").asc(), F.col("key").asc())
    return (
        partial.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__a").alias(anchor_col),
            "rank",
            F.col("key").alias(key_col),
            "h",
        )
    )
