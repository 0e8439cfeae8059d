"""Embedding-column quality assurance — the vector-side twin of the
tabular DQ checks (reference has no vector surface at all; SURVEY §2.8
north-star extension for embedding-backed training pipelines).

Before any dedup/ANN stage consumes an ``array<float>`` column, a
pipeline must prove the column is sane: consistent dimensionality, no
NaN/Inf payloads, no silent all-zero vectors (a classic upstream
encoder-failure symptom), and a plausible norm distribution.

Everything here is higher-order Column functions (``aggregate`` /
``exists`` / ``size``) — JVM-side, whole-stage-codegen'd, map-only
until the final bounded groupBy. Media/vector bytes are read once and
never shuffled; only the per-group integer stats move.

Hash-stability contract with the DuckDB oracle: per-vector norms are
rounded to integer MICRO-units immediately after the (deterministic,
list-ordered left fold) sum of squares, so every aggregated value the
report emits is an exact BIGINT — no cross-engine float-sum drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ssq(vec: Column) -> Column:
    """Sum of squares as a double, elements cast to double BEFORE the
    multiply (float32*float32 would round differently across engines);
    the left-fold order is the list order in both Spark and DuckDB."""
    return F.aggregate(
        vec,
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )


def norm_micro(vec: Column) -> Column:
    """L2 norm in integer micro-units: round(sqrt(ssq) * 1e6). sqrt is
    IEEE-754 correctly rounded in both JVM and C++, so the bigint is
    engine-portable."""
    return F.round(F.sqrt(_ssq(vec)) * 1_000_000).cast("long")


def embedding_qa_report(
    df: DataFrame,
    vec_col: str,
    group_col: str,
    expected_dim: int,
) -> DataFrame:
    """Per-group embedding health: ``(group, n_vecs, n_bad_dim,
    n_null_vecs, n_nan_vecs, n_zero_vecs, min_norm_micro,
    max_norm_micro, sum_norm_micro)``.

    One scan, one bounded shuffle (group cardinality). n_zero counts
    vectors whose sum of squares is exactly 0.0 — encoder dropout, not
    numeric noise.
    """
    v = F.col(vec_col)
    has_nan = F.exists(v, lambda x: F.isnan(x))
    nm = F.when(v.isNull() | has_nan, None).otherwise(norm_micro(v))
    return (
        df.select(
            F.col(group_col).alias("grp"),
            v.isNull().cast("int").alias("is_null"),
            F.when(v.isNull(), 0)
            .otherwise((F.size(v) != expected_dim).cast("int"))
            .alias("bad_dim"),
            F.coalesce(has_nan.cast("int"), F.lit(0)).alias("has_nan"),
            F.coalesce((nm == 0).cast("int"), F.lit(0)).alias("is_zero"),
            nm.alias("nm"),
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("bad_dim").cast("long").alias("n_bad_dim"),
            F.sum("is_null").cast("long").alias("n_null_vecs"),
            F.sum("has_nan").cast("long").alias("n_nan_vecs"),
            F.sum("is_zero").cast("long").alias("n_zero_vecs"),
            F.min("nm").alias("min_norm_micro"),
            F.max("nm").alias("max_norm_micro"),
            F.sum("nm").cast("long").alias("sum_norm_micro"),
        )
        .withColumnRenamed("grp", group_col)
    )


def dim_stats(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """Per-dimension corpus statistics: (pos 0-based, n, mean, std,
    min_val, max_val) — the feature-scaling profile (detects dead
    dimensions std=0, scale imbalance, outlier dims that break absmax
    int8 quantization).

    Shape: one posexplode (rows × dim, but only (pos, val) pairs
    shuffle — 12 bytes/element, never the vectors) into a 64-group
    aggregate with map-side combine. mean/std rounded to 6 dp (double
    sums over arbitrary partition order drift in the last ulp; the
    rounding absorbs it — same contract as PSI/entropy).
    """
    exploded = df.select(
        F.posexplode(F.col(vec_col)).alias("pos", "val")
    ).select("pos", F.col("val").cast("double").alias("val"))
    return exploded.groupBy("pos").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg("val"), 6).alias("mean"),
        F.round(F.stddev_samp("val"), 6).alias("std"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


def knn_label_agreement(
    df: DataFrame,
    k: int = 5,
    probe_mod: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """k-NN label-agreement audit — the standard mislabel/leakage probe
    for labeled embedding corpora: if a vector's nearest neighbors
    rarely share its label, either the labels or the encoder are
    suspect for that class.

    A deterministic 1/``probe_mod`` probe sample (``id % probe_mod ==
    0``) queries exact top-``k`` cosine neighbors (Arrow block matmul,
    :func:`~.similarity.cosine_topk_blocked`); per-label output:
    ``(label, n_queries, n_neighbors, n_same_label, agreement)``.
    Probing a sample rather than all-vs-all is the 100 TB design: the
    audit's statistical power needs thousands of probes, not N², and
    the probe set stays within the blocked top-k's bounded-query
    contract. ``agreement`` is one division of two exact integers.
    """
    from data_quality_checks_in_relational_database_spark.operators.similarity import (
        cosine_topk_blocked,
    )

    queries = df.filter(F.col(id_col) % probe_mod == 0)
    nn = cosine_topk_blocked(df, queries, k=k, vec_col=vec_col, id_col=id_col)
    q_lab = df.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("q_label")
    )
    n_lab = df.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("n_label")
    )
    per = nn.join(q_lab, "query_id").join(n_lab, "neighbor_id")
    return (
        per.groupBy(F.col("q_label").alias(label_col))
        .agg(
            F.count_distinct("query_id").alias("n_queries"),
            F.count(F.lit(1)).alias("n_neighbors"),
            F.sum((F.col("n_label") == F.col("q_label")).cast("long"))
            .cast("long")
            .alias("n_same_label"),
        )
        .withColumn("agreement", F.col("n_same_label") / F.col("n_neighbors"))
    )


def standardize(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """Z-score standardization per dimension: v'_d = (v_d - mean_d) /
    std_d — the feature-scaling step before distance-based training /
    clustering. The 64-row stats frame broadcasts as two literal-ish
    arrays; the normalization itself is one map-only transform (dead
    dims std=0 pass through unscaled rather than dividing by zero).

    Returns (id, vec standardized array<double>).
    """
    stats = dim_stats(df, vec_col, id_col).orderBy("pos").collect()
    means = F.array(*[F.lit(float(r.mean)) for r in stats])
    stds = F.array(*[F.lit(float(r.std) if r.std else 1.0) for r in stats])
    norm = F.zip_with(
        F.zip_with(F.col(vec_col), means, lambda x, m: x.cast("double") - m),
        stds,
        lambda centered, s: centered / s,
    )
    return df.select(F.col(id_col), norm.alias(vec_col))
