"""Symmetric int8 embedding quantization + quantized cosine top-k.

The 100 TB story: a float32 embedding column is 4 bytes/dim; int8
quantization cuts the shuffle/cache footprint 4x and turns the inner
product into EXACT integer arithmetic. Cosine over symmetric-quantized
vectors is scale-free —

    cos_q(a, b) = qdot / sqrt(qq_a * qq_b),   qdot = sum(qa_i * qb_i)

(the per-vector scales cancel), so the entire candidate-scoring stage
is int32 math with one final division: deterministic, portable, and a
fully differential-testable "approximate" operator (unlike LSH/IVF,
quantization is a pure function of the input — the DuckDB oracle
recomputes it bit-for-bit).

Quantizer: per-vector symmetric absmax. scale = max|x| / 127,
q_i = round(x_i / scale) in [-127, 127]. round() is half-away-from-zero
on doubles in both Spark (HALF_UP on positives/negatives) and DuckDB
(std::round), so codes match across engines.

All HOF Column expressions (transform/aggregate/zip_with) — JVM-side,
codegen'd, no Python in the hot path. The top-k itself joins a bounded
broadcast query set against the corpus; for unbounded query sets use
the blocked-matmul path in operators/similarity.py with int32 BLAS.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def absmax(vec: Column) -> Column:
    return F.aggregate(
        vec,
        F.lit(0.0).cast("double"),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )


def quantize_codes(vec: Column, scale: Column) -> Column:
    """int codes round(x / scale); all-zero vectors (scale 0) map to
    all-zero codes rather than NULL/NaN."""
    return F.transform(
        vec,
        lambda x: F.when(scale == 0.0, F.lit(0)).otherwise(
            F.round(x.cast("double") / scale).cast("int")
        ),
    )


def quantize_vectors(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """(id, scale, qvec array<int>, qq bigint) — qq = sum(q^2), carried
    so downstream cosine never re-folds the codes."""
    scale = absmax(F.col(vec_col)) / 127.0
    q = quantize_codes(F.col(vec_col), scale)
    return df.select(
        F.col(id_col).alias("vec_id"),
        scale.alias("scale"),
        q.alias("qvec"),
        F.aggregate(
            q, F.lit(0).cast("long"), lambda acc, x: acc + (x * x).cast("long")
        ).alias("qq"),
    )


def quantization_summary(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """Per-vector quantization audit with scalar-only columns (gate-
    hashable): (vec_id, scale_micro, qq, sum_q, n_sat). n_sat counts
    codes at the +/-127 rails — a saturation spike means the absmax
    quantizer is clipping (outlier dimension) and the column needs
    per-dim or percentile scaling."""
    qv = quantize_vectors(df, vec_col, id_col)
    return qv.select(
        "vec_id",
        F.round(F.col("scale") * 1_000_000).cast("long").alias("scale_micro"),
        "qq",
        F.aggregate(
            F.col("qvec"), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("sum_q"),
        F.aggregate(
            F.col("qvec"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + (F.abs(x) == 127).cast("long"),
        ).alias("n_sat"),
    )


def quantized_cosine_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_ids_below: int,
    k: int,
) -> DataFrame:
    """Exact top-k under the quantized metric: (query_id, neighbor_id,
    cosine_q, rank). qdot is an exact integer zip_with fold; the only
    float op is the final division, rounded to 6 dp with id tie-breaks
    (same contract as cosine_topk). Query side is a broadcast (bounded
    by contract); per-query rank is a WindowGroupLimit-pushable
    row_number."""
    qv = quantize_vectors(df, vec_col, id_col)
    queries = qv.filter(F.col("vec_id") < query_ids_below).select(
        F.col("vec_id").alias("query_id"),
        F.col("qvec").alias("q_qvec"),
        F.col("qq").alias("q_qq"),
    )
    qdot = F.aggregate(
        F.zip_with(F.col("q_qvec"), F.col("qvec"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x.cast("long"),
    )
    scored = (
        qv.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                qdot / F.sqrt(F.col("q_qq").cast("double") * F.col("qq").cast("double")),
                6,
            ).alias("cosine_q"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_q").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
