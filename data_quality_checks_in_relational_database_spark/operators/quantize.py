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
    so downstream cosine never re-folds the codes.

    STAGED projections matter here: ``scale`` must be materialized as
    its own column before the transform references it. Embedding the
    absmax fold inside the transform lambda makes Catalyst evaluate the
    O(dim) fold once PER ELEMENT (HOF lambdas are interpreted, not
    codegen'd) — O(dim²)/row, measured 5× slower at sf0.1. The lambda's
    multiple references to ``scale`` also keep CollapseProject from
    re-inlining it."""
    s1 = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("__v"),
        (absmax(F.col(vec_col)) / 127.0).alias("scale"),
    )
    s2 = s1.select(
        "vec_id",
        "scale",
        quantize_codes(F.col("__v"), F.col("scale")).alias("qvec"),
    )
    return s2.select(
        "vec_id",
        "scale",
        "qvec",
        F.aggregate(
            F.col("qvec"), F.lit(0).cast("long"), lambda acc, x: acc + (x * x).cast("long")
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
    cosine_q, rank) — 6 dp, id tie-breaks (same contract as
    cosine_topk).

    Physical strategy mirrors ``similarity.cosine_topk_blocked``: codes
    are computed JVM-side (so the round-half-away rule matches the
    oracle — numpy's round is half-to-even and must NOT quantize),
    the bounded query-code matrix ships in the closure, and each Arrow
    batch does one EXACT int64 matmul, emitting only its local top-k
    per query; the shuffle carries candidates, not the score matrix.
    The per-element HOF fold this replaces is interpreted (no codegen
    for lambda expressions) and measured ~8× slower at sf0.1.
    """
    import numpy as np

    qv = quantize_vectors(df, vec_col, id_col)
    q_rows = (
        qv.filter(F.col("vec_id") < query_ids_below)
        .select("vec_id", "qvec", "qq")
        .collect()
    )
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Qc = np.array([r[1] for r in q_rows], dtype=np.int64)  # (nq, dim)
    Qqq = np.array([r[2] for r in q_rows], dtype=np.float64)
    kk = k + 1  # self rows are filtered after scoring

    def score(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = _np.stack(pdf["qvec"].to_numpy()).astype(_np.int64)
            cqq = pdf["qq"].to_numpy().astype(_np.float64)
            cids = pdf["vec_id"].to_numpy()
            # exact integer inner products; the ONLY float ops are the
            # same sqrt-product division the expression form used
            S = (C @ Qc.T).astype(_np.float64)
            S /= _np.sqrt(cqq[:, None] * Qqq[None, :])
            take = min(kk, S.shape[0])
            idx = _np.argpartition(-S, take - 1, axis=0)[:take]
            yield _pd.DataFrame(
                {
                    "query_id": _np.repeat(qids, take),
                    "neighbor_id": cids[idx].T.ravel(),
                    "cosine_q": _np.take_along_axis(S, idx, axis=0).T.ravel(),
                }
            )

    cand = (
        qv.select("vec_id", "qvec", "qq")
        .mapInPandas(score, schema="query_id long, neighbor_id long, cosine_q double")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round("cosine_q", 6).alias("cosine_q"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_q").desc(), F.col("neighbor_id").asc()
    )
    return cand.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )
