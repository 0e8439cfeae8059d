"""Linear-algebra queries over the embeddings table, with DuckDB
oracles. The full-data pass is the Arrow-batched Gramian partials
reduction in :mod:`..operators.linalg`; the oracle recomputes
COVAR_POP pairwise from unnested coordinates — a completely different
evaluation order, so agreement is evidence, not tautology."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_quality_checks_in_relational_database_spark.operators.linalg import covariance_long
from data_quality_checks_in_relational_database_spark.session import load_tables


def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full d×d population covariance of the embedding column in long
    form — the statistic every whitening / PCA / Mahalanobis step
    starts from. One corpus pass (per-batch BLAS partials), B·d²
    doubles shuffled, never n·d²."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return covariance_long(emb, "embedding")


ORACLE_EMBEDDING_COVARIANCE = """
WITH u AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ex AS (
    SELECT vec_id,
           UNNEST([{'i': i, 'x': v[i]} for i in range(1, len(v) + 1)],
                  recursive := true)
    FROM u
)
SELECT CAST(a.i AS BIGINT) AS i, CAST(b.i AS BIGINT) AS j,
       ROUND(COVAR_POP(a.x, b.x), 6) + 0.0 AS cov
FROM ex a JOIN ex b USING (vec_id)
GROUP BY a.i, b.i
"""
