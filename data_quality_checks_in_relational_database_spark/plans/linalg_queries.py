"""Linear-algebra queries over the embeddings table, with DuckDB
oracles. The full-data pass is the Arrow-batched Gramian partials
reduction in :mod:`..operators.linalg`; the oracle recomputes
COVAR_POP pairwise from unnested coordinates — a completely different
evaluation order, so agreement is evidence, not tautology."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_quality_checks_in_relational_database_spark.operators.linalg import (
    covariance_long,
    kmeans_assign,
    kmeans_fit,
)
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


_K = 4
_ITERS = 4


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (k=4, exactly 4 update rounds, centroids seeded
    from the 4 smallest vec_ids) over the embedding column, then a
    map-only final assignment: (vec_id, cluster, dist). Each round is
    one Arrow pass emitting k partial (count, sum-vector) rows per
    batch; only k·d values ever reach the driver."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    cents = kmeans_fit(emb, k=_K, iters=_ITERS)
    return kmeans_assign(emb, cents)


def _kmeans_oracle(k: int, iters: int) -> str:
    """Unrolled Lloyd replay: a{i} (assignment) and c{i} (centroid)
    CTE pairs, MATERIALIZED for the same inline-explosion reason as
    the PageRank oracle. The elementwise centroid mean rebuilds the
    vector with list(avg ORDER BY dim index); an emptied cluster keeps
    its previous centroid via the COALESCE left join."""
    d2 = (
        "list_sum([(p.v[i]-c.v[i])*(p.v[i]-c.v[i]) "
        "for i in range(1, len(p.v)+1)])"
    )
    parts = [
        f"""
WITH pts AS MATERIALIZED (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
c0 AS MATERIALIZED (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, v
    FROM (SELECT vec_id, v FROM pts ORDER BY vec_id LIMIT {k})
)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
a{i} AS MATERIALIZED (
    SELECT vec_id, cid FROM (
        SELECT p.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY p.vec_id
                                  ORDER BY {d2} ASC, c.cid ASC) AS rn
        FROM pts p, c{i - 1} c
    ) WHERE rn = 1
),
ex{i} AS MATERIALIZED (
    SELECT a.cid,
           UNNEST([{{'i': i, 'x': p.v[i]}} for i in range(1, len(p.v)+1)],
                  recursive := true)
    FROM a{i} a JOIN pts p USING (vec_id)
),
c{i} AS MATERIALIZED (
    SELECT c.cid, COALESCE(m.mv, c.v) AS v
    FROM c{i - 1} c LEFT JOIN (
        SELECT cid, list(ax ORDER BY i) AS mv FROM (
            SELECT cid, i, AVG(x) AS ax FROM ex{i} GROUP BY cid, i
        ) GROUP BY cid
    ) m ON m.cid = c.cid
)"""
        )
    parts.append(
        f"""
SELECT vec_id, cid AS cluster, ROUND(SQRT(d2), 6) + 0.0 AS dist FROM (
    SELECT p.vec_id, c.cid, {d2} AS d2,
           ROW_NUMBER() OVER (PARTITION BY p.vec_id
                              ORDER BY {d2} ASC, c.cid ASC) AS rn
    FROM pts p, c{iters} c
) WHERE rn = 1
"""
    )
    return "".join(parts)


ORACLE_KMEANS_CLUSTERS = _kmeans_oracle(_K, _ITERS)
