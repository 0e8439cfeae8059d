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


#: Squared euclidean distance between point row ``p`` and centroid row
#: ``c`` in the k-means oracle CTEs (shared by the assignment and
#: silhouette finals).
KMEANS_D2 = (
    "list_sum([(p.v[i]-c.v[i])*(p.v[i]-c.v[i]) "
    "for i in range(1, len(p.v)+1)])"
)


def kmeans_ctes(k: int, iters: int) -> str:
    """Unrolled Lloyd replay prefix: ``WITH pts, c0, (a{i}, ex{i},
    c{i})*`` — everything up to the converged centroid table
    ``c{iters}``, so multiple oracles (assignment, silhouette) can
    append their own final SELECT. MATERIALIZED for the same
    inline-explosion reason as the PageRank oracle. The elementwise
    centroid mean rebuilds the vector with list(avg ORDER BY dim
    index); an emptied cluster keeps its previous centroid via the
    COALESCE left join."""
    d2 = KMEANS_D2
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
    return "".join(parts)


def _kmeans_oracle(k: int, iters: int) -> str:
    """Full assignment oracle: converged-centroid CTEs + nearest-
    centroid final (ties → lowest cluster index, matching
    ``kmeans_assign``'s argmin)."""
    d2 = KMEANS_D2
    return (
        kmeans_ctes(k, iters)
        + f"""
SELECT vec_id, cid AS cluster, ROUND(SQRT(d2), 6) + 0.0 AS dist FROM (
    SELECT p.vec_id, c.cid, {d2} AS d2,
           ROW_NUMBER() OVER (PARTITION BY p.vec_id
                              ORDER BY {d2} ASC, c.cid ASC) AS rn
    FROM pts p, c{iters} c
) WHERE rn = 1
"""
    )


ORACLE_KMEANS_CLUSTERS = _kmeans_oracle(_K, _ITERS)


def q_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN over the embedding column (cosine ≥ 0.4 neighborhoods,
    min_pts=3): per-vector role (core/border/noise), ε-degree, and
    cluster id. Pairs from the distributed blocked all-pairs join;
    components via the size-adaptive engine; border assignment pinned
    to the MIN core-neighbor cluster."""
    from data_quality_checks_in_relational_database_spark.operators.density import dbscan

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return dbscan(emb, eps_cosine=0.4, min_pts=3)


def _dbscan_oracle(threshold: float) -> str:
    return f"""
WITH RECURSIVE unit AS (
    SELECT vec_id,
           CAST(embedding AS DOUBLE[]) AS v,
           SQRT(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings
),
pairs AS (
    SELECT a.vec_id AS pa, b.vec_id AS pb
    FROM unit a JOIN unit b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= {threshold}
),
sym AS (
    SELECT pa AS s, pb AS t FROM pairs
    UNION ALL
    SELECT pb, pa FROM pairs
),
deg AS (
    SELECT e.vec_id AS node, CAST(COALESCE(d.n, 0) AS BIGINT) AS n_neighbors
    FROM embeddings e
    LEFT JOIN (SELECT s, COUNT(*) AS n FROM sym GROUP BY s) d ON d.s = e.vec_id
),
core AS (SELECT node FROM deg WHERE n_neighbors + 1 >= 3),
core_edges AS (
    SELECT p.pa AS src, p.pb AS dst
    FROM pairs p
    JOIN core c1 ON p.pa = c1.node
    JOIN core c2 ON p.pb = c2.node
),
both_dir AS (
    SELECT src, dst FROM core_edges
    UNION ALL
    SELECT dst, src FROM core_edges
),
reach(node, label) AS (
    SELECT DISTINCT src, src FROM both_dir
    UNION
    SELECT e.src, r.label FROM both_dir e JOIN reach r ON e.dst = r.node
),
comp AS (SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY node),
core_clusters AS (
    SELECT c.node AS core_id, COALESCE(m.cluster_id, c.node) AS cluster_id
    FROM core c LEFT JOIN comp m ON m.node = c.node
),
border AS (
    SELECT s.s AS node, MIN(cc.cluster_id) AS cluster_id
    FROM sym s JOIN core_clusters cc ON s.t = cc.core_id
    WHERE s.s NOT IN (SELECT node FROM core)
    GROUP BY s.s
),
labeled AS (
    SELECT core_id AS node, 'core' AS role, cluster_id FROM core_clusters
    UNION ALL
    SELECT node, 'border', cluster_id FROM border
)
SELECT d.node AS vec_id, d.n_neighbors,
       COALESCE(l.role, 'noise') AS role,
       CAST(l.cluster_id AS BIGINT) AS cluster_id
FROM deg d LEFT JOIN labeled l ON l.node = d.node
"""


ORACLE_DBSCAN_CLUSTERS = _dbscan_oracle(0.4)


def q_dbscan_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-candidate twin of ``dbscan_clusters``: the ε-pair stage is
    banded SRP candidates + exact verify (settings and the recall-1.0
    pin shared with the semantic_* twins via
    ``pipeline_queries._lsh_pairs``); degrees/roles/components/borders
    identical, so the output hash-matches the exact-form oracle at the
    twin threshold."""
    from data_quality_checks_in_relational_database_spark.operators.density import dbscan
    from data_quality_checks_in_relational_database_spark.plans.pipeline_queries import (
        _LSH_THR,
        _lsh_pairs,
    )

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return dbscan(
        emb, eps_cosine=_LSH_THR, min_pts=3, neighbor_pairs=_lsh_pairs(emb)
    )


def _oracle_dbscan_lsh() -> str:
    from data_quality_checks_in_relational_database_spark.plans.pipeline_queries import _LSH_THR

    return _dbscan_oracle(_LSH_THR)


ORACLE_DBSCAN_LSH = _oracle_dbscan_lsh()
