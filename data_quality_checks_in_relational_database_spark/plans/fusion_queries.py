"""Hybrid-retrieval fusion query: BM25 (lexical) ⊕ exact cosine
(dense), fused by Reciprocal Rank Fusion. The oracle recomputes BOTH
retrieval systems from scratch in SQL and replays the fusion formula,
so the gate covers the whole composition, not just the final join."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.operators import similarity as sim
from data_quality_checks_in_relational_database_spark.operators import text as tx
from data_quality_checks_in_relational_database_spark.operators.fusion import rrf_fuse
from data_quality_checks_in_relational_database_spark.plans.extension_queries import (
    BM25_QUERY,
    _bm25_oracle,
)
from data_quality_checks_in_relational_database_spark.session import load_tables

_K_CAND = 50  # per-system candidate depth
_K0 = 60  # RRF constant (Cormack et al.)
_TOP = 20
_QUERY_VEC_ID = 0  # deterministic dense query: the corpus's vector 0


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 hybrid retrieval: BM25 top-50 for the fixed term query ⊕
    exact cosine top-50 around vector 0 (doc ids and vec ids share the
    synthetic id space), RRF-fused with k0=60. Each side's heavy work
    is the already-scale-shaped retrieval operator; the fusion joins
    two 50-row lists."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    lex = tx.bm25_topk(docs, BM25_QUERY, k=_K_CAND)
    dense = sim.cosine_topk(
        emb, emb.filter(F.col("vec_id") == _QUERY_VEC_ID), k=_K_CAND
    ).select(F.col("neighbor_id").alias("doc_id"), "cosine")
    fused = rrf_fuse([(lex, "bm25"), (dense, "cosine")], id_col="doc_id", k0=_K0)
    return (
        fused.select(
            "doc_id",
            "rrf",
            F.col("rank_0").alias("lex_rank"),
            F.col("rank_1").alias("dense_rank"),
        )
        .orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
        .limit(_TOP)
    )


def _hybrid_oracle() -> str:
    bm25 = _bm25_oracle(BM25_QUERY, k=_K_CAND).strip().rstrip()
    return f"""
WITH lex_list AS (
    SELECT doc_id, bm25,
           CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS BIGINT)
             AS lex_rank
    FROM ({bm25})
),
unit AS (
    SELECT vec_id,
           CAST(embedding AS DOUBLE[]) AS v,
           SQRT(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings
),
qv AS (SELECT v, nrm FROM unit WHERE vec_id = {_QUERY_VEC_ID}),
dense_scored AS (
    SELECT u.vec_id AS doc_id,
           ROUND(list_dot_product(u.v, q.v) / (u.nrm * q.nrm), 6) AS cosine
    FROM unit u, qv q
    WHERE u.vec_id != {_QUERY_VEC_ID}
),
dense_list AS (
    SELECT doc_id, cosine,
           CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id ASC) AS BIGINT)
             AS dense_rank
    FROM dense_scored
    ORDER BY cosine DESC, doc_id ASC
    LIMIT {_K_CAND}
),
fused AS (
    SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
           ROUND(COALESCE(1.0 / ({_K0} + l.lex_rank), 0)
                 + COALESCE(1.0 / ({_K0} + d.dense_rank), 0), 6) AS rrf,
           l.lex_rank, d.dense_rank
    FROM lex_list l FULL OUTER JOIN dense_list d USING (doc_id)
)
SELECT doc_id, rrf, lex_rank, dense_rank
FROM fused
ORDER BY rrf DESC, doc_id ASC
LIMIT {_TOP}
"""


ORACLE_HYBRID_RRF = _hybrid_oracle()
