"""Hybrid-retrieval fusion query: BM25 (lexical) ⊕ exact cosine
(dense), fused by Reciprocal Rank Fusion. The oracle recomputes BOTH
retrieval systems from scratch in SQL and replays the fusion formula,
so the gate covers the whole composition, not just the final join."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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


# ---------------------------------------------------------------------------
# Retrieval quality: NDCG@k of dense retrieval vs weak labels
# ---------------------------------------------------------------------------

_NDCG_K = 5
_NDCG_PROBE_MOD = 10


def q_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@5 of the exact dense retriever against the weak relevance
    signal (neighbor shares the query's label) — the standard ranking-
    eval readout for an embedding space (Järvelin & Kekäläinen 2002).

    Per probe query (``vec_id % 10 == 0``): binary gains over its
    top-5 cosine neighbors, DCG = Σ rel_i/log2(i+1) accumulated by a
    rank-ORDERED running-sum window (both engines left-fold in the
    same order — bit-stable before the final rounding), IDCG over the
    ideal rearrangement of the same gains, NDCG = DCG/IDCG (0 when
    nothing retrieved is relevant). The retrieval is the existing
    scale-shaped top-k operator; everything downstream touches ≤ k
    rows per query."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    probes = emb.filter(F.col("vec_id") % _NDCG_PROBE_MOD == 0)
    hits = sim.cosine_topk(emb, probes, k=_NDCG_K)
    labels = emb.select(F.col("vec_id"), F.col("label"))
    scored = (
        hits.join(
            labels.select(
                F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
            ),
            "query_id",
        )
        .join(
            labels.select(
                F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "rank",
            (F.col("n_label") == F.col("q_label")).cast("int").alias("rel"),
        )
    )
    w_run = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dcg_run = F.sum(F.col("rel") / F.log2(F.col("rank") + 1)).over(w_run)
    per_q = (
        scored.withColumn("dcg_run", dcg_run)
        .groupBy("query_id")
        .agg(
            F.sum("rel").cast("long").alias("n_rel"),
            F.count(F.lit(1)).cast("long").alias("n_retrieved"),
            F.max("dcg_run").alias("dcg"),
        )
    )
    # ideal DCG for R binary gains: Σ_{i=1..R} 1/log2(i+1), folded in
    # ascending i (fixed order on both engines)
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.col("n_rel").cast("int")),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + 1),
    )
    return per_q.select(
        "query_id",
        "n_rel",
        "n_retrieved",
        (F.round("dcg", 6) + F.lit(0.0)).alias("dcg"),
        (
            F.round(
                F.when(F.col("n_rel") > 0, F.col("dcg") / idcg).otherwise(0.0), 6
            )
            + F.lit(0.0)
        ).alias("ndcg"),
    )


ORACLE_RETRIEVAL_NDCG = f"""
WITH unit AS (
    SELECT vec_id, label,
           CAST(embedding AS DOUBLE[]) AS v,
           SQRT(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings
),
scored AS (
    SELECT q.vec_id AS query_id, q.label AS q_label,
           c.vec_id AS neighbor_id, c.label AS n_label,
           ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
    FROM unit q JOIN unit c
      ON q.vec_id % {_NDCG_PROBE_MOD} = 0 AND c.vec_id != q.vec_id
),
nn AS (
    SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM scored
    ) WHERE rank <= {_NDCG_K}
),
runs AS (
    SELECT query_id,
           CASE WHEN n_label = q_label THEN 1 ELSE 0 END AS rel,
           SUM(CASE WHEN n_label = q_label THEN 1 ELSE 0 END / LOG2(rank + 1))
             OVER (PARTITION BY query_id ORDER BY rank
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dcg_run
    FROM nn
),
per_q AS (
    SELECT query_id, CAST(SUM(rel) AS BIGINT) AS n_rel,
           CAST(COUNT(*) AS BIGINT) AS n_retrieved,
           MAX(dcg_run) AS dcg
    FROM runs GROUP BY query_id
),
ideal AS (
    SELECT p.query_id,
           MAX(x.run) AS idcg
    FROM per_q p
    LEFT JOIN LATERAL (
        SELECT SUM(1.0 / LOG2(g.i + 1))
                 OVER (ORDER BY g.i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        FROM UNNEST(generate_series(1, CAST(p.n_rel AS INTEGER))) AS g(i)
    ) x ON TRUE
    GROUP BY p.query_id
)
SELECT p.query_id, p.n_rel, p.n_retrieved,
       ROUND(p.dcg, 6) + 0.0 AS dcg,
       ROUND(CASE WHEN p.n_rel > 0 THEN p.dcg / i.idcg ELSE 0.0 END, 6) + 0.0 AS ndcg
FROM per_q p JOIN ideal i USING (query_id)
"""


# ---------------------------------------------------------------------------
# Rank-biased overlap between the lexical and dense rankings (r5)
# ---------------------------------------------------------------------------

_RBO_D = 20
_RBO_P = 0.9
#: per-depth RBO weights (1-p)·p^(d-1), materialized as PYTHON doubles
#: and injected as literals into BOTH engines — no cross-engine pow()
_RBO_W = [(d, (1.0 - _RBO_P) * _RBO_P ** (d - 1)) for d in range(1, _RBO_D + 1)]


def q_rbo_rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-Biased Overlap (Webber et al., TOIS 2010) between the BM25
    lexical ranking and the exact dense-cosine ranking for the shared
    probe query — the ranking-agreement companion to ``hybrid_rrf``
    (fusion assumes the systems disagree usefully; RBO measures by how
    much, top-weighted). Emits one row per depth d ≤ 20: the overlap
    count X_d = |lex@d ∩ dense@d|, the agreement X_d/d, and the RBO
    term (1-p)·p^(d-1)·X_d/d (p=0.9; truncated RBO = Σ terms). The
    per-depth weights are injected as identical double literals on
    both engines, and each row is independently hash-checked — no
    ordered FP summation anywhere.

    Scale shape: both inputs are the retrieval operators' bounded
    top-20 lists; ranks come from ``rrf_fuse``'s k-row machinery; the
    depth grid is a 20-row broadcast joined to the ≤40-row pair frame
    (bounded BNLJ by design, allowlisted)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    lex = tx.bm25_topk(docs, BM25_QUERY, k=_RBO_D)
    dense = sim.cosine_topk(
        emb, emb.filter(F.col("vec_id") == _QUERY_VEC_ID), k=_RBO_D
    ).select(F.col("neighbor_id").alias("doc_id"), "cosine")
    fused = rrf_fuse([(lex, "bm25"), (dense, "cosine")], id_col="doc_id")
    pairs = fused.select("doc_id", "rank_0", "rank_1")
    depths = spark.createDataFrame(_RBO_W, "d int, w double")
    joined = depths.join(
        F.broadcast(pairs),
        (F.col("rank_0") <= F.col("d")) & (F.col("rank_1") <= F.col("d")),
        "left",
    )
    x = F.count("doc_id")
    return joined.groupBy("d", "w").agg(
        x.cast("long").alias("x"),
        (F.round(x.cast("double") / F.col("d").cast("double"), 6) + F.lit(0.0)).alias(
            "agreement"
        ),
        (
            F.round(
                F.col("w") * x.cast("double") / F.col("d").cast("double"), 6
            )
            + F.lit(0.0)
        ).alias("rbo_term"),
    ).select("d", "x", "agreement", "rbo_term")


def _rbo_oracle() -> str:
    bm25 = _bm25_oracle(BM25_QUERY, k=_RBO_D).strip()
    wvals = ", ".join(f"({d}, {w!r})" for d, w in _RBO_W)
    return f"""
WITH lex_list AS (
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS BIGINT)
             AS rank_0
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
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id ASC) AS BIGINT)
             AS rank_1
    FROM (SELECT * FROM dense_scored ORDER BY cosine DESC, doc_id ASC LIMIT {_RBO_D})
),
pairs AS (
    SELECT COALESCE(l.doc_id, e.doc_id) AS doc_id, l.rank_0, e.rank_1
    FROM lex_list l FULL OUTER JOIN dense_list e USING (doc_id)
),
depths(d, w) AS (VALUES {wvals})
SELECT CAST(de.d AS INTEGER) AS d,
       CAST(COUNT(p.doc_id) AS BIGINT) AS x,
       ROUND(CAST(COUNT(p.doc_id) AS DOUBLE) / CAST(de.d AS DOUBLE), 6) + 0.0
         AS agreement,
       ROUND(de.w * CAST(COUNT(p.doc_id) AS DOUBLE) / CAST(de.d AS DOUBLE), 6) + 0.0
         AS rbo_term
FROM depths de
LEFT JOIN pairs p ON p.rank_0 <= de.d AND p.rank_1 <= de.d
GROUP BY de.d, de.w
"""


ORACLE_RBO_RANKINGS = _rbo_oracle()
