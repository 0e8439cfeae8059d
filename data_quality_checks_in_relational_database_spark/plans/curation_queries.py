"""Round-3 curation-quality queries: exact-substring duplication
coverage (Lee et al. 2022 substring dedup, hash-join form), the
t-closeness release gate (completing the k-anonymity / l-diversity
privacy trio), centroid-silhouette clustering quality, and Cohen's
kappa rater agreement between two weak labelers.

Extension family — the reference (2 pandas/MySQL DQ scripts, see
SURVEY.md §2.8) has no text/privacy/model surface; these are the
release gates a training-data curation pipeline runs at 100 TB.

Determinism contract shared with the rest of the plans package: every
emitted double is either a single division of exact integer sums or a
ROUND(.., 6) + 0.0 of a value both engines compute in the same
left-to-right order; -0.0 is canonicalized everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_quality_checks_in_relational_database_spark.operators.linalg import (
    kmeans_fit,
    kmeans_silhouette,
)
from data_quality_checks_in_relational_database_spark.operators.text import (
    hashed_linear_score,
    sliding_window_dup_report,
)
from data_quality_checks_in_relational_database_spark.plans import linalg_queries as lq
from data_quality_checks_in_relational_database_spark.plans.classifier_queries import (
    _N_BUCKETS,
    _SCORED_CTE,
)
from data_quality_checks_in_relational_database_spark.session import load_tables

# portable whitespace tokenization (same text normalization as the
# extension_queries oracles)
_TOKS = (
    "CASE WHEN length(trim(text)) = 0 THEN [] "
    "ELSE string_split_regex(trim(lower(text)), '\\s+') END"
)

_WIN_K = 8  # sliding-window width in tokens


def q_substring_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document exact-substring duplication report at k=8 token
    windows; see :func:`operators.text.sliding_window_dup_report` for
    the scale shape (hash-only shuffles, per-doc windows)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return sliding_window_dup_report(docs, k=_WIN_K)


ORACLE_SUBSTRING_DUP = f"""
WITH words AS (
    SELECT doc_id, list_filter({_TOKS}, t -> t != '') AS ws FROM documents
),
wins AS (
    SELECT doc_id, i AS pos,
           array_to_string(list_slice(ws, i, i + {_WIN_K - 1}), ' ') AS gram
    FROM words, UNNEST(generate_series(1, len(ws) - {_WIN_K - 1})) AS t(i)
),
shared AS (
    SELECT gram FROM wins GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
),
sw AS (
    SELECT w.doc_id, w.pos,
           w.pos - ROW_NUMBER() OVER (PARTITION BY w.doc_id ORDER BY w.pos) AS grp
    FROM wins w JOIN shared USING (gram)
),
isl AS (
    SELECT doc_id, grp, MIN(pos) AS p1, MAX(pos) AS p2, COUNT(*) AS nw
    FROM sw GROUP BY doc_id, grp
),
-- interval union: clamp each island's span end [p1, p2+k-1] at the
-- next island's start so overlapping spans are counted once
clamped AS (
    SELECT doc_id, nw,
           LEAST(p2 + {_WIN_K - 1},
                 COALESCE(LEAD(p1) OVER (PARTITION BY doc_id ORDER BY p1) - 1,
                          p2 + {_WIN_K - 1})) - p1 + 1 AS cov
    FROM isl
),
per_doc AS (
    SELECT doc_id, COUNT(*) AS n_islands,
           SUM(cov) AS covered, SUM(nw) AS nshared
    FROM clamped GROUP BY doc_id
)
SELECT w.doc_id,
       CAST(len(w.ws) AS BIGINT) AS n_tokens,
       CAST(GREATEST(len(w.ws) - {_WIN_K - 1}, 0) AS BIGINT) AS n_windows,
       CAST(COALESCE(p.nshared, 0) AS BIGINT) AS n_shared_windows,
       CAST(COALESCE(p.n_islands, 0) AS BIGINT) AS n_islands,
       CAST(COALESCE(p.covered, 0) AS BIGINT) AS covered_tokens,
       ROUND(CASE WHEN len(w.ws) > 0
                  THEN CAST(COALESCE(p.covered, 0) AS DOUBLE) / len(w.ws)
                  ELSE 0.0 END, 6) + 0.0 AS dup_coverage
FROM words w LEFT JOIN per_doc p USING (doc_id)
"""


_T_BUCKET_WIDTH = 2000.0  # account-balance bucket width (ordered sensitive attr)
_T_THRESHOLD = 0.2


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit: per quasi-identifier equivalence class
    (nation × market segment), the Earth Mover's Distance between the
    class' distribution of the ORDERED sensitive attribute (account
    balance, fixed-width buckets) and the global distribution —
    EMD(P,Q) = sum_j |cumsum(P-Q)_j| / (m-1) for ordered buckets (Li
    et al. 2007). Classes with EMD > t leak attribute information even
    when k-anonymity and l-diversity pass.

    Exactness: the cumulative differences are accumulated as INTEGER
    counts scaled by N_class·N_total (DECIMAL(38,0) so petabyte row
    counts can't overflow), with ONE double division at the end — the
    EMD is bit-identical under any partitioning. All inputs are
    bounded aggregates (classes × buckets grid, ~125×6 rows), so the
    dense-grid cross join is broadcast trivia, not data movement."""
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    rows = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(_T_BUCKET_WIDTH)).cast("long").alias("b"),
    )
    cls_bucket = rows.groupBy("c_nationkey", "c_mktsegment", "b").agg(
        F.count(F.lit(1)).alias("n_cb")
    )
    classes = rows.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_c")
    )
    glob = rows.groupBy("b").agg(F.count(F.lit(1)).alias("g_b"))
    tot = rows.agg(
        F.count(F.lit(1)).alias("n_tot"), F.count_distinct("b").alias("m")
    )
    # dense class × bucket grid (both sides bounded aggregates)
    grid = (
        classes.crossJoin(F.broadcast(glob))
        .join(cls_bucket, ["c_nationkey", "c_mktsegment", "b"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "b",
            "n_c",
            "n_tot",
            "m",
            # scaled p-q difference: n_cb*N - g_b*N_c  (exact integer)
            (
                F.coalesce("n_cb", F.lit(0)).cast("decimal(38,0)")
                * F.col("n_tot").cast("decimal(38,0)")
                - F.col("g_b").cast("decimal(38,0)")
                * F.col("n_c").cast("decimal(38,0)")
            ).alias("d_scaled"),
        )
    )
    w = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.withColumn("cum", F.sum("d_scaled").over(w))
    per_class = cum.groupBy("c_nationkey", "c_mktsegment", "n_c", "n_tot", "m").agg(
        F.sum(F.abs(F.col("cum"))).alias("emd_scaled")
    )
    return per_class.select(
        F.concat_ws(
            "|", F.col("c_nationkey").cast("string"), "c_mktsegment"
        ).alias("qi"),
        F.col("n_c").cast("long").alias("class_size"),
        (
            # single exact-integer division (deliberately un-rounded:
            # identical doubles on both engines; rounding could land on
            # a decimal boundary where engines' rounding rules differ)
            F.when(
                F.col("m") > 1,
                F.col("emd_scaled").cast("double")
                / (
                    F.col("n_c").cast("double")
                    * F.col("n_tot").cast("double")
                    * (F.col("m") - F.lit(1)).cast("double")
                ),
            ).otherwise(F.lit(0.0))
            + F.lit(0.0)
        ).alias("emd"),
    ).withColumn("violates_t", F.col("emd") > F.lit(_T_THRESHOLD))


ORACLE_T_CLOSENESS = f"""
WITH rows_b AS (
    SELECT c_nationkey, c_mktsegment,
           CAST(FLOOR(c_acctbal / {_T_BUCKET_WIDTH}) AS BIGINT) AS b
    FROM customer
),
cls_bucket AS (
    SELECT c_nationkey, c_mktsegment, b, COUNT(*) AS n_cb
    FROM rows_b GROUP BY 1, 2, 3
),
classes AS (
    SELECT c_nationkey, c_mktsegment, COUNT(*) AS n_c FROM rows_b GROUP BY 1, 2
),
gdist AS (SELECT b, COUNT(*) AS g_b FROM rows_b GROUP BY 1),
tot AS (SELECT COUNT(*) AS n_tot, COUNT(DISTINCT b) AS m FROM rows_b),
grid AS (
    SELECT c.c_nationkey, c.c_mktsegment, g.b, c.n_c, t.n_tot, t.m,
           CAST(COALESCE(cb.n_cb, 0) AS DECIMAL(38,0)) * t.n_tot
             - CAST(g.g_b AS DECIMAL(38,0)) * c.n_c AS d_scaled
    FROM classes c CROSS JOIN gdist g
    LEFT JOIN cls_bucket cb
      ON cb.c_nationkey = c.c_nationkey
     AND cb.c_mktsegment = c.c_mktsegment AND cb.b = g.b
    CROSS JOIN tot t
),
cum AS (
    SELECT *, SUM(d_scaled) OVER (
        PARTITION BY c_nationkey, c_mktsegment ORDER BY b
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS cum
    FROM grid
),
per_class AS (
    SELECT c_nationkey, c_mktsegment, n_c, n_tot, m,
           SUM(ABS(cum)) AS emd_scaled
    FROM cum GROUP BY 1, 2, 3, 4, 5
)
SELECT CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment AS qi,
       CAST(n_c AS BIGINT) AS class_size,
       CASE WHEN m > 1 THEN
            CAST(emd_scaled AS DOUBLE)
            / (CAST(n_c AS DOUBLE) * CAST(n_tot AS DOUBLE) * (m - 1))
       ELSE 0.0 END + 0.0 AS emd,
       CASE WHEN m > 1 THEN
            CAST(emd_scaled AS DOUBLE)
            / (CAST(n_c AS DOUBLE) * CAST(n_tot AS DOUBLE) * (m - 1))
       ELSE 0.0 END + 0.0 > {_T_THRESHOLD} AS violates_t
FROM per_class
"""


def q_kmeans_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-point centroid silhouette against the SAME converged
    centroids as ``kmeans_clusters`` (k=4, 4 Lloyd rounds, lowest-id
    seeds) — the clustering-quality gate run after every re-fit.
    Map-only: one Arrow pass, no shuffle."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    cents = kmeans_fit(emb, k=lq._K, iters=lq._ITERS)
    return kmeans_silhouette(emb, cents)


ORACLE_KMEANS_SILHOUETTE = (
    lq.kmeans_ctes(lq._K, lq._ITERS)
    + f""",
dmat AS (
    SELECT p.vec_id, c.cid, SQRT({lq.KMEANS_D2}) AS d,
           ROW_NUMBER() OVER (PARTITION BY p.vec_id
                              ORDER BY {lq.KMEANS_D2} ASC, c.cid ASC) AS rn
    FROM pts p, c{lq._ITERS} c
),
ab AS (
    SELECT vec_id,
           MAX(CASE WHEN rn = 1 THEN cid END) AS cluster,
           MAX(CASE WHEN rn = 1 THEN d END) AS a,
           MIN(CASE WHEN rn > 1 THEN d END) AS b
    FROM dmat GROUP BY vec_id
)
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
       ROUND(a, 6) + 0.0 AS a_dist,
       ROUND(b, 6) + 0.0 AS b_dist,
       ROUND(CASE WHEN GREATEST(a, b) > 0
                  THEN (b - a) / GREATEST(a, b) ELSE 0.0 END, 6) + 0.0
         AS silhouette
FROM ab
"""
)


def q_rater_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two weak labelers over the corpus — the
    inter-annotator-agreement gate label pipelines run before trusting
    auto-labels: rater A = the language-ID weak label (lang = 'en'),
    rater B = the hashed linear quality classifier (score >= 0, NULL
    score → negative). Chance-corrected agreement from ONE wide
    aggregate of integer counts; po/pe/kappa are single divisions of
    exact integer products (DECIMAL(38,0) against petabyte-scale n²
    overflow)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    # one corpus scan: the label rides keep_cols, no id re-join (r9)
    scored = hashed_linear_score(docs, n_buckets=_N_BUCKETS, keep_cols=["lang"])
    lab = scored.select(
        (F.col("lang") == "en").alias("a"),
        F.coalesce(F.col("score") >= 0, F.lit(False)).alias("b"),
    )
    c = lab.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("a") & F.col("b"), 1).otherwise(0)).alias("n11"),
        F.sum(F.when(F.col("a") & ~F.col("b"), 1).otherwise(0)).alias("n10"),
        F.sum(F.when(~F.col("a") & F.col("b"), 1).otherwise(0)).alias("n01"),
        F.sum(F.when(~F.col("a") & ~F.col("b"), 1).otherwise(0)).alias("n00"),
    )
    d = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    pe_num = (d("n11") + d("n10")) * (d("n11") + d("n01")) + (
        d("n01") + d("n00")
    ) * (d("n10") + d("n00"))
    kap_num = d("n") * (d("n11") + d("n00")) - pe_num
    kap_den = d("n") * d("n") - pe_num
    return c.select(
        F.col("n").cast("long").alias("n_docs"),
        (F.col("n11") + F.col("n00")).cast("long").alias("n_agree"),
        # single exact-integer divisions — bit-identical across
        # engines, deliberately NOT rounded (rounding a value that can
        # sit exactly on a decimal boundary diverges between Spark's
        # BigDecimal HALF_UP and DuckDB's binary rounding)
        (
            (F.col("n11") + F.col("n00")).cast("double") / F.col("n")
            + F.lit(0.0)
        ).alias("po"),
        (
            pe_num.cast("double") / (d("n") * d("n")).cast("double")
            + F.lit(0.0)
        ).alias("pe"),
        (
            F.try_divide(kap_num.cast("double"), kap_den.cast("double"))
            + F.lit(0.0)
        ).alias("kappa"),
    )


ORACLE_RATER_KAPPA = f"""
WITH {_SCORED_CTE},
lab AS (
    SELECT (lang = 'en') AS a, COALESCE(score >= 0, FALSE) AS b FROM scored
),
c AS (
    SELECT COUNT(*) AS n,
           SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS n11,
           SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS n10,
           SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS n01,
           SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS n00
    FROM lab
)
SELECT CAST(n AS BIGINT) AS n_docs,
       CAST(n11 + n00 AS BIGINT) AS n_agree,
       CAST(n11 + n00 AS DOUBLE) / n + 0.0 AS po,
       CAST((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00) AS DOUBLE)
         / (CAST(n AS DOUBLE) * n) + 0.0 AS pe,
       CAST(n * (n11 + n00)
            - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
            AS DOUBLE)
         / NULLIF(CAST(CAST(n AS DECIMAL(38,0)) * n
                  - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
                  AS DOUBLE), 0) + 0.0 AS kappa
FROM c
"""


_N_SHARDS = 8


def q_curriculum_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum shard assignment: within each source, documents are
    ranked by (token_count, doc_id) — easy-to-hard — and dealt
    round-robin into N shards, so every shard sees the same difficulty
    spread AND the same source mix (the interleaved-shard discipline
    large training runs use to keep per-worker data distribution
    stationary). Report per (shard, source): doc count, token mass,
    mean tokens (single division of exact integer sums).

    Scale shape: the per-source ranking rides the two-phase
    range-partitioned numbering (``global_row_index`` over
    (source, difficulty, id) — never a single-partition window);
    per-source offsets come from a bounded #sources-row aggregate
    broadcast back."""
    from data_quality_checks_in_relational_database_spark.functions.scalars import (
        token_count,
    )
    from data_quality_checks_in_relational_database_spark.operators.sampling import (
        global_row_index,
    )

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    scored = docs.select(
        "doc_id", "source", token_count(F.col("text")).alias("nt")
    )
    idx = global_row_index(scored, ["source", "nt", "doc_id"])
    # per-source rank = global rank - (source's first rank) + 1; the
    # offsets table is bounded by source cardinality
    src_off = idx.groupBy("source").agg(F.min("row_idx").alias("r0"))
    ranked = idx.join(F.broadcast(src_off), "source").select(
        "doc_id",
        "source",
        "nt",
        (F.col("row_idx") - F.col("r0")).alias("rank0"),
    )
    sharded = ranked.withColumn(
        "shard", (F.col("rank0") % _N_SHARDS).cast("long")
    )
    return sharded.groupBy("shard", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("sum_tokens"),
        (
            F.sum("nt").cast("double") / F.count(F.lit(1)) + F.lit(0.0)
        ).alias("mean_tokens"),
    )


ORACLE_CURRICULUM_SHARDS = f"""
WITH scored AS (
    SELECT doc_id, source,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+')) END AS nt
    FROM documents
),
ranked AS (
    SELECT doc_id, source, nt,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY nt, doc_id) - 1
             AS rank0
    FROM scored
)
SELECT CAST(rank0 % {_N_SHARDS} AS BIGINT) AS shard, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS sum_tokens,
       CAST(SUM(nt) AS DOUBLE) / COUNT(*) + 0.0 AS mean_tokens
FROM ranked
GROUP BY 1, 2
"""


_IDF_SCALE = 1_000_000


def q_doc_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document rarity score: the mean inverse document frequency
    (ln(N/df)) of the document's DISTINCT tokens — the novelty signal
    curriculum/quality samplers use to up-weight documents carrying
    rare vocabulary and down-weight boilerplate. Two shuffles, both on
    token keys: distinct (doc, token) explode → df counts; join back →
    per-doc INTEGER sum of micro-scaled idf (exact under any
    partitioning), one final division. Token text never leaves the
    exchange un-aggregated at corpus scale — at 100 TB swap the join
    key for xxhash64(token) exactly like ``frequent_ngrams``."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    from data_quality_checks_in_relational_database_spark.operators.text import tokens

    dt = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok")
    )
    n_docs = docs.count()  # bounded: one scalar for the idf closure
    dfreq = dt.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.select(
        "tok",
        F.round(
            F.log(F.lit(float(n_docs)) / F.col("df").cast("double"))
            * _IDF_SCALE
        )
        .cast("long")
        .alias("idf_micro"),
    )
    per_doc = (
        dt.join(idf, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_tokens"),
            F.sum("idf_micro").alias("sum_idf_micro"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_distinct_tokens", F.lit(0))
            .cast("long")
            .alias("n_distinct_tokens"),
            (
                # single exact-integer division: bit-identical across
                # engines, so NO final round (a round would sit exactly
                # on decimal boundaries where engines' rounding differs)
                F.when(
                    F.col("n_distinct_tokens") > 0,
                    F.col("sum_idf_micro").cast("double")
                    / (F.col("n_distinct_tokens") * F.lit(float(_IDF_SCALE))),
                ).otherwise(F.lit(0.0))
                + F.lit(0.0)
            ).alias("mean_idf"),
        )
    )


ORACLE_DOC_RARITY = f"""
WITH dt AS (
    SELECT DISTINCT doc_id, t.tok
    FROM (SELECT doc_id, list_filter({_TOKS}, x -> x != '') AS ws FROM documents),
         UNNEST(ws) AS t(tok)
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
idf AS (
    SELECT tok,
           CAST(ROUND(LN(CAST(n.n_docs AS DOUBLE) / COUNT(*)) * {_IDF_SCALE})
                AS BIGINT) AS idf_micro
    FROM dt, n GROUP BY tok, n.n_docs
),
per_doc AS (
    SELECT dt.doc_id, COUNT(*) AS ndt, SUM(idf.idf_micro) AS s
    FROM dt JOIN idf USING (tok) GROUP BY dt.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.ndt, 0) AS BIGINT) AS n_distinct_tokens,
       CASE WHEN COALESCE(p.ndt, 0) > 0
            THEN CAST(p.s AS DOUBLE) / (p.ndt * {_IDF_SCALE}.0)
            ELSE 0.0 END + 0.0 AS mean_idf
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified retrieval: exact top-20 dense candidates per
    query (vec_id < 10, same query set as ``cosine_topk``), then the
    greedy lam=0.7/mu=0.3 diversification picks 5; see
    :func:`operators.similarity.mmr_rerank` for the scale shape and
    determinism contract."""
    from data_quality_checks_in_relational_database_spark.operators.similarity import (
        mmr_rerank,
    )

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10)
    return mmr_rerank(emb, queries, k_candidates=20, m=5)


def _mmr_oracle(k_cand: int, m: int) -> str:
    """Unrolled greedy replay in INTEGER micro-units: rel_i/sim_i =
    round(cosine * 1e6) BIGINTs, step score = 7*rel_i - 3*mu_i (the
    lam=0.7/mu=0.3 objective times 1e7) — exact integer comparisons,
    ties → lower id; the emitted doubles are single exact-integer
    divisions (no final ROUND — see the operator docstring for why
    re-rounding diverges across engines). st{i} picks step i, ss{i}
    accumulates the selected set; MATERIALIZED against the 2^k inline
    re-expansion of the chained CTEs."""
    parts = [
        """
WITH unit AS MATERIALIZED (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           SQRT(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings
),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           CAST(ROUND(ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6)
                      * 1000000) AS BIGINT) AS rel_i
    FROM unit q JOIN unit c ON q.vec_id < 10 AND c.vec_id != q.vec_id
),
cand AS MATERIALIZED (
    SELECT query_id, neighbor_id, rel_i FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY rel_i DESC, neighbor_id ASC) AS rn
        FROM scored
    ) WHERE rn <= %(K)d
),
csim AS MATERIALIZED (
    SELECT a.query_id, a.neighbor_id AS ia, b.neighbor_id AS ib,
           CAST(ROUND(list_dot_product(ua.v, ub.v) / (ua.nrm * ub.nrm)
                      * 1000000) AS BIGINT) AS sim_i
    FROM cand a JOIN cand b
      ON a.query_id = b.query_id AND a.neighbor_id != b.neighbor_id
    JOIN unit ua ON ua.vec_id = a.neighbor_id
    JOIN unit ub ON ub.vec_id = b.neighbor_id
),
ss0 AS MATERIALIZED (
    SELECT query_id, neighbor_id FROM cand WHERE FALSE
)"""
        % {"K": k_cand}
    ]
    for i in range(1, m + 1):
        parts.append(
            f""",
st{i} AS MATERIALIZED (
    SELECT query_id, neighbor_id, rel_i, ms_i FROM (
        SELECT c.query_id, c.neighbor_id, c.rel_i,
               COALESCE(mx.mxs, 0) AS ms_i,
               ROW_NUMBER() OVER (PARTITION BY c.query_id
                   ORDER BY 7 * c.rel_i - 3 * COALESCE(mx.mxs, 0) DESC,
                            c.neighbor_id ASC) AS rn
        FROM cand c
        LEFT JOIN ss{i - 1} sel
          ON sel.query_id = c.query_id AND sel.neighbor_id = c.neighbor_id
        LEFT JOIN (
            SELECT cs.query_id, cs.ia AS neighbor_id, MAX(cs.sim_i) AS mxs
            FROM csim cs JOIN ss{i - 1} s2
              ON s2.query_id = cs.query_id AND s2.neighbor_id = cs.ib
            GROUP BY 1, 2
        ) mx ON mx.query_id = c.query_id AND mx.neighbor_id = c.neighbor_id
        WHERE sel.neighbor_id IS NULL
    ) WHERE rn = 1
),
ss{i} AS MATERIALIZED (
    SELECT query_id, neighbor_id FROM ss{i - 1}
    UNION ALL
    SELECT query_id, neighbor_id FROM st{i}
)"""
        )
    finals = [
        f"""
SELECT query_id, CAST({i} AS BIGINT) AS step, neighbor_id,
       CAST(rel_i AS DOUBLE) / 1000000.0 + 0.0 AS relevance,
       CAST(ms_i AS DOUBLE) / 1000000.0 + 0.0 AS max_sim_selected,
       CAST(7 * rel_i - 3 * ms_i AS DOUBLE) / 10000000.0 + 0.0 AS mmr_score
FROM st{i}"""
        for i in range(1, m + 1)
    ]
    parts.append("\nUNION ALL".join(finals))
    return "".join(parts)


ORACLE_MMR_RERANK = _mmr_oracle(20, 5)


def q_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization of document length: each
    document's WITHIN-SOURCE rank maps onto the global token-length
    distribution (value at global position ceil(r/n_s · N)) — the
    score-harmonization step used before mixing heterogeneous sources,
    so a "long doc for source X" and a "long doc for source Y" land on
    the same normalized scale even when X's raw lengths skew short.

    Fully integer-exact: ranks via the two-phase range-partitioned
    numbering (never a global single-partition window), the target
    position by BIGINT ceil-division, the quantile as ONE exact-int
    division. The final lookup is an equi-join on the position. The
    BIGINT product r·N overflows around N≈3e9 — swap to DECIMAL(38,0)
    arithmetic past that."""
    from data_quality_checks_in_relational_database_spark.functions.scalars import (
        token_count,
    )
    from data_quality_checks_in_relational_database_spark.operators.sampling import (
        global_row_index,
    )

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    scored = docs.select(
        "doc_id", "source", token_count(F.col("text")).alias("nt")
    )
    n_total = scored.count()  # bounded scalar for the DIV literal
    g = global_row_index(scored.select("nt", "doc_id"), ["nt", "doc_id"],
                         index_col="gidx").select(
        "gidx", F.col("nt").alias("norm_nt")
    )
    sidx = global_row_index(scored, ["source", "nt", "doc_id"],
                            index_col="sgidx")
    off = sidx.groupBy("source").agg(
        F.min("sgidx").alias("r0"), F.count(F.lit(1)).alias("n_s")
    )
    ranked = sidx.join(F.broadcast(off), "source").select(
        "doc_id",
        "source",
        "nt",
        (F.col("sgidx") - F.col("r0") + 1).alias("r_s"),
        "n_s",
    )
    tgt = ranked.withColumn(
        "target", F.expr(f"(r_s * {n_total}L + n_s - 1) DIV n_s")
    )
    return tgt.join(g, tgt.target == g.gidx).select(
        "doc_id",
        "source",
        F.col("nt").cast("long").alias("n_tokens"),
        (F.col("r_s").cast("double") / F.col("n_s") + F.lit(0.0)).alias("q"),
        F.col("norm_nt").cast("long").alias("norm_tokens"),
    )


ORACLE_QUANTILE_NORM = """
WITH scored AS (
    SELECT doc_id, source,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+')) END AS nt
    FROM documents
),
tot AS (SELECT COUNT(*) AS n FROM scored),
g AS (
    SELECT ROW_NUMBER() OVER (ORDER BY nt, doc_id) AS gidx, nt FROM scored
),
s AS (
    SELECT doc_id, source, nt,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY nt, doc_id) AS r_s,
           COUNT(*) OVER (PARTITION BY source) AS n_s
    FROM scored
)
SELECT s.doc_id, s.source, CAST(s.nt AS BIGINT) AS n_tokens,
       CAST(s.r_s AS DOUBLE) / s.n_s + 0.0 AS q,
       CAST(g.nt AS BIGINT) AS norm_tokens
FROM s CROSS JOIN tot t
JOIN g ON g.gidx = (s.r_s * t.n + s.n_s - 1) // s.n_s
"""


_LP_ROUNDS = 4


def q_lp_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (4 fixed rounds) over the
    verified near-dup pair graph: every node starts as its own label;
    each round adopts the most frequent label among NEIGHBORS (ties →
    smallest label); isolated documents stay their own community.
    Communities are the soft alternative to connected components when
    transitive chaining over-merges (A~B~C with A≁C): LP needs local
    majority, not mere reachability.

    Scale: pairs from banded MinHash + exact verification (the
    ``minhash_dedup`` pipeline — candidates-only shuffle); the LP
    rounds run on the size-adaptive engine
    (:func:`operators.cluster.label_propagation` — driver dict loop at
    or under 1M edges, per-round join+count+window with
    ``localCheckpoint`` above). Isolated documents (no verified pair)
    stay their own singleton community via the left join. Integer
    counts and min-label ties make every round deterministic."""
    from data_quality_checks_in_relational_database_spark.operators import dedup as dd
    from data_quality_checks_in_relational_database_spark.operators.cluster import (
        label_propagation,
    )

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    pairs = dd.minhash_lsh_pairs(docs, threshold=0.5)
    lp = label_propagation(pairs, rounds=_LP_ROUNDS)
    # community sizes come from the TINY lp frame alone: isolated docs
    # are singletons by construction (their ids never enter the graph,
    # so no graph community can carry an isolated doc's label), which
    # keeps the report to ONE docs scan + two broadcast-sized joins —
    # no full-corpus groupBy.
    lp_sizes = lp.groupBy("label").agg(F.count(F.lit(1)).alias("sz"))
    return (
        docs.select("doc_id")
        .join(lp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .join(lp_sizes, "label", "left")
        .select(
            "doc_id",
            F.coalesce("label", F.col("doc_id")).cast("long").alias("community"),
            F.coalesce("sz", F.lit(1)).cast("long").alias("community_size"),
        )
    )


def lp_chain_sql(rounds: int) -> str:
    """Unrolled synchronous-LP CTE chain over the exact-Jaccard pair
    list (== the verified MinHash pairs); MATERIALIZED so the chained
    l{i} CTEs don't inline-explode. Returns the ``WITH pairs … ,
    l{rounds} …`` prefix WITHOUT a final SELECT, so consumers
    (``_lp_oracle`` here, the modularity oracle in
    ``plans/graph_queries.py``) append their own readout over
    ``l{rounds}`` / ``pairs``."""
    from data_quality_checks_in_relational_database_spark.plans.extension_queries import (
        ORACLE_NGRAM_JACCARD,
    )

    parts = [
        f"""
WITH pairs AS MATERIALIZED ({ORACLE_NGRAM_JACCARD}),
edges AS MATERIALIZED (
    SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
    UNION ALL
    SELECT doc_id_b, doc_id_a FROM pairs
),
l0 AS MATERIALIZED (SELECT doc_id AS node, doc_id AS label FROM documents)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
l{i} AS MATERIALIZED (
    SELECT n.node, COALESCE(nw.nl, n.label) AS label
    FROM l{i - 1} n LEFT JOIN (
        SELECT src AS node, label AS nl FROM (
            SELECT e.src, l.label,
                   ROW_NUMBER() OVER (PARTITION BY e.src
                       ORDER BY COUNT(*) DESC, l.label ASC) AS rn
            FROM edges e JOIN l{i - 1} l ON l.node = e.dst
            GROUP BY e.src, l.label
        ) WHERE rn = 1
    ) nw ON nw.node = n.node
)"""
        )
    return "".join(parts)


def _lp_oracle(rounds: int) -> str:
    return (
        lp_chain_sql(rounds)
        + f"""
SELECT l.node AS doc_id, CAST(l.label AS BIGINT) AS community,
       CAST(sz.n AS BIGINT) AS community_size
FROM l{rounds} l JOIN (
    SELECT label, COUNT(*) AS n FROM l{rounds} GROUP BY label
) sz ON sz.label = l.label
"""
    )


ORACLE_LP_COMMUNITIES = _lp_oracle(_LP_ROUNDS)


_CONF_ALPHA_NUM = 1  # alpha = 1/10: target 90% coverage
_U60 = float(1 << 60)


def q_conformal_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal calibration of the quality classifier: on the
    held-out calibration split (md5-uniform val slice), the threshold
    is the ceil((n+1)(1-alpha))-th smallest nonconformity (-score) —
    the finite-sample-corrected quantile that guarantees ≥ 1-alpha
    coverage on exchangeable data — then the empirical coverage is
    measured on the disjoint test slice. The release gate run before
    trusting "keep docs the classifier is confident about".

    Exactness: the rank k is pure integer arithmetic, the k-th order
    statistic is selected by the two-phase global numbering (never a
    single-partition window), the threshold is an actual score value
    (identical doubles across engines, no rounding), and coverage is
    one exact-integer division. The 1-row threshold frame crossJoins
    (broadcast) onto the 1-row test aggregate."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    from data_quality_checks_in_relational_database_spark.operators.sampling import (
        global_row_index,
    )

    scored = hashed_linear_score(docs, n_buckets=_N_BUCKETS).where(
        F.col("score").isNotNull()
    )
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("double") / F.lit(_U60)
    su = scored.select("doc_id", (-F.col("score")).alias("nc"), u.alias("u"))
    cal = su.where((F.col("u") >= 0.8) & (F.col("u") < 0.9)).select(
        "nc", "doc_id"
    )
    n_cal = cal.count()  # bounded scalar: fixes the integer rank k
    k = min((9 * (n_cal + 1) + 9) // 10, n_cal)
    ranked = global_row_index(cal, ["nc", "doc_id"], index_col="r")
    thr = ranked.where(F.col("r") == k).select(
        F.lit(n_cal).cast("long").alias("n_cal"),
        F.lit(k).cast("long").alias("k"),
        (F.col("nc") + F.lit(0.0)).alias("threshold"),
    )
    test = su.where(F.col("u") >= 0.9)
    agg = test.crossJoin(F.broadcast(thr)).agg(
        F.first("n_cal").alias("n_cal"),
        F.first("k").alias("k"),
        F.first("threshold").alias("threshold"),
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum(F.when(F.col("nc") <= F.col("threshold"), 1).otherwise(0))
        .cast("long")
        .alias("n_covered"),
    )
    return agg.select(
        "n_cal",
        "k",
        "threshold",
        "n_test",
        "n_covered",
        (
            F.try_divide(
                F.col("n_covered").cast("double"), F.col("n_test").cast("double")
            )
            + F.lit(0.0)
        ).alias("coverage"),
    )


ORACLE_CONFORMAL_THRESHOLD = f"""
WITH {_SCORED_CTE},
su AS (
    SELECT doc_id, -score AS nc,
           CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS u
    FROM scored WHERE score IS NOT NULL
),
cal AS (SELECT nc, doc_id FROM su WHERE u >= 0.8 AND u < 0.9),
n AS (SELECT COUNT(*) AS n_cal FROM cal),
kk AS (
    SELECT n_cal,
           LEAST((9 * (n_cal + 1) + 9) // 10, n_cal) AS k
    FROM n
),
ranked AS (
    SELECT nc, ROW_NUMBER() OVER (ORDER BY nc, doc_id) AS r FROM cal
),
thr AS (
    SELECT kk.n_cal, kk.k, ranked.nc AS threshold
    FROM ranked, kk WHERE ranked.r = kk.k
),
test AS (SELECT nc FROM su WHERE u >= 0.9)
SELECT CAST(t.n_cal AS BIGINT) AS n_cal,
       CAST(t.k AS BIGINT) AS k,
       t.threshold + 0.0 AS threshold,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(SUM(CASE WHEN te.nc <= t.threshold THEN 1 ELSE 0 END) AS BIGINT)
         AS n_covered,
       CAST(SUM(CASE WHEN te.nc <= t.threshold THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) + 0.0 AS coverage
FROM test te CROSS JOIN thr t
GROUP BY t.n_cal, t.k, t.threshold
"""


_NEG_K = 5


def q_negative_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive negative mining that can NEVER sample a false
    negative from the anchor's own near-dup cluster: for each anchor
    (doc_id < 10), k=5 deterministic md5-order negatives drawn from
    documents OUTSIDE the anchor's dedup component (components default
    to singletons). The training-pair generator for embedding /
    reranker training where in-cluster "negatives" would poison the
    loss.

    Scale: components from the verified MinHash pair funnel (bounded);
    the anchor set is bounded (broadcast); candidate scoring is one
    map pass over anchors × corpus; selection is the two-phase salted
    top-k (:func:`operators.sampling.negative_sample`) — no per-anchor
    full-corpus window."""
    from data_quality_checks_in_relational_database_spark.operators import dedup as dd
    from data_quality_checks_in_relational_database_spark.operators.cluster import (
        dedup_clusters,
    )
    from data_quality_checks_in_relational_database_spark.operators.sampling import (
        negative_sample,
    )

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    pairs = dd.minhash_lsh_pairs(docs, threshold=0.5)
    comp = dedup_clusters(pairs).select("doc_id", "cluster_id")
    docs_c = (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("cid")
        )
    )
    anchors = docs_c.where(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("anchor_id"), F.col("cid").alias("a_cid")
    )
    cand = (
        docs_c.crossJoin(F.broadcast(anchors))
        .where(
            (F.col("doc_id") != F.col("anchor_id"))
            & (F.col("cid") != F.col("a_cid"))
        )
        .select("anchor_id", "doc_id")
    )
    return negative_sample(cand, "anchor_id", "doc_id", k=_NEG_K).select(
        "anchor_id", "rank", F.col("doc_id").alias("negative_id")
    )


def _neg_oracle() -> str:
    from data_quality_checks_in_relational_database_spark.plans.extension_queries import (
        ORACLE_NGRAM_JACCARD,
    )

    return f"""
WITH RECURSIVE pairs AS MATERIALIZED ({ORACLE_NGRAM_JACCARD}),
edges AS (
    SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
    UNION ALL
    SELECT doc_id_b, doc_id_a FROM pairs
),
reach(node, label) AS (
    SELECT DISTINCT src, src FROM edges
    UNION
    SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
),
comp AS (SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY node),
docs_c AS (
    SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cid
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
),
anchors AS (
    SELECT doc_id AS anchor_id, cid AS a_cid FROM docs_c WHERE doc_id < 10
),
cand AS (
    SELECT a.anchor_id, d.doc_id AS neg,
           md5(CAST(a.anchor_id AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR))
             AS h
    FROM anchors a JOIN docs_c d
      ON d.doc_id != a.anchor_id AND d.cid != a.a_cid
)
SELECT anchor_id, CAST(rn AS BIGINT) AS rank, neg AS negative_id
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                 ORDER BY h, neg) AS rn
    FROM cand
)
WHERE rn <= {_NEG_K}
"""


ORACLE_NEGATIVE_SAMPLE = _neg_oracle()


_SEM_DECONTAM_THRESHOLD = 0.6


def q_semantic_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic eval-set decontamination: corpus vectors (vec_id ≥ 20)
    flagged by cosine ≥ 0.6 to ANY held-out eval vector (vec_id < 20)
    — the embedding-space complement of the n-gram ``decontam`` recipe
    (catches paraphrases n-gram overlap misses). One Arrow pass over
    the corpus against the broadcast eval matrix; per row: hit count,
    max cosine, contaminated flag."""
    from data_quality_checks_in_relational_database_spark.operators.similarity import (
        cosine_threshold_hits,
    )

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    eval_set = emb.where(F.col("vec_id") < 20)
    corpus = emb.where(F.col("vec_id") >= 20)
    hits = cosine_threshold_hits(
        corpus, eval_set, threshold=_SEM_DECONTAM_THRESHOLD
    )
    return hits.select(
        "vec_id",
        "n_hits",
        "max_cos",
        (F.col("n_hits") > 0).alias("contaminated"),
    )


ORACLE_SEMANTIC_DECONTAM = f"""
WITH unit AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           SQRT(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings
),
scored AS (
    SELECT c.vec_id,
           ROUND(list_dot_product(c.v, q.v) / (c.nrm * q.nrm), 6) AS cos
    FROM unit c JOIN unit q ON c.vec_id >= 20 AND q.vec_id < 20
)
SELECT vec_id,
       CAST(SUM(CASE WHEN cos >= {_SEM_DECONTAM_THRESHOLD} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hits,
       MAX(cos) + 0.0 AS max_cos,
       SUM(CASE WHEN cos >= {_SEM_DECONTAM_THRESHOLD} THEN 1 ELSE 0 END) > 0
         AS contaminated
FROM scored
GROUP BY vec_id
"""


def q_mw_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U location-drift test between two sources' document
    token-length distributions (src0 vs src1) — the nonparametric
    "did this source start sending shorter docs" check that the KS
    statistic complements (KS is max-gap, MW is rank-shift; MW has far
    more power against pure location drift).

    Fully exact plan: the test reduces to per-distinct-VALUE counts
    (bounded by max document length — genuinely bounded at any corpus
    size), a cumulative-count window over that bounded table, and a
    1-row integer aggregate. Doubled rank-sums keep tie-averaged ranks
    integral (2U is an integer); the tie-corrected variance is ONE
    exact-integer division (num = na·nb·((n+1)n(n-1) − Σ(t³−t)),
    den = 12n(n−1), DECIMAL(38,0) against n³ overflow); z combines
    those with the same operation order on both engines, so every
    emitted double is bit-identical and deliberately un-rounded."""
    from data_quality_checks_in_relational_database_spark.functions.scalars import (
        token_count,
    )

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    d2 = docs.where(F.col("source").isin("src0", "src1")).select(
        (F.col("source") == "src0").alias("is_a"),
        token_count(F.col("text")).alias("nt"),
    )
    vals = d2.groupBy("nt").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("cnt_a"),
        F.count(F.lit(1)).alias("cnt"),
    )
    # exclusive cumulative via the shared two-phase range-bucketed
    # helper (r5: same fix as KS/W1 — token counts are bounded, but one
    # shared scale-safe plan beats a documented exception)
    from data_quality_checks_in_relational_database_spark.operators.cumulative import (
        bucketed_cumulative,
    )

    ordv = bucketed_cumulative(vals, "nt", ["cnt"]).withColumn(
        "cum_less", F.col("cum_cnt") - F.col("cnt")
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = ordv.agg(
        F.sum(
            F.col("cnt_a") * (2 * F.col("cum_less") + F.col("cnt") + 1)
        ).alias("r2a"),
        F.sum("cnt_a").alias("na"),
        F.sum(F.col("cnt") - F.col("cnt_a")).alias("nb"),
        F.sum("cnt").alias("n"),
        F.sum(
            d38(F.col("cnt")) * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).alias("ties_t"),
    )
    u2 = F.col("r2a") - F.col("na") * (F.col("na") + 1)  # 2·U_a, integer
    var_num = d38(F.col("na")) * F.col("nb") * (
        d38(F.col("n") + 1) * F.col("n") * (F.col("n") - 1) - F.col("ties_t")
    )
    var_den = d38(F.lit(12)) * F.col("n") * (F.col("n") - 1)
    var = var_num.cast("double") / var_den.cast("double")
    z = (u2.cast("double") - (F.col("na") * F.col("nb")).cast("double")) / (
        F.lit(2.0) * F.sqrt(var)
    )
    return agg.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        (u2.cast("double") / F.lit(2.0) + F.lit(0.0)).alias("u_a"),
        (z + F.lit(0.0)).alias("z"),
    )


ORACLE_MW_DRIFT = """
WITH d2 AS (
    SELECT (source = 'src0') AS is_a,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+')) END AS nt
    FROM documents WHERE source IN ('src0', 'src1')
),
vals AS (
    SELECT nt,
           SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS cnt_a,
           COUNT(*) AS cnt
    FROM d2 GROUP BY nt
),
ordv AS (
    SELECT *, COALESCE(SUM(cnt) OVER (ORDER BY nt
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_less
    FROM vals
),
agg AS (
    SELECT SUM(cnt_a * (2 * cum_less + cnt + 1)) AS r2a,
           SUM(cnt_a) AS na,
           SUM(cnt - cnt_a) AS nb,
           SUM(cnt) AS n,
           SUM(CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt) AS ties_t
    FROM ordv
)
SELECT CAST(na AS BIGINT) AS n_a,
       CAST(nb AS BIGINT) AS n_b,
       CAST(r2a - na * (na + 1) AS DOUBLE) / 2.0 + 0.0 AS u_a,
       (CAST(r2a - na * (na + 1) AS DOUBLE) - CAST(na * nb AS DOUBLE))
         / (2.0 * SQRT(
             CAST(CAST(na AS DECIMAL(38,0)) * nb *
                  (CAST(n + 1 AS DECIMAL(38,0)) * n * (n - 1) - ties_t)
                  AS DOUBLE)
             / CAST(CAST(12 AS DECIMAL(38,0)) * n * (n - 1) AS DOUBLE)))
         + 0.0 AS z
FROM agg
"""


def q_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMBINED eval-contamination verdict per corpus document — the
    two registered decontam recipes joined into the release-gate table
    a curation run actually consumes: the n-gram signal (5-gram
    overlap with the src0 held-out set, the GPT-3 recipe) and the
    semantic signal (cosine ≥ 0.6 to any held-out eval vector, the
    paraphrase-robust complement), with a ``flagged_by`` verdict in
    {both, ngram, semantic, clean}. Like ``semantic_keep``, this gates
    the COMPOSITION of already-gated operators; corpus = documents
    outside the eval source whose id also carries an embedding outside
    the eval vector block (doc/vec ids share the synthetic id space,
    as ``hybrid_rrf`` documents)."""
    from data_quality_checks_in_relational_database_spark.operators.decontam import (
        contamination_report,
    )
    from data_quality_checks_in_relational_database_spark.operators.similarity import (
        cosine_threshold_hits,
    )

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    corpus_docs = docs.filter(F.col("source") != "src0")
    eval_docs = docs.filter(F.col("source") == "src0")
    ngram = contamination_report(corpus_docs, eval_docs, n=5).select(
        "doc_id", F.col("n_overlap_grams")
    )
    corpus_vecs = emb.where(F.col("vec_id") >= 20).join(
        corpus_docs.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    sem = cosine_threshold_hits(
        corpus_vecs, emb.where(F.col("vec_id") < 20), threshold=0.6
    ).select(F.col("vec_id").alias("doc_id"), F.col("n_hits"), F.col("max_cos"))
    base = corpus_docs.select("doc_id").join(
        emb.where(F.col("vec_id") >= 20).select(F.col("vec_id").alias("doc_id")),
        "doc_id",
        "left_semi",
    )
    out = (
        base.join(ngram, "doc_id", "left")
        .join(sem, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_overlap_grams", F.lit(0)).cast("long").alias("ngram_hits"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("semantic_hits"),
            F.col("max_cos"),
        )
    )
    ng = F.col("ngram_hits") > 0
    sm = F.col("semantic_hits") > 0
    return out.withColumn(
        "flagged_by",
        F.when(ng & sm, "both").when(ng, "ngram").when(sm, "semantic").otherwise("clean"),
    )


ORACLE_CONTAMINATION_REPORT = """
WITH toks AS (
    SELECT doc_id, source,
           CASE WHEN length(trim(text)) = 0 THEN []
                ELSE string_split_regex(trim(lower(text)), '\\s+') END AS t
    FROM documents
),
sh AS (
    SELECT doc_id, source,
           list_distinct([array_to_string(t[i:i+4], ' ') for i in range(1, len(t) - 3)]) AS s
    FROM toks
),
ev AS (SELECT DISTINCT UNNEST(s) AS gram FROM sh WHERE source = 'src0'),
corp AS (
    SELECT doc_id, UNNEST(s) AS gram FROM sh WHERE source <> 'src0'
),
ngram AS (
    SELECT doc_id, COUNT(*) AS n_overlap FROM corp JOIN ev USING (gram) GROUP BY doc_id
),
unit AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           SQRT(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings
),
corpus_ids AS (
    SELECT d.doc_id FROM documents d
    JOIN embeddings e ON e.vec_id = d.doc_id AND e.vec_id >= 20
    WHERE d.source <> 'src0'
),
sem AS (
    SELECT c.vec_id AS doc_id,
           SUM(CASE WHEN ROUND(list_dot_product(c.v, q.v) / (c.nrm * q.nrm), 6) >= 0.6
                    THEN 1 ELSE 0 END) AS n_hits,
           MAX(ROUND(list_dot_product(c.v, q.v) / (c.nrm * q.nrm), 6)) + 0.0 AS max_cos
    FROM unit c
    JOIN corpus_ids ci ON ci.doc_id = c.vec_id
    JOIN unit q ON q.vec_id < 20
    GROUP BY c.vec_id
)
SELECT ci.doc_id,
       CAST(COALESCE(n.n_overlap, 0) AS BIGINT) AS ngram_hits,
       CAST(COALESCE(s.n_hits, 0) AS BIGINT) AS semantic_hits,
       s.max_cos,
       CASE WHEN COALESCE(n.n_overlap, 0) > 0 AND COALESCE(s.n_hits, 0) > 0 THEN 'both'
            WHEN COALESCE(n.n_overlap, 0) > 0 THEN 'ngram'
            WHEN COALESCE(s.n_hits, 0) > 0 THEN 'semantic'
            ELSE 'clean' END AS flagged_by
FROM corpus_ids ci
LEFT JOIN ngram n USING (doc_id)
LEFT JOIN sem s USING (doc_id)
"""


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (r5)
# ---------------------------------------------------------------------------

_DSIR_TARGET = "src0"  # deterministic target domain (documents.source)
_DSIR_K = 40  # selection budget — binds at every shipped SF (50+ docs)


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    public DSIR recipe) with unigram LMs: score every document by the
    mean token log-ratio ln p_target(tok) − ln p_corpus(tok) — both
    add-one-smoothed over the SHARED corpus vocabulary, target =
    ``source = 'src0'`` — and flag the top-40 as selected. This is the
    "make the pretraining mix look like the target domain" selection
    step of an LLM data pipeline.

    Scale shape mirrors ``lm_score`` (same sufficient statistics, one
    extra filtered aggregation): token explode → (doc, tok) counts with
    map-side combine; the two LMs are the same aggregate one level up
    (token-keyed shuffle — a 100 TB vocab does not broadcast); corpus
    totals are one broadcast row; the per-doc double sum folds over
    the token-sorted array so it is EXACTLY hash-stable; selection is
    ``orderBy(raw score desc, doc_id).limit(k)`` (TakeOrderedAndProject)
    broadcast back as a flag — never a global rank window.
    """
    from data_quality_checks_in_relational_database_spark.operators.text import tokens

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = docs.select(
        "doc_id", "source", F.explode(tokens(F.col("text"))).alias("tok")
    )
    tf = toks.groupBy("doc_id", "source", "tok").agg(
        F.count("*").cast("long").alias("tf")
    )
    # tf feeds three subtrees (corpus LM, target LM, the scored join)
    # and each gets a different pruned projection, so exchange reuse
    # cannot merge them — unpinned, the tokenize→explode→count lineage
    # ran once per consumer (r8 before-plan: 20 parquet scans, 0
    # ReusedExchange; ~3.2 s at sf0.1). Pin the (doc, tok) count table
    # once — at warehouse scale this is the materialized term-frequency
    # table every DSIR pass starts from (MEMORY_AND_DISK spills).
    from pyspark import StorageLevel

    tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
    tf.count()  # eager fill: 3 branches racing a cold cache refill it per branch
    corpus = tf.groupBy("tok").agg(F.sum("tf").alias("cc"))
    target = (
        tf.where(F.col("source") == _DSIR_TARGET)
        .groupBy("tok")
        .agg(F.sum("tf").alias("ct"))
    )
    vocab = corpus.join(target, "tok", "left").select(
        "tok", "cc", F.coalesce("ct", F.lit(0)).alias("ct")
    )
    totals = vocab.agg(
        F.sum("cc").cast("double").alias("tc"),
        F.sum("ct").cast("double").alias("tt"),
        F.count("*").cast("double").alias("v"),
    )
    lr = F.log(
        (F.col("ct").cast("double") + 1.0) / (F.col("tt") + F.col("v"))
    ) - F.log((F.col("cc").cast("double") + 1.0) / (F.col("tc") + F.col("v")))
    scored = (
        tf.join(vocab, "tok")
        .join(F.broadcast(totals))
        .select(
            "doc_id", "source", "tf", "tok",
            (F.col("tf").cast("double") * lr).alias("lr"),
        )
    )
    per_doc = scored.groupBy("doc_id", "source").agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("tok").alias("t"), F.col("lr").alias("lr")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["lr"],
        ).alias("raw"),
    )
    sc = per_doc.select(
        "doc_id", "source", "n_tokens",
        (F.col("raw") / F.col("n_tokens").cast("double")).alias("raw_avg"),
    )
    # sc feeds the top-k subtree AND the final report join; unpinned,
    # the expensive collect_list/array_sort per-doc fold above runs
    # twice. Per-doc rows are corpus-dimension-bounded (one per doc).
    sc = sc.persist(StorageLevel.MEMORY_AND_DISK)
    topk = (
        sc.orderBy(F.col("raw_avg").desc(), F.col("doc_id").asc())
        .limit(_DSIR_K)
        .select("doc_id", F.lit(True).alias("sel"))
    )
    return sc.join(F.broadcast(topk), "doc_id", "left").select(
        "doc_id", "source", "n_tokens",
        (F.round("raw_avg", 6) + F.lit(0.0)).alias("avg_log_ratio"),
        F.coalesce("sel", F.lit(False)).alias("selected"),
    )


ORACLE_DSIR_SELECT = f"""
WITH toks AS (
    SELECT doc_id, source, unnest(list_filter({_TOKS}, t -> t != '')) AS tok
    FROM documents
),
tf AS (SELECT doc_id, source, tok, COUNT(*) AS tf FROM toks GROUP BY ALL),
corpus AS (SELECT tok, SUM(tf) AS cc FROM tf GROUP BY tok),
target AS (
    SELECT tok, SUM(tf) AS ct FROM tf WHERE source = '{_DSIR_TARGET}' GROUP BY tok
),
vocab AS (
    SELECT c.tok, c.cc, COALESCE(t.ct, 0) AS ct
    FROM corpus c LEFT JOIN target t USING (tok)
),
totals AS (
    SELECT CAST(SUM(cc) AS DOUBLE) AS tc, CAST(SUM(ct) AS DOUBLE) AS tt,
           CAST(COUNT(*) AS DOUBLE) AS v
    FROM vocab
),
scored AS (
    SELECT f.doc_id, f.source, f.tf, f.tok,
           CAST(f.tf AS DOUBLE)
             * (ln((CAST(v.ct AS DOUBLE) + 1.0) / (t.tt + t.v))
                - ln((CAST(v.cc AS DOUBLE) + 1.0) / (t.tc + t.v))) AS lr
    FROM tf f JOIN vocab v USING (tok), totals t
),
per_doc AS (
    SELECT doc_id, source, CAST(SUM(tf) AS BIGINT) AS n_tokens,
           SUM(lr ORDER BY tok) AS raw
    FROM scored GROUP BY doc_id, source
),
sc AS (
    SELECT doc_id, source, n_tokens,
           raw / CAST(n_tokens AS DOUBLE) AS raw_avg
    FROM per_doc
),
topk AS (SELECT doc_id FROM sc ORDER BY raw_avg DESC, doc_id ASC LIMIT {_DSIR_K})
SELECT s.doc_id, s.source, s.n_tokens,
       ROUND(raw_avg, 6) + 0.0 AS avg_log_ratio,
       s.doc_id IN (SELECT doc_id FROM topk) AS selected
FROM sc s
"""


# ---------------------------------------------------------------------------
# Per-source quota cap (r5)
# ---------------------------------------------------------------------------

_QUOTA_N = 10


def q_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document quota — the CommonCrawl-style per-domain cap
    that stops one domain from dominating the mix: keep the top
    ``N=10`` docs per source by (n_chars desc, doc_id) and report, per
    source, totals plus the exact id-sum of the kept set (a membership
    checksum, same idiom as ``class_rebalance``). The rank is a window
    PARTITIONED by source — shuffle by the quota key, nothing global."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    ranked = docs.select("doc_id", "source", "n_chars").withColumn(
        "kept", F.row_number().over(w) <= _QUOTA_N
    )
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("kept").cast("long")).cast("long").alias("n_kept"),
        F.sum(F.when(F.col("kept"), F.col("doc_id"))).cast("long").alias("kept_id_sum"),
    )


ORACLE_SOURCE_QUOTA = f"""
WITH ranked AS (
    SELECT doc_id, source,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY n_chars DESC, doc_id ASC) <= {_QUOTA_N} AS kept
    FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN kept THEN doc_id END) AS BIGINT) AS kept_id_sum
FROM ranked GROUP BY source
"""


# ---------------------------------------------------------------------------
# Stratified sampling with exact largest-remainder allocation (r5)
# ---------------------------------------------------------------------------

_STRAT_BUDGET = 100


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional stratified sample with EXACT integer allocation
    (largest-remainder / Hamilton method): each source gets
    floor(B·n_s/N) slots, the B − Σfloor leftover slots go to the
    largest remainders (ties by source asc) — so the sample size is
    exactly B whenever N ≥ B, with no FP in the allocation. Membership
    is deterministic: within a source, docs are taken in
    (md5(doc_id), doc_id) order — the same keyed-hash idiom as
    ``hash_split`` — and reported as an exact id-sum checksum.

    Scale shape: one count per source (bounded frame), the remainder
    rank over the |sources| rows, and ONE source-partitioned window for
    the within-source take — shuffles by the stratum key only."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    per_src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per_src.agg(F.sum("n_docs").alias("n_total"))
    alloc = per_src.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs",
        (F.col("n_docs") * _STRAT_BUDGET).alias("num"),
        F.col("n_total"),
    ).select(
        "source", "n_docs",
        F.floor(F.col("num") / F.col("n_total")).cast("long").alias("base"),
        F.pmod(F.col("num"), F.col("n_total")).alias("rem"),
        "n_total",
    )
    # leftover slots to the largest remainders — |sources|-bounded frame,
    # ranked via the collect_list/posexplode idiom (no window at all)
    ranked = (
        alloc.agg(
            F.array_sort(
                F.collect_list(F.struct(
                    (-F.col("rem")).alias("neg_rem"),
                    F.col("source").alias("source"),
                    F.col("base").alias("base"),
                    F.col("n_docs").alias("n_docs"),
                ))
            ).alias("arr")
        )
        .select(
            F.posexplode(
                F.expr(
                    "transform(arr, (x, i) -> struct(x.source AS source, "
                    "x.base AS base, x.n_docs AS n_docs, "
                    "aggregate(arr, 0L, (a, y) -> a + y.base) AS base_total, "
                    "CAST(i AS LONG) AS rem_rank))"
                )
            ).alias("pos", "r")
        )
        .select("r.*")
        .select(
            "source", "n_docs",
            (
                F.col("base")
                + (F.col("rem_rank") < F.lit(_STRAT_BUDGET) - F.col("base_total"))
                .cast("long")
            ).alias("quota"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    take = (
        docs.select("doc_id", "source")
        .join(F.broadcast(ranked), "source")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= F.col("quota"))
    )
    return take.groupBy("source").agg(
        F.max("quota").cast("long").alias("quota"),
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.sum("doc_id").cast("long").alias("sample_id_sum"),
    )


ORACLE_STRATIFIED_SAMPLE = f"""
WITH per_src AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
tot AS (SELECT SUM(n_docs) AS n_total FROM per_src),
alloc AS (
    SELECT source, n_docs,
           (n_docs * {_STRAT_BUDGET}) // n_total AS base,
           (n_docs * {_STRAT_BUDGET}) % n_total AS rem
    FROM per_src, tot
),
ranked AS (
    SELECT source, n_docs, base,
           ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC) - 1 AS rem_rank,
           SUM(base) OVER () AS base_total
    FROM alloc
),
quota AS (
    SELECT source, n_docs,
           base + CASE WHEN rem_rank < {_STRAT_BUDGET} - base_total
                       THEN 1 ELSE 0 END AS quota
    FROM ranked
),
take AS (
    SELECT d.source, d.doc_id, q.quota,
           ROW_NUMBER() OVER (PARTITION BY d.source
                              ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rk
    FROM documents d JOIN quota q USING (source)
)
SELECT source,
       CAST(MAX(quota) AS BIGINT) AS quota,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM(doc_id) AS BIGINT) AS sample_id_sum
FROM take WHERE rk <= quota GROUP BY source
"""


# ---------------------------------------------------------------------------
# N-gram novelty by ingestion order (r5)
# ---------------------------------------------------------------------------


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY in ingestion (doc_id) order: the
    fraction of a document's distinct 3-gram shingles whose FIRST
    corpus occurrence is this document (min doc_id owner wins; a gram
    shared by two docs is novel only for the earlier one). The curation
    signal behind "is this source still contributing new content, or
    re-crawling what we have" — novelty trending to 0 per source is a
    dedup-pressure alarm.

    Scale shape: one (gram → min doc_id) aggregation (map-side
    combined), one gram-keyed join back — never a pairwise comparison;
    novelty is one exact integer division per doc."""
    from data_quality_checks_in_relational_database_spark.operators.dedup import (
        shingle_sets,
    )

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    sh = shingle_sets(docs, "text", "doc_id", 3)
    exploded = sh.select(
        "doc_id", F.size("shingles").alias("n_grams"), F.explode("shingles").alias("g")
    )
    first = exploded.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        exploded.join(first, "g")
        .groupBy("doc_id", "n_grams")
        .agg(
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long")).alias("novel")
        )
    )
    return per_doc.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("novel").cast("long").alias("n_novel"),
        (F.col("novel") / F.col("n_grams")).alias("novelty"),
    )


ORACLE_NGRAM_NOVELTY = f"""
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
    FROM documents WHERE length(trim(text)) > 0
),
sh AS (
    SELECT doc_id,
           list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS s
    FROM toks WHERE len(t) >= 3
),
exploded AS (SELECT doc_id, len(s) AS n_grams, unnest(s) AS g FROM sh),
first AS (SELECT g, MIN(doc_id) AS first_doc FROM exploded GROUP BY g)
SELECT e.doc_id,
       CAST(e.n_grams AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       SUM(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
         / CAST(e.n_grams AS DOUBLE) AS novelty
FROM exploded e JOIN first f USING (g)
GROUP BY e.doc_id, e.n_grams
"""


# ---------------------------------------------------------------------------
# Encoding-health audit (mojibake / control chars / replacement chars)
# ---------------------------------------------------------------------------

#: Detection patterns, shared verbatim with the oracle. The control
#: class covers C0 bytes that never belong in prose (TAB/LF/CR exempt).
_ENC_CTRL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"
#: UTF-8-read-as-Latin-1 double-encoding signature: 'A-tilde' (U+00C3)
#: followed by a Latin-1 symbol that is a UTF-8 continuation byte's
#: visible form — the 'e-acute becomes two glyphs' rot mode.
#: Built with chr() so both engines see identical literal characters
#: (regex escape syntaxes differ between Java and RE2): U+00C3
#: followed by any printable Latin-1 continuation-byte form
#: (U+00A0..U+00BF).
_ENC_MOJI = chr(0xC3) + "[" + chr(0xA0) + "-" + chr(0xBF) + "]"
_ENC_FFFD = "�"


def q_encoding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus encoding-health report per source: documents containing
    U+FFFD replacement characters, C0 control bytes, or the
    UTF-8-decoded-as-Latin-1 double-encoding signature (U+00C3 +
    continuation-glyph pairs) — the three dominant real-corpus
    text-rot modes.

    The shipped synthetic corpus is clean ASCII, so (media-gate
    pattern) deterministic damage is INJECTED first: doc_id % 7 == 0
    gains a replacement char, % 11 == 0 a NUL control byte, % 13 == 0 a
    mojibake pair — the oracle replays the modulo arithmetic, so the
    detection REGEXES themselves are value-checked (a broken character
    class or over-escape mismatches counts). On a real lake the same
    operator runs with damage() = identity. Map-only + one per-source
    aggregate; all counts integer-exact.
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    damaged = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" " + _ENC_FFFD)).otherwise(
                F.lit("")
            ),
            F.when(F.col("doc_id") % 11 == 0, F.lit("\x00")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 13 == 0, F.lit(" Ã©")).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    flags = damaged.select(
        "source",
        F.col("text").rlike(_ENC_FFFD).cast("long").alias("has_fffd"),
        F.col("text").rlike(_ENC_CTRL_RE).cast("long").alias("has_ctrl"),
        F.col("text").rlike(_ENC_MOJI).cast("long").alias("has_moji"),
    )
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("has_fffd").alias("n_fffd"),
        F.sum("has_ctrl").alias("n_ctrl"),
        F.sum("has_moji").alias("n_mojibake"),
        F.sum(
            F.when(
                (F.col("has_fffd") + F.col("has_ctrl") + F.col("has_moji")) > 0,
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("n_any"),
    )


ORACLE_ENCODING_AUDIT = f"""
WITH damaged AS (
    SELECT doc_id, source,
           text
           || CASE WHEN doc_id % 7 = 0 THEN ' ' || chr(65533) ELSE '' END
           || CASE WHEN doc_id % 11 = 0 THEN chr(0) ELSE '' END
           || CASE WHEN doc_id % 13 = 0 THEN ' ' || chr(195) || chr(169) ELSE '' END
           AS text
    FROM documents
),
flags AS (
    SELECT source,
           CASE WHEN regexp_matches(text, '{_ENC_FFFD}') THEN 1 ELSE 0 END AS has_fffd,
           CASE WHEN regexp_matches(text, '{_ENC_CTRL_RE}') THEN 1 ELSE 0 END AS has_ctrl,
           CASE WHEN regexp_matches(text, '{_ENC_MOJI}') THEN 1 ELSE 0 END AS has_moji
    FROM damaged
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(has_fffd) AS BIGINT) AS n_fffd,
       CAST(SUM(has_ctrl) AS BIGINT) AS n_ctrl,
       CAST(SUM(has_moji) AS BIGINT) AS n_mojibake,
       CAST(SUM(CASE WHEN has_fffd + has_ctrl + has_moji > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_any
FROM flags GROUP BY source
"""
