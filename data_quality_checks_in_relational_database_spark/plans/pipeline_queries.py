"""Round-2 pipeline extension queries: embedding QA, int8 quantized
similarity, KS drift, funnels, state history, outlier/entropy
profiling — each with a full DuckDB differential oracle.

Design notes on oracle portability (same contract as
extension_queries.py): every aggregated value is either an exact
integer (counts, micro-unit norms, integer dot products, KS integer
numerators) or a single float rounded to 6 dp computed from identical
IEEE-754 inputs on both engines. Per-vector folds are list-ordered on
both sides; elements are cast to DOUBLE before any multiply so
float32 rounding never diverges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_quality_checks_in_relational_database_spark.operators import diff as dfo
from data_quality_checks_in_relational_database_spark.operators import embedding_qa as eq
from data_quality_checks_in_relational_database_spark.operators import funnel as fn
from data_quality_checks_in_relational_database_spark.operators import profile as pr
from data_quality_checks_in_relational_database_spark.operators import quantize as qz
from data_quality_checks_in_relational_database_spark.session import load_tables

# ---------------------------------------------------------------------------
# Embedding QA
# ---------------------------------------------------------------------------


def q_embedding_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding health report (dim 64 contract)."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return eq.embedding_qa_report(emb, "embedding", "label", expected_dim=64)


ORACLE_EMBEDDING_QA = """
WITH per AS (
    SELECT label,
           CASE WHEN embedding IS NULL THEN 1 ELSE 0 END AS is_null,
           CASE WHEN embedding IS NULL THEN 0
                WHEN len(embedding) != 64 THEN 1 ELSE 0 END AS bad_dim,
           CASE WHEN embedding IS NULL THEN 0
                WHEN len(list_filter(embedding, x -> isnan(x))) > 0 THEN 1
                ELSE 0 END AS has_nan,
           CASE WHEN embedding IS NULL
                  OR len(list_filter(embedding, x -> isnan(x))) > 0 THEN NULL
                ELSE CAST(round(sqrt(list_aggregate(
                       list_transform(embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                     * 1000000) AS BIGINT) END AS nm
    FROM embeddings
)
SELECT label,
       COUNT(*) AS n_vecs,
       CAST(SUM(bad_dim) AS BIGINT) AS n_bad_dim,
       CAST(SUM(is_null) AS BIGINT) AS n_null_vecs,
       CAST(SUM(has_nan) AS BIGINT) AS n_nan_vecs,
       CAST(SUM(CASE WHEN nm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_vecs,
       MIN(nm) AS min_norm_micro,
       MAX(nm) AS max_norm_micro,
       CAST(SUM(nm) AS BIGINT) AS sum_norm_micro
FROM per
GROUP BY label
"""


# ---------------------------------------------------------------------------
# int8 quantization (pure function of the input -> fully differential)
# ---------------------------------------------------------------------------

_DUCK_CODES = """
codes AS (
    SELECT vec_id, scale,
           CASE WHEN scale = 0 THEN list_transform(e, x -> 0)
                ELSE list_transform(e, x -> CAST(round(CAST(x AS DOUBLE) / scale) AS INT))
           END AS qv
    FROM (
        SELECT vec_id,
               list_aggregate(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE))), 'max') / 127.0 AS scale,
               embedding AS e
        FROM embeddings
    )
)
"""


def q_quant_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 quantization audit (scale, energy, saturation)."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return qz.quantization_summary(emb, "embedding", "vec_id")


ORACLE_QUANT_SUMMARY = f"""
WITH {_DUCK_CODES}
SELECT vec_id,
       CAST(round(scale * 1000000) AS BIGINT) AS scale_micro,
       CAST(list_aggregate(list_transform(qv, x -> CAST(x AS BIGINT) * x), 'sum') AS BIGINT) AS qq,
       CAST(list_aggregate(list_transform(qv, x -> CAST(x AS BIGINT)), 'sum') AS BIGINT) AS sum_q,
       CAST(len(list_filter(qv, x -> abs(x) = 127)) AS BIGINT) AS n_sat
FROM codes
"""


def q_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 neighbors under the int8-quantized cosine for query ids
    < 10 — same query/rank contract as cosine_topk, integer inner
    products."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return qz.quantized_cosine_topk(
        emb, "embedding", "vec_id", query_ids_below=10, k=5
    )


ORACLE_QUANTIZED_TOPK = f"""
WITH {_DUCK_CODES},
withqq AS (
    SELECT vec_id, qv,
           list_aggregate(list_transform(qv, x -> CAST(x AS BIGINT) * x), 'sum') AS qq
    FROM codes
),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROUND(list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(c.qv AS DOUBLE[]))
                 / sqrt(CAST(q.qq AS DOUBLE) * CAST(c.qq AS DOUBLE)), 6) AS cosine_q
    FROM withqq q JOIN withqq c ON q.vec_id < 10 AND c.vec_id != q.vec_id
)
SELECT query_id, neighbor_id, cosine_q, rank FROM (
    SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cosine_q DESC, neighbor_id ASC) AS BIGINT) AS rank
    FROM scored
) WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# KS two-sample drift
# ---------------------------------------------------------------------------


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS distance between pre-1998 and 1998+ order-total
    distributions (dollar-rounded ECDF)."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    cut = F.lit("1998-01-01")
    # the cohorts partition ONE table by a predicate: the split form
    # computes both per-value counts in one scan + one aggregation
    # (identical rows to the two-filter + full-outer form; r9)
    return dfo.ks_two_sample_split(
        orders,
        F.col("o_orderdate") < cut,
        "o_totalprice",
        decimals=0,
    )


ORACLE_KS_DRIFT = """
WITH ca AS (
    SELECT round(o_totalprice, 0) AS v, COUNT(*) AS ca FROM orders
    WHERE o_orderdate < TIMESTAMP '1998-01-01' AND o_totalprice IS NOT NULL
    GROUP BY 1
),
cb AS (
    SELECT round(o_totalprice, 0) AS v, COUNT(*) AS cb FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_totalprice IS NOT NULL
    GROUP BY 1
),
j AS (
    SELECT COALESCE(ca.v, cb.v) AS v, COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
    FROM ca FULL OUTER JOIN cb ON ca.v = cb.v
),
cum AS (
    SELECT SUM(ca) OVER (ORDER BY v) AS cum_a,
           SUM(cb) OVER (ORDER BY v) AS cum_b,
           SUM(ca) OVER () AS n_a,
           SUM(cb) OVER () AS n_b
    FROM j
)
SELECT CAST(MAX(n_a) AS BIGINT) AS n_a,
       CAST(MAX(n_b) AS BIGINT) AS n_b,
       CAST(MAX(abs(cum_a * n_b - cum_b * n_a)) AS BIGINT) AS d_numer,
       ROUND(MAX(abs(cum_a * n_b - cum_b * n_a)) / (MAX(n_a) * MAX(n_b)), 6) AS ks_stat
FROM cum
"""


def q_ks_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS distance between WEEKEND and WEEKDAY event values — on a
    genuinely HIGH-CARDINALITY domain (exact integer micro-units of a
    continuous double: ~66% of rows are distinct values), so this query
    exercises the two-phase range-bucketed cumulative
    (:func:`operators.cumulative.bucketed_cumulative`) at the driver
    gate, where ``ks_drift``'s dollar-rounded domain stays small. The
    r4 verdict's failure mode — an unpartitioned ordered window over a
    distinct-value table ≈ the row count — is exactly what this plan
    must never contain (pinned in tests/test_round5_ops.py)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    dow = F.dayofweek(F.col("ts").cast("timestamp"))
    micro = ev.select(
        dow.alias("dw"),
        F.round(F.col("value") * 1000000, 0).alias("v_micro"),
    )
    # one-scan split form (r9): weekend/weekday partition the frame
    return dfo.ks_two_sample_split(
        micro,
        F.col("dw").isin(1, 7),
        "v_micro",
        decimals=0,
    )


# DuckDB dayofweek: Sun=0..Sat=6 vs Spark's 1..7 — weekend is {0, 6}
ORACLE_KS_VALUE_DRIFT = """
WITH base AS (
    SELECT dayofweek(ts) IN (0, 6) AS wkend,
           round(round(value * 1000000, 0), 0) AS v
    FROM events WHERE value IS NOT NULL
),
ca AS (SELECT v, COUNT(*) AS ca FROM base WHERE wkend GROUP BY 1),
cb AS (SELECT v, COUNT(*) AS cb FROM base WHERE NOT wkend GROUP BY 1),
j AS (
    SELECT COALESCE(ca.v, cb.v) AS v, COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
    FROM ca FULL OUTER JOIN cb ON ca.v = cb.v
),
cum AS (
    SELECT SUM(ca) OVER (ORDER BY v) AS cum_a,
           SUM(cb) OVER (ORDER BY v) AS cum_b,
           SUM(ca) OVER () AS n_a,
           SUM(cb) OVER () AS n_b
    FROM j
)
SELECT CAST(MAX(n_a) AS BIGINT) AS n_a,
       CAST(MAX(n_b) AS BIGINT) AS n_b,
       CAST(MAX(abs(cum_a * n_b - cum_b * n_a)) AS BIGINT) AS d_numer,
       ROUND(MAX(abs(cum_a * n_b - cum_b * n_a)) / (MAX(n_a) * MAX(n_b)), 6) AS ks_stat
FROM cum
"""


# ---------------------------------------------------------------------------
# Funnels + state history
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ["view", "click", "purchase"]


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase strict-order conversion funnel."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return fn.funnel_report(ev, "user_id", "ts", "event_type", FUNNEL_STEPS)


ORACLE_FUNNEL = """
WITH e AS (SELECT user_id AS u, event_type AS et, epoch_us(ts) AS t FROM events),
s1 AS (SELECT u, MIN(t) AS c FROM e WHERE et = 'view' GROUP BY u),
s2 AS (SELECT e.u, MIN(e.t) AS c FROM e JOIN s1 ON e.u = s1.u
       WHERE e.et = 'click' AND e.t >= s1.c GROUP BY e.u),
s3 AS (SELECT e.u, MIN(e.t) AS c FROM e JOIN s2 ON e.u = s2.u
       WHERE e.et = 'purchase' AND e.t >= s2.c GROUP BY e.u)
SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name, CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
UNION ALL
SELECT CAST(2 AS BIGINT), 'click', CAST(COUNT(*) AS BIGINT) FROM s2
UNION ALL
SELECT CAST(3 AS BIGINT), 'purchase', CAST(COUNT(*) AS BIGINT) FROM s3
"""


def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase funnel with a 48 h conversion window
    anchored at the user's first view (first-touch contract)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return fn.funnel_report_windowed(
        ev, "user_id", "ts", "event_type", FUNNEL_STEPS, within_seconds=48 * 3600
    )


ORACLE_FUNNEL_WINDOWED = """
WITH e AS (SELECT user_id AS u, event_type AS et, epoch_us(ts) AS t FROM events),
s1 AS (SELECT u, MIN(t) AS c, MIN(t) AS t0 FROM e WHERE et = 'view' GROUP BY u),
s2 AS (SELECT e.u, MIN(e.t) AS c, MIN(s1.t0) AS t0 FROM e JOIN s1 ON e.u = s1.u
       WHERE e.et = 'click' AND e.t >= s1.c
         AND e.t <= s1.t0 + CAST(48 AS BIGINT) * 3600 * 1000000 GROUP BY e.u),
s3 AS (SELECT e.u, MIN(e.t) AS c FROM e JOIN s2 ON e.u = s2.u
       WHERE e.et = 'purchase' AND e.t >= s2.c
         AND e.t <= s2.t0 + CAST(48 AS BIGINT) * 3600 * 1000000 GROUP BY e.u)
SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name, CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
UNION ALL
SELECT CAST(2 AS BIGINT), 'click', CAST(COUNT(*) AS BIGINT) FROM s2
UNION ALL
SELECT CAST(3 AS BIGINT), 'purchase', CAST(COUNT(*) AS BIGINT) FROM s3
"""


def q_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity intervals of each user's event_type stream."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return fn.state_history(ev, "user_id", "ts", "event_type", "event_id")


ORACLE_STATE_HISTORY = """
WITH e AS (
    SELECT user_id AS u, event_type AS state, epoch_us(ts) AS t, event_id AS rid
    FROM events
),
fl AS (
    SELECT *, CASE WHEN LAG(state) OVER (PARTITION BY u ORDER BY t, rid)
                        IS NOT DISTINCT FROM state THEN 0 ELSE 1 END AS new_run
    FROM e
),
runs AS (
    SELECT *, SUM(new_run) OVER (PARTITION BY u ORDER BY t, rid
                                 ROWS UNBOUNDED PRECEDING) AS run_id
    FROM fl
)
SELECT u AS user_id, state,
       MIN(t) AS valid_from_us,
       MAX(t) AS valid_to_us,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM runs GROUP BY u, run_id, state
"""


# ---------------------------------------------------------------------------
# Outlier / entropy profiling
# ---------------------------------------------------------------------------


def q_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outliers of order totals per priority class."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    return pr.iqr_outliers(orders, "o_totalprice", "o_orderpriority", k=1.5)


ORACLE_IQR_OUTLIERS = """
WITH qs AS (
    SELECT o_orderpriority AS g,
           quantile_cont(o_totalprice, 0.25) AS q1,
           quantile_cont(o_totalprice, 0.75) AS q3
    FROM orders GROUP BY 1
)
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MAX(q1), 6) AS q1,
       ROUND(MAX(q3), 6) AS q3,
       CAST(SUM(CASE WHEN o_totalprice < q1 - 1.5 * (q3 - q1) THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       CAST(SUM(CASE WHEN o_totalprice > q3 + 1.5 * (q3 - q1) THEN 1 ELSE 0 END) AS BIGINT) AS n_high
FROM orders o JOIN qs ON o.o_orderpriority = qs.g
GROUP BY 1
"""


def q_cat_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix Shannon entropy per document source."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return pr.categorical_entropy(docs, "lang", "source")


ORACLE_CAT_ENTROPY = """
WITH counts AS (
    SELECT source AS g, lang AS c, COUNT(*) AS n
    FROM documents WHERE lang IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT g, SUM(n) AS tot FROM counts GROUP BY g)
SELECT counts.g AS source,
       CAST(MAX(tot) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS n_cats,
       ROUND(-SUM((n / tot) * ln(n / tot)), 6) AS entropy
FROM counts JOIN tot USING (g)
GROUP BY counts.g
"""


# ---------------------------------------------------------------------------
# Event transitions + rolling metrics
# ---------------------------------------------------------------------------


def q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts of the event stream."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return fn.transition_matrix(ev, "user_id", "ts", "event_type", "event_id")


ORACLE_TRANSITIONS = """
WITH e AS (
    SELECT user_id AS u, event_type AS from_state, epoch_us(ts) AS t, event_id AS rid
    FROM events
),
nxt AS (
    SELECT from_state,
           LEAD(from_state) OVER (PARTITION BY u ORDER BY t, rid) AS to_state
    FROM e
)
SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS n
FROM nxt WHERE to_state IS NOT NULL
GROUP BY from_state, to_state
"""


def q_rolling_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-3 rolling mean/min/max of event value per user."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return fn.rolling_stats(ev, "user_id", "ts", "value", "event_id", n_rows=3)


ORACLE_ROLLING_VALUES = """
SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
       ROUND(AVG(value) OVER w, 6) AS roll_mean,
       MIN(value) OVER w AS roll_min,
       MAX(value) OVER w AS roll_max
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# Cross-table temporal consistency + argmax-per-group + correlations
# ---------------------------------------------------------------------------


def q_date_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifecycle ordering audit: a line item must not ship before its
    order was placed. Co-partitioned fact-fact join on the order key
    (bucket both sides by orderkey at scale), then one wide
    conditional aggregate per linestatus."""
    from data_quality_checks_in_relational_database_spark.operators.completeness import (
        date_order_violations,
    )

    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    j = t["lineitem"].join(
        t["orders"], F.col("l_orderkey") == F.col("o_orderkey")
    )
    return date_order_violations(
        j, [("o_orderdate", "l_shipdate")], group_col="l_linestatus"
    )


ORACLE_DATE_ORDER = """
SELECT l_linestatus,
       'o_orderdate<=l_shipdate' AS rule,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN o_orderdate > l_shipdate THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
       CAST(SUM(CASE WHEN o_orderdate IS NULL OR l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_pairs
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_linestatus
"""


def q_top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax-per-group: each nation's highest-spending customer (spend
    in exact integer cents; ties break to the lower custkey). Customer
    spend pre-aggregates before the window, so the ranked frame is one
    row per customer — the window shuffle is bounded by customer
    cardinality, and nation/customer dims broadcast."""
    from data_quality_checks_in_relational_database_spark.functions.scalars import money_sum

    t = load_tables(spark, sf_dir, ("orders", "customer", "nation"))
    spend = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(money_sum(F.col("o_totalprice")).alias("spend"))
    )
    from pyspark.sql.window import Window

    ranked = (
        spend.join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("n_name").orderBy(
                    F.col("spend").desc(), F.col("c_custkey").asc()
                )
            ),
        )
        .filter(F.col("rk") == 1)
    )
    return ranked.select(
        F.col("n_name").alias("nation"),
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("cust_name"),
        "spend",
    )


ORACLE_TOP_CUSTOMER = """
WITH spend AS (
    SELECT o_custkey, CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS spend
    FROM orders GROUP BY o_custkey
),
ranked AS (
    SELECT n_name AS nation, c_custkey AS custkey, c_name AS cust_name, spend,
           ROW_NUMBER() OVER (PARTITION BY n_name
                              ORDER BY spend DESC, c_custkey ASC) AS rk
    FROM spend
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
)
SELECT nation, custkey, cust_name, spend FROM ranked WHERE rk = 1
"""


def q_numeric_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation / sample covariance across the
    lineitem numeric measures — the relationship-drift profile (a
    broken discount feed shows up as a corr flip long before totals
    move). One scan, all pairs in a single wide aggregate."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    pairs = [
        ("l_quantity", "l_extendedprice"),
        ("l_discount", "l_extendedprice"),
        ("l_quantity", "l_discount"),
        ("l_tax", "l_discount"),
    ]
    wide = li.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.round(F.corr(a, b), 6).alias(f"c{i}") for i, (a, b) in enumerate(pairs)],
        *[F.round(F.covar_samp(a, b), 6).alias(f"v{i}") for i, (a, b) in enumerate(pairs)],
    )
    parts = [
        wide.select(
            F.lit(f"{a}~{b}").alias("pair"),
            F.col("__n").cast("long").alias("n"),
            F.col(f"c{i}").alias("corr"),
            F.col(f"v{i}").alias("covar_samp"),
        )
        for i, (a, b) in enumerate(pairs)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


ORACLE_NUMERIC_CORR = """
SELECT 'l_quantity~l_extendedprice' AS pair, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(corr(l_quantity, l_extendedprice), 6) AS corr,
       ROUND(covar_samp(l_quantity, l_extendedprice), 6) AS covar_samp
FROM lineitem
UNION ALL
SELECT 'l_discount~l_extendedprice', CAST(COUNT(*) AS BIGINT),
       ROUND(corr(l_discount, l_extendedprice), 6),
       ROUND(covar_samp(l_discount, l_extendedprice), 6)
FROM lineitem
UNION ALL
SELECT 'l_quantity~l_discount', CAST(COUNT(*) AS BIGINT),
       ROUND(corr(l_quantity, l_discount), 6),
       ROUND(covar_samp(l_quantity, l_discount), 6)
FROM lineitem
UNION ALL
SELECT 'l_tax~l_discount', CAST(COUNT(*) AS BIGINT),
       ROUND(corr(l_tax, l_discount), 6),
       ROUND(covar_samp(l_tax, l_discount), 6)
FROM lineitem
"""


# ---------------------------------------------------------------------------
# Stream-stream join (batch twin)
# ---------------------------------------------------------------------------


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """click -> purchase attribution within 30 minutes per user — the
    batch twin of the watermarked stream-stream join
    (streaming/joins.py; stream ≡ batch pinned in
    tests/test_streaming.py)."""
    from data_quality_checks_in_relational_database_spark.streaming.joins import (
        attribute_events,
    )

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return attribute_events(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        "user_id",
        "ts",
        "event_id",
        max_delay="30 minutes",
    )


ORACLE_ATTRIBUTION = """
SELECT c.user_id,
       c.event_id AS first_id,
       p.event_id AS second_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS delay_us
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts
 AND epoch_us(p.ts) - epoch_us(c.ts) <= 30 * 60 * 1000000
"""


# ---------------------------------------------------------------------------
# Sequence packing + corpus mixture
# ---------------------------------------------------------------------------

from data_quality_checks_in_relational_database_spark.operators import packing as pk
from data_quality_checks_in_relational_database_spark.operators import text as tx

_PACK_CAP = 512
_PACK_STREAMS = 8
_DUCK_TOKS = f"""
toks AS (
    SELECT doc_id, doc_id % {_PACK_STREAMS} AS stream,
           CAST(len(regexp_extract_all(text, '{{BPE}}')) AS BIGINT) AS n_tokens
    FROM documents
)
"""


def _duck_toks() -> str:
    return _DUCK_TOKS.replace("{BPE}", tx.BPE_TOKEN_PATTERN)


def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-chunk packing plan (512-token windows,
    8 streams): per-doc chunk placement + split flag."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return pk.concat_chunk_plan(docs, "text", "doc_id", cap=_PACK_CAP, n_streams=_PACK_STREAMS)


def _oracle_pack_chunks() -> str:
    return f"""
WITH {_duck_toks()},
c AS (
    SELECT *, SUM(n_tokens) OVER (PARTITION BY stream ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS e
    FROM toks
)
SELECT doc_id, stream, n_tokens,
       CAST(e - n_tokens AS BIGINT) AS start_offset,
       CAST(FLOOR((e - n_tokens) / {_PACK_CAP}) AS BIGINT) AS chunk_first,
       CAST(FLOOR(CASE WHEN n_tokens > 0 THEN (e - 1.0) / {_PACK_CAP}
                       ELSE (e - n_tokens) / {_PACK_CAP} END) AS BIGINT) AS chunk_last,
       FLOOR(CASE WHEN n_tokens > 0 THEN (e - 1.0) / {_PACK_CAP}
                  ELSE (e - n_tokens) / {_PACK_CAP} END)
         > FLOOR((e - n_tokens) / {_PACK_CAP}) AS is_split
FROM c
"""


def q_pack_next_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-split next-fit packing (512-token bins, 8 streams) — the
    stateful applyInPandas scan; oracle replays the identical scan as
    a recursive CTE."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return pk.next_fit_bins(docs, "text", "doc_id", cap=_PACK_CAP, n_streams=_PACK_STREAMS)


def _oracle_pack_next_fit() -> str:
    return f"""
WITH RECURSIVE {_duck_toks()},
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY stream ORDER BY doc_id) AS idx
    FROM toks
),
scan(stream, idx, doc_id, n_tokens, bin_id, bin_fill) AS (
    SELECT stream, idx, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
    FROM ranked WHERE idx = 1
    UNION ALL
    SELECT t.stream, t.idx, t.doc_id, t.n_tokens,
           CASE WHEN s.bin_fill + t.n_tokens > {_PACK_CAP}
                THEN s.bin_id + 1 ELSE s.bin_id END,
           CASE WHEN s.bin_fill + t.n_tokens > {_PACK_CAP}
                THEN t.n_tokens ELSE s.bin_fill + t.n_tokens END
    FROM ranked t JOIN scan s ON t.stream = s.stream AND t.idx = s.idx + 1
)
SELECT doc_id, stream, n_tokens, CAST(bin_id AS BIGINT) AS bin_id,
       CAST(bin_fill AS BIGINT) AS bin_fill
FROM scan
"""


def q_pack_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream next-fit packing efficiency."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    packed = pk.next_fit_bins(docs, "text", "doc_id", cap=_PACK_CAP, n_streams=_PACK_STREAMS)
    return pk.packing_summary(packed, cap=_PACK_CAP)


def _oracle_pack_summary() -> str:
    return f"""
WITH RECURSIVE {_duck_toks()},
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY stream ORDER BY doc_id) AS idx
    FROM toks
),
scan(stream, idx, doc_id, n_tokens, bin_id, bin_fill) AS (
    SELECT stream, idx, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
    FROM ranked WHERE idx = 1
    UNION ALL
    SELECT t.stream, t.idx, t.doc_id, t.n_tokens,
           CASE WHEN s.bin_fill + t.n_tokens > {_PACK_CAP}
                THEN s.bin_id + 1 ELSE s.bin_id END,
           CASE WHEN s.bin_fill + t.n_tokens > {_PACK_CAP}
                THEN t.n_tokens ELSE s.bin_fill + t.n_tokens END
    FROM ranked t JOIN scan s ON t.stream = s.stream AND t.idx = s.idx + 1
)
SELECT stream,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MAX(bin_id) + 1 AS BIGINT) AS n_bins,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(n_tokens) AS DOUBLE) / ((MAX(bin_id) + 1) * {_PACK_CAP}), 6) AS fill_ratio
FROM scan
GROUP BY stream
"""


TARGET_MIX = {"web": 0.5, "wiki": 0.2, "books": 0.2, "code": 0.1}


def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-share mixture weights against the declared
    TARGET_MIX (sources outside the plan get target 0)."""
    from data_quality_checks_in_relational_database_spark.operators.sampling import (
        mixture_weights,
    )

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return mixture_weights(
        docs, "source", tx.bpe_token_count(F.col("text")), TARGET_MIX
    )


def _oracle_mixture_weights() -> str:
    case = "CASE " + " ".join(
        f"WHEN source = '{k}' THEN CAST({float(v)} AS DOUBLE)"
        for k, v in sorted(TARGET_MIX.items())
    ) + " ELSE 0.0 END"
    return f"""
WITH per AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(len(regexp_extract_all(text, '{{BPE}}')) AS BIGINT)) AS BIGINT) AS total_weight
    FROM documents GROUP BY source
),
tot AS (SELECT SUM(total_weight) AS t FROM per)
SELECT source, n_rows, total_weight,
       ROUND(total_weight / t, 6) AS actual_frac,
       {case} AS target_frac,
       ROUND(({case}) / (total_weight / t), 6) AS sample_weight
FROM per, tot
""".replace("{BPE}", tx.BPE_TOKEN_PATTERN)


ORACLE_PACK_CHUNKS = _oracle_pack_chunks()
ORACLE_PACK_NEXT_FIT = _oracle_pack_next_fit()
ORACLE_PACK_SUMMARY = _oracle_pack_summary()
ORACLE_MIXTURE_WEIGHTS = _oracle_mixture_weights()


# ---------------------------------------------------------------------------
# Mergeable HLL distinct sketches + unpivot surface
# ---------------------------------------------------------------------------


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct users via DataSketches HLL, gated
    against the exact count with a ±5% tolerance boolean (same gating
    pattern as approx_distinct: exact columns hash-checked, the sketch
    estimate participates only through within_tol)."""
    from data_quality_checks_in_relational_database_spark.operators.observe import (
        hll_distinct_by_group,
    )

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    sk = hll_distinct_by_group(ev, "user_id", "event_type")
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("exact_distinct")
    )
    return (
        sk.join(exact, "event_type")
        .select(
            "event_type",
            "n_rows",
            "exact_distinct",
            (
                F.abs(F.col("distinct_est") - F.col("exact_distinct"))
                <= F.col("exact_distinct") * 0.05
            ).alias("within_tol"),
        )
    )


ORACLE_HLL_DISTINCT = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
       TRUE AS within_tol
FROM events GROUP BY event_type
"""


def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level distinct users obtained by MERGING the per-type
    sketches (never re-reading raw events) vs the exact global count —
    the incremental-audit contract: the union estimate must stay
    within 5% of truth."""
    from data_quality_checks_in_relational_database_spark.operators.observe import (
        hll_distinct_by_group,
        hll_merge_groups,
    )

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    merged = hll_merge_groups(hll_distinct_by_group(ev, "user_id", "event_type"))
    exact = ev.agg(F.count_distinct("user_id").cast("long").alias("exact_distinct"))
    return merged.crossJoin(exact).select(
        "n_groups",
        "exact_distinct",
        (
            F.abs(F.col("distinct_est") - F.col("exact_distinct"))
            <= F.col("exact_distinct") * 0.05
        ).alias("within_tol"),
    )


ORACLE_HLL_ROLLUP = """
SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_groups,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
       TRUE AS within_tol
FROM events
"""


def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide -> long unpivot (stack) of per-returnflag lineitem measures
    in exact integer cents/units — the report-normalization surface
    (inverse of the consistency pivot A4)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    wide = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        # integer cents directly (money_sum's /100 then *100 would
        # reintroduce a double rounding step)
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
            "sum_price_cents"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return wide.select(
        "l_returnflag",
        F.expr(
            "stack(3, 'sum_qty', sum_qty, 'sum_price_cents', sum_price_cents,"
            " 'n_rows', n_rows) AS (measure, value)"
        ),
    )


ORACLE_UNPIVOT_MEASURES = """
WITH wide AS (
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
UNION ALL
SELECT l_returnflag, 'sum_price_cents', sum_price_cents FROM wide
UNION ALL
SELECT l_returnflag, 'n_rows', n_rows FROM wide
"""


# ---------------------------------------------------------------------------
# VARIANT (semi-structured) surface
# ---------------------------------------------------------------------------


def q_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props handled through Spark's native VARIANT
    type (parse once into the binary variant encoding, then typed
    path extraction) rather than per-access JSON string re-parsing —
    at 100 TB the single parse + columnar variant beats N×
    get_json_object string scans. try_* variants make malformed rows
    NULL instead of failing the job."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    k = F.try_variant_get(F.try_parse_json(F.col("props")), "$.k", "int")
    return (
        ev.select(F.col("event_type"), k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("k").isNull().cast("long")).cast("long").alias("n_missing_k"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
        )
    )


ORACLE_VARIANT_STATS = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS INT) IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_k,
       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(MIN(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS min_k,
       CAST(MAX(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS max_k
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Composed quality filter + end-to-end corpus clean
# ---------------------------------------------------------------------------

_DUCK_QF = """
qf AS (
    SELECT doc_id, source,
           len(t) AS n_tokens,
           COALESCE(length(text), 0) AS n_chars,
           COALESCE(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')), 0) AS n_punct,
           len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is','it'))) AS n_stop,
           CASE WHEN len(t) >= 3 THEN len(t) - 2 ELSE 0 END AS n_grams,
           CASE WHEN len(t) >= 3 THEN len(list_distinct(
               [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]
           )) ELSE 0 END AS n_distinct
    FROM (SELECT doc_id, source, text, {TOKS} AS t FROM documents)
),
flagged AS (
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           CASE
             WHEN n_tokens < 20 THEN 'too_short'
             WHEN n_tokens > 100000 THEN 'too_long'
             WHEN n_punct * 1000 > 150 * n_chars THEN 'high_punct'
             WHEN n_stop * 1000 < 10 * n_tokens THEN 'low_stopword'
             WHEN (n_grams - n_distinct) * 1000 > 300 * n_grams THEN 'high_repetition'
           END AS reason
    FROM qf
)
"""


def _duck_qf() -> str:
    toks = ("CASE WHEN length(trim(text)) = 0 THEN [] "
            "ELSE string_split_regex(trim(lower(text)), '\\s+') END")
    return _DUCK_QF.replace("{TOKS}", toks)


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document composed C4/Gopher filter verdicts (first failing
    rule = reason; pure integer cross-multiplication comparisons)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return tx.quality_filter(docs, keep_cols=["source"])


def _oracle_quality_filter() -> str:
    return f"""
WITH {_duck_qf()}
SELECT doc_id, source, n_tokens, reason IS NULL AS keep, reason FROM flagged
"""


def q_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus cleaning summary per source: quality filter →
    exact dedup of survivors (md5 fingerprint, min-doc_id
    representative) → final doc/token counts. The composition query:
    every stage is an existing oracle-gated operator, chained the way
    a production corpus build runs them."""
    from pyspark import StorageLevel

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    # one pass tokenizes + filters + fingerprints; the small verdict
    # frame (ids + counters, no text) is persisted because BOTH the
    # per-source summary and the dedup branch consume it — without the
    # persist each branch re-runs the whole text pipeline
    verdict = tx.quality_filter(
        docs, keep_cols=["source"], with_fingerprint=True
    ).persist(StorageLevel.MEMORY_AND_DISK)
    kept = verdict.filter(F.col("keep"))
    reps = kept.groupBy("fingerprint").agg(F.min("doc_id").alias("rep_id"))
    final = kept.join(
        reps, (kept["fingerprint"] == reps["fingerprint"])
        & (kept["doc_id"] == reps["rep_id"]),
    )
    per_source = verdict.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("keep").cast("long")).cast("long").alias("n_kept"),
    )
    final_source = final.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_final"),
        F.sum("n_tokens").cast("long").alias("final_tokens"),
    )
    return per_source.join(final_source, "source")


def _oracle_corpus_clean() -> str:
    toks = ("CASE WHEN length(trim(text)) = 0 THEN [] "
            "ELSE string_split_regex(trim(lower(text)), '\\s+') END")
    return f"""
WITH {_duck_qf()},
fp AS (
    SELECT doc_id, md5(array_to_string({toks}, ' ')) AS fingerprint
    FROM documents
),
kept AS (
    SELECT f.doc_id, f.source, f.n_tokens, fp.fingerprint
    FROM flagged f JOIN fp ON f.doc_id = fp.doc_id
    WHERE f.reason IS NULL
),
reps AS (SELECT fingerprint, MIN(doc_id) AS rep_id FROM kept GROUP BY fingerprint),
final AS (
    SELECT k.* FROM kept k JOIN reps r
      ON k.fingerprint = r.fingerprint AND k.doc_id = r.rep_id
),
per_source AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN reason IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM flagged GROUP BY source
),
final_source AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_final,
           CAST(SUM(n_tokens) AS BIGINT) AS final_tokens
    FROM final GROUP BY source
)
SELECT per_source.source, n_docs, n_kept, n_final, final_tokens
FROM per_source JOIN final_source ON per_source.source = final_source.source
"""


ORACLE_QUALITY_FILTER = _oracle_quality_filter()
ORACLE_CORPUS_CLEAN = _oracle_corpus_clean()


# ---------------------------------------------------------------------------
# Time-grid resample with forward fill
# ---------------------------------------------------------------------------


def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly grid per event_type with forward-filled last value —
    gap-filling for irregular metric streams."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return fn.resample_ffill(ev, "event_type", "ts", "value", bucket="1 hour")


ORACLE_RESAMPLE_FFILL = """
WITH pb AS (
    SELECT event_type AS k, time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS bs,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           (ARRAY_AGG(value ORDER BY ts DESC, value DESC))[1] AS last_value
    FROM events GROUP BY 1, 2
),
spans AS (SELECT k, MIN(bs) AS lo, MAX(bs) AS hi FROM pb GROUP BY k),
grid AS (
    SELECT k, UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bs FROM spans
),
j AS (
    SELECT g.k, g.bs, pb.n_obs, pb.last_value
    FROM grid g LEFT JOIN pb ON g.k = pb.k AND g.bs = pb.bs
)
SELECT k AS event_type, bs AS bucket_start,
       COALESCE(n_obs, 0) AS n_obs,
       LAST_VALUE(last_value IGNORE NULLS) OVER (
           PARTITION BY k ORDER BY bs ROWS UNBOUNDED PRECEDING) AS value_ffill,
       n_obs IS NULL AS is_filled
FROM j
"""


def q_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding statistics (feature-scaling profile)."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return eq.dim_stats(emb, "embedding", "vec_id")


ORACLE_DIM_STATS = """
WITH ex AS (
    SELECT i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS val
    FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
)
SELECT CAST(pos AS INT) AS pos,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(val), 6) AS mean,
       ROUND(stddev_samp(val), 6) AS std,
       MIN(val) AS min_val,
       MAX(val) AS max_val
FROM ex
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Backfill planning + skew-safe exact distinct
# ---------------------------------------------------------------------------


def q_backfill_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous missing-day ranges per event_type (the actionable
    form of temporal_gaps)."""
    from data_quality_checks_in_relational_database_spark.operators.completeness import (
        backfill_ranges,
    )

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return backfill_ranges(ev, "event_type", "ts")


ORACLE_BACKFILL_RANGES = """
WITH days AS (
    SELECT DISTINCT event_type AS series, CAST(ts AS DATE) AS day FROM events
),
spans AS (SELECT series, MIN(day) AS d0, MAX(day) AS d1 FROM days GROUP BY series),
cal AS (
    SELECT series, CAST(UNNEST(generate_series(CAST(d0 AS TIMESTAMP),
                                CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
    FROM spans
),
gaps AS (
    SELECT c.series, c.day FROM cal c LEFT JOIN days d
      ON c.series = d.series AND c.day = d.day
    WHERE d.day IS NULL
),
brk AS (
    SELECT *, CASE WHEN day - LAG(day) OVER (PARTITION BY series ORDER BY day) = 1
                   THEN 0 ELSE 1 END AS brk
    FROM gaps
),
runs AS (
    SELECT *, SUM(brk) OVER (PARTITION BY series ORDER BY day
                             ROWS UNBOUNDED PRECEDING) AS run_id
    FROM brk
)
SELECT series, MIN(day) AS gap_start, MAX(day) AS gap_end,
       CAST(COUNT(*) AS BIGINT) AS n_days
FROM runs GROUP BY series, run_id
"""


def q_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe EXACT distinct users per event type (two-phase:
    composite-key dedup then collapsed count — a hot event type never
    serializes one reducer)."""
    from data_quality_checks_in_relational_database_spark.operators.skew import (
        two_phase_distinct_count,
    )

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return two_phase_distinct_count(ev, "event_type", "user_id")


ORACLE_DISTINCT_USERS = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Skew diagnostics + skew-safe join (round 2)
# ---------------------------------------------------------------------------


def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaviest join keys for lineitem.l_partkey — the measurement that
    decides between plain join / AQE skew split / explicit salting."""
    from data_quality_checks_in_relational_database_spark.operators.skew import (
        key_skew_report,
    )

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return key_skew_report(li, "l_partkey", top_n=10)


ORACLE_KEY_SKEW = """
WITH counts AS (
    SELECT l_partkey AS key, CAST(COUNT(*) AS BIGINT) AS key_count
    FROM lineitem GROUP BY 1
),
tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(key_count) AS BIGINT) AS total_rows
    FROM counts
),
top AS (
    SELECT key, key_count,
           CAST(ROW_NUMBER() OVER (ORDER BY key_count DESC, key ASC) AS BIGINT) AS rank
    FROM counts
)
SELECT key, key_count, rank, n_keys, total_rows,
       key_count / CAST(total_rows AS DOUBLE) AS share
FROM top, tot WHERE rank <= 10
"""


def q_salted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order status through the SALTED fact⋈dim join —
    row-identical to the plain join (the differential gate proves it),
    with the hot l_orderkey spread over 8 sub-keys. At 100 TB this is
    the fallback for keys AQE's skew split cannot break up."""
    from data_quality_checks_in_relational_database_spark.functions.scalars import money_sum
    from data_quality_checks_in_relational_database_spark.operators.skew import salted_join

    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    li, orders = t["lineitem"], t["orders"]
    dim = orders.select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    # project the fact to the needed columns BEFORE salting — the salt
    # hash references its inputs, so salting the full-width row would
    # block column pruning at the scan (see salted_join docstring)
    fact = li.select("l_orderkey", "l_extendedprice", "l_discount")
    joined = salted_join(fact, dim, "l_orderkey", n_salts=8)
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ),
    )


ORACLE_SALTED_REVENUE = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT)
         / 100.0 AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# Semantic (embedding-space) dedup: pairs -> components -> clusters
# ---------------------------------------------------------------------------


def q_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic dedup over the embedding column:
    cosine-similar pairs (>= 0.4 on this near-orthogonal synthetic
    corpus; >= ~0.95 on real encoder output) -> connected components
    -> cluster report with deterministic representatives. Pairs come
    from the DISTRIBUTED exact block-pair join (no full-corpus driver
    collect; per-task memory O(n·dim/B)) — chosen over LSH candidates
    because at threshold 0.4 the surviving pairs sit near 66° where
    signature-blocking recall collapses, and the oracle demands exact
    recall. At thresholds ≥0.9 the sub-quadratic swap-in is
    ``similarity.hyperplane_lsh_neardup`` with identical downstream
    clustering."""
    from data_quality_checks_in_relational_database_spark.operators.cluster import (
        dedup_clusters,
    )
    from data_quality_checks_in_relational_database_spark.operators.similarity import (
        cosine_allpairs_blockjoin,
    )

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    pairs = cosine_allpairs_blockjoin(emb, threshold=0.4)
    return dedup_clusters(pairs, "vec_id_a", "vec_id_b").select(
        F.col("doc_id").alias("vec_id"), "cluster_id", "cluster_size", "is_representative"
    )


def _semantic_clusters_oracle(threshold: float) -> str:
    return f"""
WITH RECURSIVE unit AS (
    SELECT vec_id,
           CAST(embedding AS DOUBLE[]) AS v,
           SQRT(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings
),
pairs AS (
    SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
    FROM unit a JOIN unit b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= {threshold}
),
edges AS (
    SELECT vec_id_a AS src, vec_id_b AS dst FROM pairs
    UNION ALL
    SELECT vec_id_b, vec_id_a FROM pairs
),
reach(node, label) AS (
    SELECT DISTINCT src, src FROM edges
    UNION
    SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
),
comp AS (SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY node),
sized AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY cluster_id)
SELECT c.node AS vec_id, c.cluster_id, s.cluster_size,
       c.node = c.cluster_id AS is_representative
FROM comp c JOIN sized s USING (cluster_id)
"""


ORACLE_SEMANTIC_CLUSTERS = _semantic_clusters_oracle(0.4)

#: banded SRP-LSH twin settings (shared by the three *_lsh queries and
#: the recall-pinning pytest). Threshold 0.45 is the highest at which
#: the SYNTHETIC near-orthogonal corpus still HAS pairs (max pairwise
#: cosine ≈ 0.51 at every shipped SF — a ≥0.8 "production" gate would
#: be vacuously empty, the survival_km failure mode); banding recall at
#: these settings is empirically 1.0 at sf0.001/0.01/0.1, pinned in
#: tests/test_round4_ops.py, so the twins hash-match the SAME exact
#: recursive-CTE oracles. The genuinely-selective production regime
#: (threshold ≥0.9, r=12/L=8) is pinned on a constructed fixture.
_LSH_THR = 0.45
_LSH_BANDS = 48
_LSH_BITS = 4


def _lsh_pairs(emb):
    from data_quality_checks_in_relational_database_spark.operators.similarity import (
        srp_banded_neardup,
    )

    return srp_banded_neardup(
        emb, threshold=_LSH_THR, n_bands=_LSH_BANDS, band_bits=_LSH_BITS
    )


def q_semantic_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-quadratic-candidate twin of ``semantic_clusters``: pairs
    from banded SRP-LSH candidates + exact verify instead of the exact
    blocked all-pairs join; identical downstream clustering, same
    oracle shape at the twin threshold (recall pinned 1.0)."""
    from data_quality_checks_in_relational_database_spark.operators.cluster import (
        dedup_clusters,
    )

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return dedup_clusters(_lsh_pairs(emb), "vec_id_a", "vec_id_b").select(
        F.col("doc_id").alias("vec_id"), "cluster_id", "cluster_size", "is_representative"
    )


ORACLE_SEMANTIC_CLUSTERS_LSH = _semantic_clusters_oracle(_LSH_THR)


# ---------------------------------------------------------------------------
# k-NN label agreement (mislabel probe)
# ---------------------------------------------------------------------------


def q_knn_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return eq.knn_label_agreement(emb, k=5, probe_mod=10)


ORACLE_KNN_AGREEMENT = """
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
    FROM unit q JOIN unit c ON q.vec_id % 10 = 0 AND c.vec_id != q.vec_id
),
nn AS (
    SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM scored
    ) WHERE rank <= 5
)
SELECT q_label AS label,
       CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
       CAST(COUNT(*) AS BIGINT) AS n_neighbors,
       CAST(SUM(CASE WHEN n_label = q_label THEN 1 ELSE 0 END) AS BIGINT) AS n_same_label,
       CAST(SUM(CASE WHEN n_label = q_label THEN 1 ELSE 0 END) AS BIGINT)
         / CAST(COUNT(*) AS DOUBLE) AS agreement
FROM nn GROUP BY q_label
"""


# ---------------------------------------------------------------------------
# GROUPING SETS + TPC-H Q3-shaped shipping priority (shared SQL texts)
# ---------------------------------------------------------------------------

#: Same SQL text runs on Spark and DuckDB: COALESCE sentinels mark the
#: subtotal levels (the grouped columns are never NULL in the data),
#: and the quantity sum is exact integer cents so the value hash is
#: engine-portable.
SQL_GROUPING_SETS = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS qty_cents
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level subtotals in ONE pass (Catalyst expands grouping
    sets into a single Expand+Aggregate — no per-level rescans)."""
    from data_quality_checks_in_relational_database_spark.session import register_views

    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(SQL_GROUPING_SETS)


SQL_SHIPPING_PRIORITY = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_cents DESC, l_orderkey ASC
LIMIT 10
"""


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped top-10 unshipped-revenue orders. Plan shape to
    want at scale: both dimension filters push to the scans, customer
    broadcasts, the orders⋈lineitem join shuffles on the orderkey, and
    the top-10 runs as TakeOrderedAndProject (per-partition heads, no
    global sort)."""
    from data_quality_checks_in_relational_database_spark.session import register_views

    register_views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(SQL_SHIPPING_PRIORITY)


# ---------------------------------------------------------------------------
# FK containment discovery + seasonal anomalies + windowed distinct
# ---------------------------------------------------------------------------


def q_fk_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity containment over the schema's declared
    candidate FKs — run before trusting any join at 100 TB."""
    from data_quality_checks_in_relational_database_spark.operators.completeness import (
        fk_containment_report,
    )

    t = load_tables(
        spark, sf_dir, ("lineitem", "orders", "part", "customer")
    )
    return fk_containment_report(
        [
            ("lineitem.l_orderkey->orders", t["lineitem"], "l_orderkey", t["orders"], "o_orderkey"),
            ("lineitem.l_partkey->part", t["lineitem"], "l_partkey", t["part"], "p_partkey"),
            ("orders.o_custkey->customer", t["orders"], "o_custkey", t["customer"], "c_custkey"),
        ]
    )


ORACLE_FK_DISCOVERY = """
WITH rel AS (
    SELECT 'lineitem.l_orderkey->orders' AS relation,
           (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem WHERE l_orderkey IS NOT NULL) AS n_child,
           (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem
             WHERE l_orderkey IS NOT NULL
               AND l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL)) AS n_orph
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           (SELECT COUNT(DISTINCT l_partkey) FROM lineitem WHERE l_partkey IS NOT NULL),
           (SELECT COUNT(DISTINCT l_partkey) FROM lineitem
             WHERE l_partkey IS NOT NULL
               AND l_partkey NOT IN (SELECT p_partkey FROM part WHERE p_partkey IS NOT NULL))
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           (SELECT COUNT(DISTINCT o_custkey) FROM orders WHERE o_custkey IS NOT NULL),
           (SELECT COUNT(DISTINCT o_custkey) FROM orders
             WHERE o_custkey IS NOT NULL
               AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL))
)
SELECT relation,
       CAST(n_child AS BIGINT) AS n_child_keys,
       CAST(n_orph AS BIGINT) AS n_orphan_keys,
       (n_child - n_orph) / CAST(n_child AS DOUBLE) AS containment
FROM rel
"""


def q_dow_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware volume control chart: each (event_type, day)
    count z-scored against that type's SAME-WEEKDAY baseline — volume
    checks without the weekday baseline page on-call every Saturday.

    The variance comes from exact integer sums (Σn, Σn² as BIGINTs;
    one closed-form double expression at the end), so the z-scores are
    bit-identical across engines and partitionings — no streaming-
    variance merge-order drift. Plan: two grouped integer aggs + a
    broadcast-sized baseline join (|types| × 7 rows).
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = ev.groupBy(
        F.col("event_type"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    daily = daily.withColumn("dow", (F.dayofweek("day") - 1).cast("int"))
    base = daily.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n_events").alias("sum_n"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("sum_n2"),
    )
    j = daily.join(F.broadcast(base), ["event_type", "dow"])
    mean = F.col("sum_n") / F.col("n_days")
    var = (F.col("sum_n2") - F.col("sum_n") * F.col("sum_n") / F.col("n_days")) / (
        F.col("n_days") - 1
    )
    z = (F.col("n_events") - mean) / F.sqrt(var)
    return j.select(
        "event_type",
        "day",
        "dow",
        "n_events",
        F.round(mean, 6).alias("dow_mean"),
        F.round(
            F.when(F.col("n_days") > 1, F.sqrt(var)), 6
        ).alias("dow_std"),
        F.round(
            F.when((F.col("n_days") > 1) & (var > 0), z), 6
        ).alias("z_score"),
        F.coalesce(
            (F.abs(F.when((F.col("n_days") > 1) & (var > 0), z)) > 3.0),
            F.lit(False),
        ).alias("is_anomaly"),
    )


ORACLE_DOW_ANOMALIES = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1, 2
),
dd AS (
    SELECT *, CAST(date_part('dow', day) AS INT) AS dow FROM daily
),
base AS (
    SELECT event_type, dow,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(n_events) AS BIGINT) AS sum_n,
           CAST(SUM(n_events * n_events) AS BIGINT) AS sum_n2
    FROM dd GROUP BY 1, 2
),
j AS (
    SELECT dd.*, base.n_days, base.sum_n, base.sum_n2,
           base.sum_n / CAST(base.n_days AS DOUBLE) AS mean,
           (base.sum_n2 - base.sum_n * CAST(base.sum_n AS DOUBLE) / base.n_days)
             / (base.n_days - 1) AS var
    FROM dd JOIN base USING (event_type, dow)
)
SELECT event_type, day, dow, n_events,
       ROUND(mean, 6) AS dow_mean,
       ROUND(CASE WHEN n_days > 1 THEN SQRT(var) END, 6) AS dow_std,
       ROUND(CASE WHEN n_days > 1 AND var > 0
                  THEN (n_events - mean) / SQRT(var) END, 6) AS z_score,
       COALESCE(ABS(CASE WHEN n_days > 1 AND var > 0
                         THEN (n_events - mean) / SQRT(var) END) > 3.0,
                FALSE) AS is_anomaly
FROM j
"""


def q_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per sliding hour window (30-min hop),
    two-phase: dedup on the COMPOSITE (window, type, user) key first —
    a hot window never serializes one reducer — then count collapsed
    rows. The streaming face is the same aggregation under a
    watermark with ``approx_count_distinct`` when state must stay
    bounded."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = F.window("ts", "1 hour", "30 minutes")
    pairs = ev.select(
        w["start"].alias("window_start"), "event_type", "user_id"
    ).distinct()
    return pairs.groupBy("window_start", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_users")
    )


ORACLE_SLIDING_DISTINCT = """
SELECT window_start, event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_users
FROM (
    SELECT CAST(time_bucket(INTERVAL '30 minutes', ts)
                - o.off * INTERVAL '30 minutes' AS TIMESTAMP) AS window_start,
           event_type, user_id
    FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS off) o
)
GROUP BY 1, 2
"""


def q_label_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between per-label embedding
    centroids — the class-separability probe for labeled corpora
    (labels whose centroids nearly coincide are candidates for
    merging or relabel review).

    Centroids via one posexplode + (label, pos) avg — the vectors
    never shuffle, only 12-byte (pos, val) pairs; components are
    rounded to 6 dp BEFORE the cosine so double-sum partition-order
    drift cannot reach the output (the final round absorbs the
    remaining 1e-10-scale noise). The |labels|² centroid cross join
    is bounded and broadcast.
    """
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    comp = (
        emb.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("m"))
    )
    cent = comp.groupBy("label").agg(
        F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
    ).select(
        "label", F.transform("pm", lambda s: s["m"]).alias("centroid")
    )
    a, b = cent.alias("a"), cent.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.centroid"), F.col("b.centroid"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nrm = lambda side: F.sqrt(
        F.aggregate(
            F.col(f"{side}.centroid"), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    return (
        a.join(F.broadcast(b), F.col("a.label") < F.col("b.label"))
        .select(
            F.col("a.label").alias("label_a"),
            F.col("b.label").alias("label_b"),
            F.round(dot / (nrm("a") * nrm("b")), 6).alias("centroid_cosine"),
        )
    )


ORACLE_LABEL_CENTROID_SIM = """
WITH comp AS (
    SELECT label, i - 1 AS pos,
           ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 6) AS m
    FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
    GROUP BY 1, 2
),
cent AS (
    SELECT label, list(m ORDER BY pos) AS centroid FROM comp GROUP BY label
)
SELECT a.label AS label_a, b.label AS label_b,
       ROUND(list_dot_product(a.centroid, b.centroid)
             / (SQRT(list_dot_product(a.centroid, a.centroid))
                * SQRT(list_dot_product(b.centroid, b.centroid))), 6) AS centroid_cosine
FROM cent a JOIN cent b ON a.label < b.label
"""


def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantiles (Greenwald-Khanna, accuracy 1/10000)
    gated against exact interpolated percentiles — same contract as
    ``approx_distinct``: the exact columns are hash-checked, and the
    ``within_tol`` boolean turns the sketch's accuracy promise into a
    gate that goes red if the sketch drifts > 1% relative."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    qs = [0.25, 0.5, 0.75, 0.9]
    agg = o.agg(
        F.percentile("o_totalprice", F.array(*[F.lit(q) for q in qs])).alias("ex"),
        F.percentile_approx(
            "o_totalprice", F.array(*[F.lit(q) for q in qs]), 10000
        ).alias("ap"),
    )
    pairs = agg.select(
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(q) for q in qs]).alias("q"),
                F.col("ex").alias("exact"),
                F.col("ap").alias("approx"),
            )
        ).alias("z")
    )
    return pairs.select(
        F.col("z.q").alias("q"),
        F.round(F.col("z.exact"), 6).alias("exact_value"),
        (
            F.abs(F.col("z.approx") - F.col("z.exact"))
            <= F.abs(F.col("z.exact")) * 0.01
        ).alias("within_tol"),
    )


# quantile_cont requires CONSTANT quantile parameters in DuckDB, hence
# one UNION ALL branch per requested quantile
ORACLE_APPROX_QUANTILES = """
SELECT CAST(0.25 AS DOUBLE) AS q, ROUND(quantile_cont(o_totalprice, 0.25), 6) AS exact_value, TRUE AS within_tol FROM orders
UNION ALL
SELECT CAST(0.5 AS DOUBLE), ROUND(quantile_cont(o_totalprice, 0.5), 6), TRUE FROM orders
UNION ALL
SELECT CAST(0.75 AS DOUBLE), ROUND(quantile_cont(o_totalprice, 0.75), 6), TRUE FROM orders
UNION ALL
SELECT CAST(0.9 AS DOUBLE), ROUND(quantile_cont(o_totalprice, 0.9), 6), TRUE FROM orders
"""


# ---------------------------------------------------------------------------
# Time-RANGE window frame + grouped percentiles + incremental agg merge
# ---------------------------------------------------------------------------


def q_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1-hour metrics per event via a RANGE (time-based)
    window frame — the time-range twin of the ROWS-frame
    ``rolling_values``. Frames are defined on integer epoch SECONDS on
    both engines (sub-second precision would make frame membership
    engine-dependent); peers at the same second share a frame by RANGE
    semantics, so the result is deterministic. The windowed value sum
    is exact integer cents."""
    from pyspark.sql.window import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    # parquet TIMESTAMP_NTZ rejects a direct long cast; session tz is
    # UTC so NTZ->LTZ is numerically identity (same move as interval.py)
    sec = F.col("ts").cast("timestamp").cast("long")
    w = (
        Window.partitionBy("event_type")
        .orderBy(sec)
        .rangeBetween(-3599, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "event_type",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long"))
        .over(w)
        .alias("value_cents_1h"),
    )


ORACLE_RANGE_ROLLING = """
SELECT event_id, event_type,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER w AS BIGINT) AS value_cents_1h
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
"""


def q_group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group — distributed exact
    quantiles (sort-based within the aggregate), NOT a single-partition
    ntile; the sketch-gated variant is ``approx_quantiles``."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    qs = [0.5, 0.95]
    agg = li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.array(*[F.lit(q) for q in qs])).alias("p")
    )
    pairs = agg.select(
        "l_returnflag",
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(q) for q in qs]).alias("q"), F.col("p").alias("v")
            )
        ).alias("z"),
    )
    return pairs.select(
        "l_returnflag",
        F.col("z.q").alias("q"),
        F.round(F.col("z.v"), 6).alias("quantile_value"),
    )


ORACLE_GROUP_PERCENTILES = """
SELECT l_returnflag, CAST(0.5 AS DOUBLE) AS q,
       ROUND(quantile_cont(l_quantity, 0.5), 6) AS quantile_value
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT l_returnflag, CAST(0.95 AS DOUBLE),
       ROUND(quantile_cont(l_quantity, 0.95), 6)
FROM lineitem GROUP BY l_returnflag
"""


def q_incremental_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: a pre-aggregated snapshot of
    the old partitions MERGED with the new partition's partial
    aggregate — equal to recomputing over everything (the oracle runs
    the full recompute). This is the pattern that keeps 100 TB
    dashboards cheap: counts and integer-cent sums are mergeable
    state, so each refresh scans only the new partition. (The
    sketch-valued twin is ``hll_rollup`` — HLL sketches merge the same
    way for distinct counts.) The cents stay integers until AFTER the
    merge: dividing per-partial would sum inexact doubles."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    cutoff = F.lit("1999-01-01").cast("timestamp")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")

    def partial(df):
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("cents"),
        )

    snapshot = partial(o.filter(F.col("o_orderdate") < cutoff))
    delta = partial(o.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        snapshot.unionByName(delta)
        .groupBy("o_orderstatus")
        .agg(F.sum("n").alias("n_orders"), F.sum("cents").alias("cents"))
    )
    return merged.select(
        "o_orderstatus",
        F.col("n_orders").cast("long").alias("n_orders"),
        (F.col("cents") / 100.0).alias("total_price"),
    )


ORACLE_INCREMENTAL_VOLUME = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS total_price
FROM orders GROUP BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# Multimodal frame-sampling gate
# ---------------------------------------------------------------------------


def q_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-media frame-sampling accounting over the documents-as-media
    adapter — upgrades the video frame-sample plumbing from pytest-only
    to oracle-gated: the deterministic stand-in decoder slices the
    payload every 64 bytes (≤ 8 frames), so the DuckDB twin recomputes
    the exact fan-out and byte totals from ``octet_length`` alone. The
    mapInPandas stage, Arrow batch shape, and fan-out ratio being
    checked are the REAL plumbing a codec decoder drops into."""
    from data_quality_checks_in_relational_database_spark.operators import multimodal as mm

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    frames = mm.sample_frames(mm.documents_as_media(docs), every_n_bytes=64, max_frames=8)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("n_bytes").cast("long").alias("total_frame_bytes"),
    )


ORACLE_FRAME_STATS = """
WITH m AS (
    SELECT doc_id AS media_id, octet_length(encode(text)) AS len FROM documents
    WHERE text IS NOT NULL
)
SELECT media_id,
       CAST(CASE WHEN len < 64 THEN 1
                 WHEN len >= 512 THEN 8
                 ELSE len // 64 END AS BIGINT) AS n_frames,
       CAST(CASE WHEN len < 64 THEN len
                 WHEN len >= 512 THEN 512
                 ELSE (len // 64) * 64 END AS BIGINT) AS total_frame_bytes
FROM m
"""


def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """alpha=0.3 temperature mixture over per-source token shares (the
    low-resource upsampling rule; companion to the declared-target
    ``mixture_weights``)."""
    from data_quality_checks_in_relational_database_spark.operators import text as tx
    from data_quality_checks_in_relational_database_spark.operators.sampling import (
        temperature_mixture,
    )

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return temperature_mixture(docs, "source", tx.bpe_token_count(F.col("text")), alpha=0.3)


ORACLE_TEMPERATURE_MIXTURE = """
WITH per AS (
    SELECT source AS grp,
           CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT)
             AS total_weight
    FROM documents GROUP BY source
),
nat AS (
    SELECT grp, total_weight,
           ROUND(total_weight / CAST(SUM(total_weight) OVER () AS DOUBLE), 6) AS natural_frac
    FROM per
)
SELECT grp AS source, total_weight, natural_frac,
       ROUND(POW(natural_frac, 0.3) / SUM(POW(natural_frac, 0.3)) OVER (), 6) AS sampled_frac,
       ROUND((POW(natural_frac, 0.3) / SUM(POW(natural_frac, 0.3)) OVER ()) / natural_frac, 6)
         AS boost
FROM nat
"""


def q_semantic_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end semantic dedup corpus accounting — the embedding twin
    of ``corpus_clean``: cosine pairs → components → drop everything
    but each cluster's representative → per-label kept/dropped report.
    Every stage is an already-oracle-gated operator; this query gates
    their COMPOSITION (pairs→clusters→removal→anti-join)."""
    from data_quality_checks_in_relational_database_spark.operators.cluster import (
        dedup_clusters,
        removal_list,
    )
    from data_quality_checks_in_relational_database_spark.operators.similarity import (
        cosine_allpairs_blockjoin,
    )

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    pairs = cosine_allpairs_blockjoin(emb, threshold=0.4)
    clusters = dedup_clusters(pairs, "vec_id_a", "vec_id_b")
    removal = removal_list(clusters).select(F.col("doc_id").alias("vec_id"))
    kept = emb.join(removal, "vec_id", "left_anti")
    per_total = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    per_kept = kept.groupBy("label").agg(F.count(F.lit(1)).alias("n_kept"))
    return (
        per_total.join(per_kept, "label", "left")
        .select(
            "label",
            "n_vecs",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_vecs") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
        )
    )


def _semantic_keep_oracle(threshold: float) -> str:
    return f"""
WITH RECURSIVE unit AS (
    SELECT vec_id,
           CAST(embedding AS DOUBLE[]) AS v,
           SQRT(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings
),
pairs AS (
    SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
    FROM unit a JOIN unit b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= {threshold}
),
edges AS (
    SELECT vec_id_a AS src, vec_id_b AS dst FROM pairs
    UNION ALL
    SELECT vec_id_b, vec_id_a FROM pairs
),
reach(node, label) AS (
    SELECT DISTINCT src, src FROM edges
    UNION
    SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
),
comp AS (SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY node),
removal AS (SELECT node FROM comp WHERE node != cluster_id)
SELECT e.label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(CASE WHEN r.node IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN r.node IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM embeddings e LEFT JOIN removal r ON e.vec_id = r.node
GROUP BY e.label
"""


ORACLE_SEMANTIC_KEEP = _semantic_keep_oracle(0.4)


def q_semantic_keep_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-candidate twin of ``semantic_keep``: the same pairs →
    components → removal → kept-corpus composition, with the pair
    stage swapped for banded SRP candidates + exact verify (recall
    pinned 1.0 at the twin threshold)."""
    from data_quality_checks_in_relational_database_spark.operators.cluster import (
        dedup_clusters,
        removal_list,
    )

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    clusters = dedup_clusters(_lsh_pairs(emb), "vec_id_a", "vec_id_b")
    removal = removal_list(clusters).select(F.col("doc_id").alias("vec_id"))
    kept = emb.join(removal, "vec_id", "left_anti")
    per_total = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    per_kept = kept.groupBy("label").agg(F.count(F.lit(1)).alias("n_kept"))
    return per_total.join(per_kept, "label", "left").select(
        "label",
        "n_vecs",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        (F.col("n_vecs") - F.coalesce("n_kept", F.lit(0)))
        .cast("long")
        .alias("n_dropped"),
    )


ORACLE_SEMANTIC_KEEP_LSH = _semantic_keep_oracle(_LSH_THR)


def q_props_map_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over the JSON props column as a MAP: parse once
    to map<string,string>, explode entries, per-key value profile —
    the generic path when keys are NOT known ahead (variant_stats /
    events_json_stats are the typed-path twins for known keys)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    kv = ev.select(
        F.explode(F.from_json("props", "map<string,string>")).alias("key", "val")
    )
    return kv.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("val").alias("n_distinct_vals"),
        F.min(F.col("val").cast("long")).alias("min_val"),
        F.max(F.col("val").cast("long")).alias("max_val"),
    )


ORACLE_PROPS_MAP_STATS = """
WITH kv AS (
    SELECT k.key, json_extract_string(props, '$.' || k.key) AS val
    FROM events, UNNEST(json_keys(props)) AS k(key)
    WHERE props IS NOT NULL
)
SELECT key,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT val) AS BIGINT) AS n_distinct_vals,
       MIN(TRY_CAST(val AS BIGINT)) AS min_val,
       MAX(TRY_CAST(val AS BIGINT)) AS max_val
FROM kv GROUP BY key
"""


# ---------------------------------------------------------------------------
# Candidate-key discovery + robust (MAD) outliers
# ---------------------------------------------------------------------------


def q_candidate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniqueness profile over declared column combinations — which
    combos are candidate keys (n_distinct == n_rows)? One two-phase
    distinct per combo (skew-safe), bounded one-row output each."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    combos = [
        ("o_orderkey", ["o_orderkey"]),
        ("o_custkey", ["o_custkey"]),
        ("o_custkey+o_orderdate", ["o_custkey", "o_orderdate"]),
    ]
    n_rows = o.count()  # bounded scalar reused across combos
    parts = []
    for name, cols in combos:
        nd = o.select(*cols).distinct().agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct")
        )
        parts.append(
            nd.select(
                F.lit(name).alias("combo"),
                F.lit(n_rows).cast("long").alias("n_rows"),
                "n_distinct",
                (F.col("n_distinct") == n_rows).alias("is_key"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


ORACLE_CANDIDATE_KEYS = """
SELECT 'o_orderkey' AS combo, (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_rows,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
       COUNT(DISTINCT o_orderkey) = (SELECT COUNT(*) FROM orders) AS is_key
FROM orders
UNION ALL
SELECT 'o_custkey', (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
       COUNT(DISTINCT o_custkey) = (SELECT COUNT(*) FROM orders)
FROM orders
UNION ALL
SELECT 'o_custkey+o_orderdate', (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
       CAST(COUNT(DISTINCT (o_custkey, o_orderdate)) AS BIGINT),
       COUNT(DISTINCT (o_custkey, o_orderdate)) = (SELECT COUNT(*) FROM orders)
FROM orders
"""


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier counts via median absolute deviation — the
    estimator that survives the contamination that wrecks mean/stddev
    z-scores (Tukey fences are the quartile cousin, `iqr_outliers`).
    Two exact-percentile passes (median, then MAD), thresholds
    broadcast; flagged = |x - median| > 3.5 * 1.4826 * MAD (the
    standard consistency-scaled cutoff)."""
    from pyspark.storagelevel import StorageLevel

    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    # pin the 1-row threshold frames: med feeds both dev consumers and
    # mad feeds both the flag pass and the final report — unpinned,
    # each crossJoin re-runs the upstream percentile scan
    med = o.agg(F.percentile("o_totalprice", F.lit(0.5)).alias("med")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    dev = o.crossJoin(F.broadcast(med)).select(
        "o_totalprice", "med", F.abs(F.col("o_totalprice") - F.col("med")).alias("adev")
    )
    mad = dev.agg(
        F.first("med").alias("med"), F.percentile("adev", F.lit(0.5)).alias("mad")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    flagged = dev.crossJoin(
        F.broadcast(mad.select(F.col("mad").alias("m2")))
    ).select(
        (F.col("adev") > 3.5 * 1.4826 * F.col("m2")).cast("int").alias("is_out")
    )
    return (
        flagged.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("is_out").cast("long").alias("n_outliers"),
        )
        .crossJoin(F.broadcast(mad))
        .select(
            "n_rows",
            "n_outliers",
            F.round("med", 6).alias("median"),
            F.round("mad", 6).alias("mad"),
        )
    )


ORACLE_MAD_OUTLIERS = """
WITH med AS (SELECT quantile_cont(o_totalprice, 0.5) AS med FROM orders),
dev AS (
    SELECT o_totalprice, med, ABS(o_totalprice - med) AS adev
    FROM orders, med
),
mad AS (SELECT ANY_VALUE(med) AS med, quantile_cont(adev, 0.5) AS mad FROM dev)
SELECT CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_rows,
       CAST((SELECT COUNT(*) FROM dev, mad WHERE adev > 3.5 * 1.4826 * mad) AS BIGINT) AS n_outliers,
       ROUND(med, 6) AS median, ROUND(mad, 6) AS mad
FROM mad
"""


def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle — users grouped by first-seen
    week, counted distinct in each subsequent week (the third classic
    event-analytics shape next to funnel and sessionization). Two
    keyed aggregations plus a broadcast-sized cohort join; both
    engines truncate weeks to Monday."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    weeks = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    cohort = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    j = weeks.join(cohort, "user_id")
    return (
        j.groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


ORACLE_RETENTION = """
WITH weeks AS (
    SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events
),
cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY user_id)
SELECT c.cohort_week,
       CAST((w.week - c.cohort_week) // 7 AS BIGINT) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM weeks w JOIN cohort c USING (user_id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# EXISTS semi-join surface (TPC-H Q4 shape as a late-shipment DQ audit)
# ---------------------------------------------------------------------------

SQL_LATE_SHIPMENTS = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
"""


def q_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped EXISTS audit: orders in a quarter with at least
    one lineitem shipped > 90 days after ordering, counted by priority.
    Catalyst decorrelates the EXISTS into a LEFT SEMI join — each
    qualifying order counts ONCE no matter how many late lines — with
    the date filter pushed to the orders scan; the semi-join shuffles
    on orderkey (or broadcasts the filtered orders side under AQE).
    Shared SQL text: the oracle runs the identical statement."""
    from data_quality_checks_in_relational_database_spark.session import register_views

    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(SQL_LATE_SHIPMENTS)


ORACLE_LATE_SHIPMENTS = SQL_LATE_SHIPMENTS


# ---------------------------------------------------------------------------
# Row-content checksum reconciliation (strong form of reference J1)
# ---------------------------------------------------------------------------


def q_content_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag row-content fingerprints of lineitem: commutative
    mod-2^60 sum of engine-portable md5-derived row hashes. Comparing
    two runs of this (source vs destination) catches cell corruption
    that the reference's count-only reconciliation misses."""
    from data_quality_checks_in_relational_database_spark.operators.diff import content_checksum

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    canon = li.select(
        "l_returnflag",
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.col("l_quantity").cast("long").alias("qty"),
        F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss").alias("ship_s"),
    )
    return content_checksum(
        canon,
        cols=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "qty", "ship_s"],
        group_col="l_returnflag",
    )


ORACLE_CONTENT_CHECKSUMS = """
WITH canon AS (
    SELECT l_returnflag,
           concat_ws(chr(31),
               COALESCE(CAST(l_orderkey AS VARCHAR), chr(30) || 'NULL'),
               COALESCE(CAST(l_partkey AS VARCHAR), chr(30) || 'NULL'),
               COALESCE(CAST(l_suppkey AS VARCHAR), chr(30) || 'NULL'),
               COALESCE(CAST(CAST(l_linenumber AS BIGINT) AS VARCHAR), chr(30) || 'NULL'),
               COALESCE(CAST(CAST(l_quantity AS BIGINT) AS VARCHAR), chr(30) || 'NULL'),
               COALESCE(strftime(l_shipdate, '%Y-%m-%d %H:%M:%S'), chr(30) || 'NULL')
           ) AS row_str
    FROM lineitem
)
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST('0x' || substr(md5(row_str), 1, 15) AS BIGINT))
            % 1152921504606846976 AS BIGINT) AS content_checksum
FROM canon
GROUP BY l_returnflag
"""


def q_w1_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earth-mover (1-Wasserstein) distance between pre-1998 and 1998+
    order-total distributions, in dollars — the magnitude companion to
    q_ks_drift's detection statistic."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    cut = F.lit("1998-01-01")
    from data_quality_checks_in_relational_database_spark.operators.diff import (
        wasserstein_two_sample_split,
    )

    # one-scan split form (r9): the pre/post-cut cohorts partition the
    # orders table, so both per-value counts come from one scan + one
    # aggregation instead of two scans + a full-outer reconcile join
    return wasserstein_two_sample_split(
        orders,
        F.col("o_orderdate") < cut,
        "o_totalprice",
        decimals=0,
    )


ORACLE_W1_DRIFT = """
WITH ca AS (
    SELECT round(o_totalprice, 0) AS v, COUNT(*) AS ca FROM orders
    WHERE o_orderdate < TIMESTAMP '1998-01-01' AND o_totalprice IS NOT NULL
    GROUP BY 1
),
cb AS (
    SELECT round(o_totalprice, 0) AS v, COUNT(*) AS cb FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_totalprice IS NOT NULL
    GROUP BY 1
),
j AS (
    SELECT COALESCE(ca.v, cb.v) AS v, COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
    FROM ca FULL OUTER JOIN cb ON ca.v = cb.v
),
cum AS (
    SELECT v,
           SUM(ca) OVER (ORDER BY v) AS cum_a,
           SUM(cb) OVER (ORDER BY v) AS cum_b,
           SUM(ca) OVER () AS n_a,
           SUM(cb) OVER () AS n_b,
           CAST(LEAD(v) OVER (ORDER BY v) - v AS BIGINT) AS gap
    FROM j
)
SELECT CAST(MAX(n_a) AS BIGINT) AS n_a,
       CAST(MAX(n_b) AS BIGINT) AS n_b,
       CAST(SUM(abs(cum_a * n_b - cum_b * n_a) * gap) AS BIGINT) AS w1_numer,
       ROUND(SUM(abs(cum_a * n_b - cum_b * n_a) * gap) / (MAX(n_a) * MAX(n_b)), 6) AS w1
FROM cum WHERE gap IS NOT NULL
"""


def q_ewma_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart over daily event volume per event type —
    the small-persistent-drift detector (z-score charts need one big
    outlier; EWMA catches a run of small ones)."""
    from data_quality_checks_in_relational_database_spark.operators.anomaly import (
        ewma_control_chart,
    )

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").cast("double").alias("n"))
    return ewma_control_chart(daily, ["event_type"], "day", "n", lam=0.2, l_sigma=3.0)


def _oracle_ewma(lam: float = 0.2, l_sigma: float = 3.0) -> str:
    one_m = 1.0 - lam                    # 0.8
    decay2 = (1.0 - lam) ** 2            # 0.6400000000000001 — must match Spark's literal
    var_f = lam / (2.0 - lam)            # λ/(2-λ)
    return f"""
WITH RECURSIVE daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS DOUBLE) AS n
    FROM events GROUP BY 1, 2
),
idx AS (
    SELECT event_type, day, n,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i
    FROM daily
),
stats AS (
    SELECT event_type, AVG(n) AS mu, STDDEV_SAMP(n) AS sigma FROM daily GROUP BY 1
),
walk AS (
    SELECT i.event_type, i.i, i.day, i.n, {lam!r} * i.n + {one_m!r} * s.mu AS z
    FROM idx i JOIN stats s USING (event_type) WHERE i.i = 1
    UNION ALL
    SELECT i.event_type, i.i, i.day, i.n, {lam!r} * i.n + {one_m!r} * w.z
    FROM idx i JOIN walk w ON i.event_type = w.event_type AND i.i = w.i + 1
)
SELECT w.event_type, w.day, w.n,
       ROUND(w.z, 6) AS ewma,
       ROUND({l_sigma!r} * s.sigma
             * sqrt({var_f!r} * (1.0 - pow({decay2!r}, CAST(w.i AS DOUBLE)))), 6) AS "limit",
       abs(w.z - s.mu) > {l_sigma!r} * s.sigma
             * sqrt({var_f!r} * (1.0 - pow({decay2!r}, CAST(w.i AS DOUBLE)))) AS breach
FROM walk w JOIN stats s USING (event_type)
"""


ORACLE_EWMA_VOLUME = _oracle_ewma()


# ---------------------------------------------------------------------------
# Ranking-window surface: percent_rank / cume_dist / ntile
# ---------------------------------------------------------------------------

SQL_VALUE_RANKS = """
SELECT o_orderstatus,
       o_orderkey,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume,
       CAST(NTILE(10) OVER w AS BIGINT) AS decile
FROM orders
WHERE o_totalprice IS NOT NULL AND o_orderkey % 20 = 0
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
"""


def q_value_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-position windows per order: percent_rank, cume_dist
    and decile of order value within its status. One keyed window pass
    (single shuffle on the partition key; the orderkey tiebreak makes
    ntile deterministic). Shared SQL text with the oracle; the
    ``% 20`` sample bounds the output, not the window input."""
    from data_quality_checks_in_relational_database_spark.session import register_views

    register_views(spark, sf_dir, ("orders",))
    return spark.sql(SQL_VALUE_RANKS)


ORACLE_VALUE_RANKS = SQL_VALUE_RANKS


# ---------------------------------------------------------------------------
# Gini revenue concentration per nation
# ---------------------------------------------------------------------------


def q_gini_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Gini coefficient of order values — the inequality
    audit behind sampling/mixture decisions (a nation whose revenue is
    one whale behaves differently from one with uniform spend).

    Exactness contract: G = Σ(2i−n−1)·x_i / (n·Σx) over x ascending,
    with x in EXACT integer cents and the rank i from a per-nation
    window ordered by (cents, orderkey) — ties contribute the same sum
    under any tie order, the numerator/denominator are DECIMAL(38,0)
    integers, and the single final division is bit-identical in both
    engines. One join + one keyed window + one keyed aggregate."""
    t = load_tables(spark, sf_dir, ("orders", "customer", "nation"))
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("decimal(38,0)")
    orders = (
        t["orders"]
        .join(t["customer"], t["orders"]["o_custkey"] == t["customer"]["c_custkey"])
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nation"), F.col("o_orderkey"), cents.alias("cents"))
    )
    w = Window.partitionBy("nation").orderBy(F.col("cents").asc(), F.col("o_orderkey").asc())
    ranked = orders.withColumn("i", F.row_number().over(w).cast("decimal(38,0)"))
    per_nation = ranked.groupBy("nation").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("cents").alias("total_cents"),
        F.sum((F.lit(2).cast("decimal(38,0)") * F.col("i")) * F.col("cents")).alias("wsum"),
    )
    # num = Σ(2i−n−1)x = Σ2i·x − (n+1)Σx ;  G = num / (n·Σx)
    num = F.col("wsum") - (F.col("n") + 1) * F.col("total_cents")
    return per_nation.select(
        "nation",
        F.col("n").cast("long").alias("n_orders"),
        F.col("total_cents").cast("long").alias("total_cents"),
        (num.cast("double") / (F.col("n") * F.col("total_cents")).cast("double")).alias("gini"),
    )


ORACLE_GINI_ORDERS = """
WITH ranked AS (
    SELECT n.n_name AS nation,
           CAST(ROUND(o.o_totalprice * 100, 0) AS HUGEINT) AS cents,
           ROW_NUMBER() OVER (PARTITION BY n.n_name
                              ORDER BY CAST(ROUND(o.o_totalprice * 100, 0) AS HUGEINT) ASC,
                                       o.o_orderkey ASC) AS i
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
),
per_nation AS (
    SELECT nation, COUNT(*) AS n, SUM(cents) AS total_cents,
           SUM(2 * CAST(i AS HUGEINT) * cents) AS wsum
    FROM ranked GROUP BY nation
)
SELECT nation,
       CAST(n AS BIGINT) AS n_orders,
       CAST(total_cents AS BIGINT) AS total_cents,
       CAST(wsum - (n + 1) * total_cents AS DOUBLE)
         / CAST(n * total_cents AS DOUBLE) AS gini
FROM per_nation
"""


# ---------------------------------------------------------------------------
# Exact global order statistics via distribution counting
# ---------------------------------------------------------------------------

_GQ_PCTS = (50, 90, 99)


def q_exact_global_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global p50/p90/p99 of lineitem extended price as ORDER
    STATISTICS (lower/type-1: the k-th smallest value, k = ceil(p·n)),
    computed by distribution counting — the way you take an exact
    global quantile at 100 TB without ever sorting the data globally:

    1. one keyed aggregation to per-VALUE counts (cardinality-bounded,
       integer cents);
    2. TWO-PHASE range-bucketed running totals
       (:func:`operators.cumulative.bucketed_cumulative` — per-bucket
       partitioned windows plus a bounded bucket-offset broadcast; the
       global ordered window never materializes, r4 verdict fix);
    3. pick the first value whose cumulative count reaches each k.

    Contrast: ``approx_quantiles`` (sketch, tolerance-gated) and
    ``group_percentiles`` (interpolated, per-group). Values are exact
    integer cents — no FP anywhere."""
    from data_quality_checks_in_relational_database_spark.operators.cumulative import (
        bucketed_cumulative,
    )

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    counts = li.select(cents.alias("v")).groupBy("v").agg(
        F.count(F.lit(1)).alias("c")
    )
    cum = bucketed_cumulative(counts, "v", ["c"]).select(
        "v", F.col("cum_c").alias("cum"), F.col("n_c").alias("n")
    )
    picks = [
        F.min(
            F.when(
                F.col("cum") >= F.ceil(F.col("n") * F.lit(p) / 100.0), F.col("v")
            )
        ).alias(f"p{p}_cents")
        for p in _GQ_PCTS
    ]
    return cum.agg(F.max("n").cast("long").alias("n_rows"), *picks)


ORACLE_EXACT_GLOBAL_QUANTILES = """
WITH vals AS (
    SELECT CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS v FROM lineitem
),
counts AS (SELECT v, COUNT(*) AS c FROM vals GROUP BY v),
cum AS (
    SELECT v, SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM counts
),
n AS (SELECT COUNT(*) AS n FROM vals)
SELECT CAST(n.n AS BIGINT) AS n_rows,
       MIN(CASE WHEN cum >= CEIL(n.n * 50 / 100.0) THEN v END) AS p50_cents,
       MIN(CASE WHEN cum >= CEIL(n.n * 90 / 100.0) THEN v END) AS p90_cents,
       MIN(CASE WHEN cum >= CEIL(n.n * 99 / 100.0) THEN v END) AS p99_cents
FROM cum, n GROUP BY n.n
"""


# ---------------------------------------------------------------------------
# Lagged cross-correlation + seasonal-naive forecast audit (r5)
# ---------------------------------------------------------------------------


_XCORR_MAX_LAG = 7


def q_lag_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between the DAILY VIEW-COUNT series and
    the DAILY PURCHASE-COUNT series at lags -7..+7 — the "is browsing
    activity a leading indicator of buying" diagnostic (orders and
    events live in disjoint calendar ranges in this corpus, so both
    series come from the events table). Per lag: Pearson r over the
    days where both series (purchase day shifted by the lag) exist,
    from EXACT integer sufficient statistics in DECIMAL(38,0); the
    numerator and both variance terms are emitted as exact integers
    cast to double, r as ONE guarded division (NULL when either
    variance is zero — identical semantics on both engines).

    Scale: two daily aggregations (map-side combined), a 15-way
    date-shifted equi-join of two calendar-bounded series, one bounded
    aggregate per lag."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    days = ev.select(
        F.to_date(F.col("ts").cast("timestamp")).alias("d"), "event_type"
    )
    rev = days.where(F.col("event_type") == "view").groupBy("d").agg(
        F.count(F.lit(1)).alias("x")
    )
    act = days.where(F.col("event_type") == "purchase").groupBy("d").agg(
        F.count(F.lit(1)).alias("y")
    )
    lags = spark.range(-_XCORR_MAX_LAG, _XCORR_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    # pair day d's revenue with day d+lag's activity
    j = (
        rev.crossJoin(F.broadcast(lags))
        .join(act.select(F.col("d").alias("d2"), "y"),
              F.date_add(F.col("d"), F.col("lag")) == F.col("d2"))
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    g = j.groupBy("lag").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
        F.sum(dec("y") * dec("y")).alias("syy"),
    )
    num = g["n"] * g["sxy"] - g["sx"] * g["sy"]
    dx = g["n"] * g["sxx"] - g["sx"] * g["sx"]
    dy = g["n"] * g["syy"] - g["sy"] * g["sy"]
    return g.select(
        "lag",
        F.col("n").cast("long").alias("n_days"),
        num.cast("double").alias("r_num"),
        dx.cast("double").alias("r_den_x"),
        dy.cast("double").alias("r_den_y"),
        F.when(
            (dx > 0) & (dy > 0),
            num.cast("double")
            / F.sqrt(dx.cast("double") * dy.cast("double")),
        ).alias("pearson_r"),
    )


ORACLE_LAG_XCORR = f"""
WITH rev AS (
    SELECT CAST(ts AS DATE) AS d, COUNT(*) AS x FROM events
    WHERE event_type = 'view' GROUP BY 1
),
act AS (
    SELECT CAST(ts AS DATE) AS d, COUNT(*) AS y FROM events
    WHERE event_type = 'purchase' GROUP BY 1
),
lags AS (SELECT UNNEST(range(-{_XCORR_MAX_LAG}, {_XCORR_MAX_LAG} + 1)) AS lag),
j AS (
    SELECT l.lag, r.x, a.y
    FROM rev r CROSS JOIN lags l
    JOIN act a ON a.d = r.d + CAST(l.lag AS INTEGER)
),
g AS (
    SELECT lag, CAST(COUNT(*) AS HUGEINT) AS n,
           CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
           CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
           SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
           SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
           SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
    FROM j GROUP BY lag
)
SELECT CAST(lag AS INTEGER) AS lag,
       CAST(n AS BIGINT) AS n_days,
       CAST(n * sxy - sx * sy AS DOUBLE) AS r_num,
       CAST(n * sxx - sx * sx AS DOUBLE) AS r_den_x,
       CAST(n * syy - sy * sy AS DOUBLE) AS r_den_y,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE))
       END AS pearson_r
FROM g
"""


_MASE_SEASON = 7


def q_mase_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast-quality audit of daily revenue (MASE,
    Hyndman & Koehler 2006): forecast(d) = revenue(d-7); the mean
    absolute error is compared to the in-sample seasonal-naive MAE —
    emitted as exact integer-cent numerators with day counts, the ratio
    as one division. MASE > 1 means "worse than repeating last week",
    the canonical sanity gate on any revenue forecast. One daily
    aggregation + one 7-day self-join; everything exact integers."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("c")
    )
    prev = daily.select(F.date_add(F.col("d"), _MASE_SEASON).alias("d"),
                        F.col("c").alias("c_prev"))
    j = daily.join(prev, "d")
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.abs(F.col("c") - F.col("c_prev"))).cast("long").alias("abs_err_cents"),
        (
            F.sum(F.abs(F.col("c") - F.col("c_prev")))
            / F.count(F.lit(1))
            / 100.0
        ).alias("seasonal_mae_dollars"),
    )


ORACLE_MASE_FORECAST = f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS c
    FROM orders GROUP BY 1
),
j AS (
    SELECT a.c, b.c AS c_prev
    FROM daily a JOIN daily b ON a.d = b.d + {_MASE_SEASON}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(ABS(c - c_prev)) AS BIGINT) AS abs_err_cents,
       SUM(ABS(c - c_prev)) / COUNT(*) / 100.0 AS seasonal_mae_dollars
FROM j
"""


def q_gini_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Gini of EVENTS-PER-USER — the activity-
    concentration audit (a type whose volume is three bot accounts
    behaves very differently from organic traffic with the same
    count). Same exactness contract as ``q_gini_orders``:
    G = Σ(2i−n−1)·x_i / (n·Σx) over per-user counts ascending, rank
    from a per-type window ordered by (count, user_id), all integer
    arithmetic in DECIMAL(38,0), one final division."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("x")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("x").asc(), F.col("user_id").asc()
    )
    ranked = per_user.withColumn("i", F.row_number().over(w).cast("decimal(38,0)"))
    g = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("total_events"),
        F.sum((F.lit(2).cast("decimal(38,0)") * F.col("i")) * F.col("x")).alias("wsum"),
    )
    num = F.col("wsum") - (F.col("n") + 1) * F.col("total_events")
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n_users"),
        F.col("total_events").cast("long").alias("n_events"),
        (
            num.cast("double")
            / (F.col("n") * F.col("total_events")).cast("double")
        ).alias("gini"),
    )


ORACLE_GINI_USERS = """
WITH per_user AS (
    SELECT event_type, user_id, CAST(COUNT(*) AS HUGEINT) AS x
    FROM events GROUP BY event_type, user_id
),
ranked AS (
    SELECT event_type, x,
           CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY x ASC, user_id ASC) AS HUGEINT) AS i
    FROM per_user
),
g AS (
    SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
           SUM(x) AS total_events, SUM(2 * i * x) AS wsum
    FROM ranked GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_users,
       CAST(total_events AS BIGINT) AS n_events,
       CAST(wsum - (n + 1) * total_events AS DOUBLE)
         / CAST(n * total_events AS DOUBLE) AS gini
FROM g
"""


def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite seasonal decomposition of the daily order-volume
    series: trend = centered 7-observation rolling mean, seasonal =
    per-day-of-week mean of the DETRENDED series, residual = what's
    left — with |z| > 2 anomaly flags over the residuals. The step up
    from ``dow_anomalies`` (which z-scores raw counts against a same-
    weekday baseline and therefore pages on every slow trend shift):
    removing the trend FIRST means the flags fire on genuine local
    shocks only.

    Exact-arithmetic contract: the detrended value is carried as the
    integer numerator ``d7 = 7·n − Σ₇n`` (BIGINT), the residual's one
    double division is ``(c·d7 − Σ_dow d7) / (7c)``, immediately
    quantized to integer micro-units — so the global z-score moments
    are exact BIGINT sums (the ``dow_anomalies`` convention) and every
    emitted value is identical across engines and partitionings.

    Scale: the rolling window is over the DAILY rollup — bounded by the
    calendar horizon, not row count (the ``cusum_changepoint`` class in
    the plan gate's allowlist); the seasonal profile is a ≤7-row
    broadcast; the z moments are a 1-row broadcast.
    """
    od = load_tables(spark, sf_dir, ("orders",))["orders"]
    daily = od.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    t = daily.select(
        "day",
        "n_orders",
        F.sum("n_orders").over(w7).alias("sum7"),
        F.count(F.lit(1)).over(w7).alias("cnt7"),
        (F.dayofweek("day") - 1).cast("int").alias("dow"),
    )
    interior = t.where(F.col("cnt7") == 7).withColumn(
        "d7", 7 * F.col("n_orders") - F.col("sum7")
    )
    seas = interior.groupBy("dow").agg(
        F.count(F.lit(1)).alias("c"), F.sum("d7").alias("s_num")
    )
    j = interior.join(F.broadcast(seas), "dow")
    resid = (F.col("c") * F.col("d7") - F.col("s_num")).cast("double") / (
        F.lit(7.0) * F.col("c")
    )
    r = j.withColumn("r_u", F.round(resid * F.lit(1_000_000.0)).cast("long"))
    stats = r.agg(
        F.count(F.lit(1)).alias("nI"),
        F.sum("r_u").alias("s1"),
        F.sum(F.col("r_u") * F.col("r_u")).alias("s2"),
    )
    f = r.crossJoin(F.broadcast(stats)).withColumn(
        "v",
        F.when(
            F.col("nI") > 1,
            (
                F.col("s2")
                - F.col("s1").cast("double") * F.col("s1") / F.col("nI")
            )
            / (F.col("nI") - 1),
        ),
    )
    z = (F.col("r_u") - F.col("s1").cast("double") / F.col("nI")) / F.sqrt(
        F.col("v")
    )
    return f.select(
        "day",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.round(F.col("sum7") / F.lit(7.0), 6).alias("trend"),
        F.round(F.col("s_num") / (F.lit(7.0) * F.col("c")), 6).alias("seasonal"),
        F.col("r_u").alias("resid_micro"),
        F.round(F.when(F.col("v") > 0, z), 6).alias("z"),
        F.when(F.col("v") > 0, F.abs(z) > 2.0).alias("is_anomaly"),
    )


ORACLE_SEASONAL_DECOMPOSE = """
WITH daily AS (
    SELECT o_orderdate AS day, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY 1
),
t AS (
    SELECT day, n_orders,
           SUM(n_orders) OVER w AS sum7,
           COUNT(*) OVER w AS cnt7,
           CAST(date_part('dow', day) AS INT) AS dow
    FROM daily
    WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
i AS (SELECT *, 7 * n_orders - sum7 AS d7 FROM t WHERE cnt7 = 7),
seas AS (
    SELECT dow, CAST(COUNT(*) AS BIGINT) AS c, SUM(d7) AS s_num
    FROM i GROUP BY dow
),
r AS (
    SELECT i.day, i.n_orders, i.sum7, i.d7, seas.c, seas.s_num,
           CAST(ROUND(
               CAST(seas.c * i.d7 - seas.s_num AS DOUBLE) / (7.0 * seas.c)
               * 1000000.0
           ) AS BIGINT) AS r_u
    FROM i JOIN seas USING (dow)
),
st AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS nI, SUM(r_u) AS s1, SUM(r_u * r_u) AS s2
    FROM r
),
f AS (
    SELECT r.*, st.nI, st.s1, st.s2,
           CASE WHEN st.nI > 1 THEN
               (st.s2 - CAST(st.s1 AS DOUBLE) * st.s1 / st.nI) / (st.nI - 1)
           END AS v
    FROM r CROSS JOIN st
)
SELECT day, n_orders,
       ROUND(sum7 / 7.0, 6) AS trend,
       ROUND(s_num / (7.0 * c), 6) AS seasonal,
       r_u AS resid_micro,
       ROUND(
           CASE WHEN v > 0 THEN
               (r_u - CAST(s1 AS DOUBLE) / nI) / SQRT(v)
           END, 6
       ) AS z,
       CASE WHEN v > 0 THEN
           ABS((r_u - CAST(s1 AS DOUBLE) / nI) / SQRT(v)) > 2.0
       END AS is_anomaly
FROM f
"""


def q_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship merge of each user's event stream into one master
    row (the post-entity-resolution MDM step): recency rule ("latest
    NON-NULL wins" — a stale non-null beats a fresh null) for the
    measurement fields, frequency rule (modal value, ties → smallest)
    for the categorical one, plus first/last-seen and per-field null
    audits. Nulls are INJECTED deterministically (``event_id % 5`` /
    ``% 7`` — the ``encoding_audit`` identity-damage pattern, since the
    synthetic feed has no organic nulls), so the non-null-wins rule is
    exercised non-vacuously and the oracle replays the damage. Event
    times ride as ``unix_micros`` BIGINTs. See
    :func:`operators.dedup.golden_records`."""
    from data_quality_checks_in_relational_database_spark.operators.dedup import (
        golden_records,
    )

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    e = ev.select(
        F.col("user_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        F.col("event_id").alias("rid"),
        F.col("event_type"),
        F.when(F.col("event_id") % 5 != 0, F.col("value")).alias("v"),
        F.when(
            F.col("event_id") % 7 != 0,
            F.get_json_object("props", "$.k").cast("long"),
        ).alias("k"),
    )
    return golden_records(
        e,
        key_col="user_id",
        order_cols=("t", "rid"),
        fields=("v", "k"),
        modal_fields=("event_type",),
    )


ORACLE_GOLDEN_RECORD = """
WITH e AS (
    SELECT user_id AS u, epoch_us(ts) AS t, event_id AS rid, event_type,
           CASE WHEN event_id % 5 <> 0 THEN value END AS v,
           CASE WHEN event_id % 7 <> 0
                THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k
    FROM events
),
base AS (
    SELECT u, MIN(t) AS first_t, MAX(t) AS last_t,
           CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_v_nulls,
           CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_k_nulls
    FROM e GROUP BY u
),
lv AS (
    SELECT u, v AS last_v FROM (
        SELECT u, v, ROW_NUMBER() OVER (PARTITION BY u ORDER BY t DESC, rid DESC) AS rn
        FROM e WHERE v IS NOT NULL
    ) WHERE rn = 1
),
lk AS (
    SELECT u, k AS last_k FROM (
        SELECT u, k, ROW_NUMBER() OVER (PARTITION BY u ORDER BY t DESC, rid DESC) AS rn
        FROM e WHERE k IS NOT NULL
    ) WHERE rn = 1
),
mt AS (
    SELECT u, event_type AS modal_event_type FROM (
        SELECT u, event_type,
               ROW_NUMBER() OVER (PARTITION BY u
                   ORDER BY COUNT(*) DESC, event_type ASC) AS rn
        FROM e GROUP BY u, event_type
    ) WHERE rn = 1
)
SELECT b.u AS user_id, b.first_t, b.last_t, b.n_records,
       lv.last_v, b.n_v_nulls, lk.last_k, b.n_k_nulls, mt.modal_event_type
FROM base b
LEFT JOIN lv ON lv.u = b.u
LEFT JOIN lk ON lk.u = b.u
LEFT JOIN mt ON mt.u = b.u
"""


def q_ewma_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE per-type EWMA/EWMAD control chart over individual event
    values — the O(1)-state drift detector whose streaming twin
    (`streaming.stateful.ewma_progress`) runs the SAME sequential fold
    at ingest (stream ≡ batch pinned bit-identical in pytest). Distinct
    from ``ewma_volume``'s SPC form, which needs the closed series' μ/σ
    upfront; this one needs only three numbers of state per key. The
    oracle replays the recurrence as a recursive CTE stepping each
    key's chain one event per iteration, with the arithmetic written
    op-for-op like the Python fold (`0.2·x + (1−0.2)·prev`) so even
    the doubles agree exactly."""
    from data_quality_checks_in_relational_database_spark.streaming.stateful import (
        ewma_chart_batch,
    )

    ev = load_tables(spark, sf_dir, ("events",))["events"].select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
        F.col("value").cast("double").alias("value"),
    )
    return ewma_chart_batch(ev, "event_type", "ts", "event_id", "value")


ORACLE_EWMA_CHART = """
WITH RECURSIVE e AS (
    SELECT event_type AS k, epoch_us(ts) AS t, event_id AS rid,
           CAST(value AS DOUBLE) AS x,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY epoch_us(ts), event_id) AS i
    FROM events
),
chart(k, i, rid, t, x, ewma, ewmad, n, alarm) AS (
    -- e-notation literals are DOUBLEs in DuckDB (plain 0.2 parses as
    -- DECIMAL(2,1), which both overflows the recursive union's cast
    -- and would compute DECIMAL arithmetic instead of the Python
    -- fold's IEEE doubles)
    SELECT k, i, rid, t, x, x, 0.0e0, 1, FALSE FROM e WHERE i = 1
    UNION ALL
    SELECT e.k, e.i, e.rid, e.t, e.x,
           0.2e0 * e.x + (1.0e0 - 0.2e0) * c.ewma,
           0.2e0 * ABS(e.x - c.ewma) + (1.0e0 - 0.2e0) * c.ewmad,
           c.n + 1,
           c.n >= 10 AND c.ewmad > 0.0e0 AND ABS(e.x - c.ewma) > 4.0e0 * c.ewmad
    FROM chart c JOIN e ON e.k = c.k AND e.i = c.i + 1
)
SELECT k AS event_type, rid AS event_id, t AS ts_us, x AS value,
       ewma, ewmad, alarm
FROM chart
"""
