"""Quality-classifier queries: hashed linear inference over documents
and its precision/recall evaluation sweep. Extension family (the
reference has no text/model surface) — the quality-filter inference +
eval-harness shape of a training-data curation pipeline.

The oracle replays the fixed pseudo-model (md5-derived bucket weights,
see operators/text.hashed_linear_score) token-for-token in SQL, so the
gate covers tokenization, hashing, bucketing, the fold, and the
threshold sweep arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.operators.text import hashed_linear_score
from data_quality_checks_in_relational_database_spark.session import load_tables

_N_BUCKETS = 4096
#: Threshold sweep for the PR curve (scores are means of weights in
#: [-1, 1], concentrated near 0 for ~60-token docs).
_THRESHOLDS = (-0.04, -0.02, 0.0, 0.02, 0.04)

# engine-portable token weight: md5-derived bucket, fixed pseudo-model
_TOKS = (
    "CASE WHEN length(trim(text)) = 0 THEN [] "
    "ELSE string_split_regex(trim(lower(text)), '\\s+') END"
)
_W = (
    f"(CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) % {_N_BUCKETS}) % 2001"
    " - 1000"
)

_SCORED_CTE = f"""
scored AS (
    SELECT doc_id, lang,
           len(ws) AS n_tokens,
           CASE WHEN len(ws) > 0 THEN
               ROUND(list_sum(list_transform(ws, t -> CAST(({_W}) AS DOUBLE) / 1000.0))
                     / len(ws), 6) + 0.0
           END AS score
    FROM (SELECT doc_id, lang, {_TOKS} AS ws FROM documents)
)
"""


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document classifier inference: (doc_id, n_tokens, score,
    keep). Map-only over the corpus."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return hashed_linear_score(docs, n_buckets=_N_BUCKETS)


ORACLE_QUALITY_CLASSIFIER = f"""
WITH {_SCORED_CTE}
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, score,
       score >= 0 AS keep
FROM scored
"""


def q_classifier_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold sweep of the classifier against the weak label
    ``lang = 'en'``: per threshold, confusion counts + precision /
    recall. One scored pass crossJoined with the 5-row threshold frame
    (broadcast); docs with no tokens are excluded (no prediction)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    # keep_cols carries the weak label through the map-only scoring
    # pass — one corpus scan, no id re-join (r9)
    scored = hashed_linear_score(docs, n_buckets=_N_BUCKETS, keep_cols=["lang"])
    scored = scored.where(F.col("score").isNotNull()).select(
        "score", (F.col("lang") == "en").alias("actual")
    )
    th = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in _THRESHOLDS])).alias("threshold")
    )
    swept = scored.crossJoin(F.broadcast(th))
    pred = F.col("score") >= F.col("threshold")
    agg = swept.groupBy("threshold").agg(
        F.sum((pred & F.col("actual")).cast("long")).alias("tp"),
        F.sum((pred & ~F.col("actual")).cast("long")).alias("fp"),
        F.sum(((~pred) & F.col("actual")).cast("long")).alias("fn"),
        F.sum(((~pred) & ~F.col("actual")).cast("long")).alias("tn"),
    )
    return agg.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        (F.round(F.try_divide(F.col("tp"), F.col("tp") + F.col("fp")), 6) + F.lit(0.0)).alias(
            "precision"
        ),
        (F.round(F.try_divide(F.col("tp"), F.col("tp") + F.col("fn")), 6) + F.lit(0.0)).alias(
            "recall"
        ),
    )


_TH_VALUES = ", ".join(f"({t!r})" for t in _THRESHOLDS)

ORACLE_CLASSIFIER_PR_CURVE = f"""
WITH {_SCORED_CTE},
th(threshold) AS (VALUES {_TH_VALUES}),
swept AS (
    SELECT th.threshold,
           s.score >= th.threshold AS pred,
           s.lang = 'en' AS actual
    FROM scored s, th
    WHERE s.score IS NOT NULL
)
SELECT threshold,
       CAST(SUM(CASE WHEN pred AND actual THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       CAST(SUM(CASE WHEN pred AND NOT actual THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       CAST(SUM(CASE WHEN NOT pred AND actual THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       CAST(SUM(CASE WHEN NOT pred AND NOT actual THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       ROUND(CAST(SUM(CASE WHEN pred AND actual THEN 1 ELSE 0 END) AS DOUBLE)
             / NULLIF(SUM(CASE WHEN pred THEN 1 ELSE 0 END), 0), 6) + 0.0 AS precision,
       ROUND(CAST(SUM(CASE WHEN pred AND actual THEN 1 ELSE 0 END) AS DOUBLE)
             / NULLIF(SUM(CASE WHEN actual THEN 1 ELSE 0 END), 0), 6) + 0.0 AS recall
FROM swept
GROUP BY threshold
"""


def q_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins for the classifier against the weak
    ``lang = 'en'`` label: fixed-width score bins (width 0.02), per
    bin the doc count, mean score, empirical positive rate, and
    |gap| — the calibration audit run before trusting a quality
    filter's threshold. One scored map pass + one bounded aggregate
    (#bins ≤ 101 by score range); floor-binning is sign-consistent
    across engines."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    # one corpus scan: the label rides keep_cols, no id re-join (r9)
    scored = hashed_linear_score(docs, n_buckets=_N_BUCKETS, keep_cols=["lang"])
    scored = scored.where(F.col("score").isNotNull()).select(
        "score", (F.col("lang") == "en").cast("long").alias("actual")
    )
    bin_id = F.floor(F.col("score") / F.lit(0.02)).cast("long")
    agg = scored.groupBy(bin_id.alias("bin_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.avg("score").alias("mean_score_raw"),
        F.avg("actual").alias("pos_rate_raw"),
    )
    return agg.select(
        "bin_id",
        "n_docs",
        (F.round(F.col("mean_score_raw"), 6) + F.lit(0.0)).alias("mean_score"),
        (F.round(F.col("pos_rate_raw"), 6) + F.lit(0.0)).alias("pos_rate"),
        (
            F.round(F.abs(F.col("mean_score_raw") - F.col("pos_rate_raw")), 6)
            + F.lit(0.0)
        ).alias("calibration_gap"),
    )


ORACLE_CLASSIFIER_CALIBRATION = f"""
WITH {_SCORED_CTE},
binned AS (
    SELECT CAST(FLOOR(score / 0.02) AS BIGINT) AS bin_id,
           score,
           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS actual
    FROM scored WHERE score IS NOT NULL
)
SELECT bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(score), 6) + 0.0 AS mean_score,
       ROUND(AVG(CAST(actual AS DOUBLE)), 6) + 0.0 AS pos_rate,
       ROUND(ABS(AVG(score) - AVG(CAST(actual AS DOUBLE))), 6) + 0.0
         AS calibration_gap
FROM binned
GROUP BY bin_id
"""
