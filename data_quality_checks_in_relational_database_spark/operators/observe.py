"""Inline metric observation + mergeable distinct sketches.

Two Spark-native DQ mechanisms the batch-rescan style (reference:
post-write ``SELECT COUNT(*)``, pre_and_post_etl_checks.py:245-247)
cannot match at scale:

- :func:`observed_write` — ``Dataset.observe``: named aggregate
  metrics collected DURING the write action itself (one pass, zero
  extra scans — the Deequ/observation pattern). At 100 TB the
  difference between "write then re-scan to audit" and "audit inside
  the write" is an entire extra pass over the corpus.
- :func:`hll_distinct_by_group` / :func:`hll_merge_groups` —
  DataSketches HLL aggregates (``hll_sketch_agg`` / ``hll_union_agg``):
  per-slice distinct sketches that MERGE, so daily/per-source distinct
  counts roll up to corpus totals without re-touching raw data. An
  exact COUNT(DISTINCT) cannot be composed this way — it needs a
  global reshuffle of every value; the sketch turns incremental
  distinct-user/URL counting into a tiny second-stage aggregation of
  opaque binary states.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed_write(
    df: DataFrame,
    path: str,
    metrics: dict[str, Column],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> dict[str, object]:
    """Write ``df`` and return the named aggregate metrics computed by
    the SAME job that wrote the files (no second scan). ``metrics``
    maps name -> aggregate Column (count/sum/min/max/avg...)."""
    obs = Observation("write_audit")
    names = list(metrics)
    observed = df.observe(obs, *[metrics[n].alias(n) for n in names])
    observed.write.mode(mode).format(fmt).save(path)
    got = obs.get
    return {n: got[n] for n in names}


def hll_distinct_by_group(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group HLL sketch + estimate: (group, n_rows, distinct_est,
    sketch binary). Keep the sketch column for later merging; lg_k=12
    gives ~1.6% relative standard error in 4 KiB per group."""
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(value_col), F.lit(lg_k))
        ).alias("distinct_est"),
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch"),
    )


def hll_merge_groups(sketched: DataFrame) -> DataFrame:
    """Roll per-group sketches up to one corpus row WITHOUT touching
    raw data: (n_groups, distinct_est). The merge is a union of opaque
    HLL states — the incremental-audit primitive."""
    return sketched.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias("distinct_est"),
    )


def file_balance_report(spark, path: str, fmt: str = "parquet") -> DataFrame:
    """Small-files / skewed-files audit of a written dataset: one scan
    grouped by ``input_file_name()`` → (n_files, n_rows, min_rows,
    max_rows, avg_rows) plus the max/avg imbalance ratio.

    The #1 silent performance killer of long-lived lake tables is file
    sprawl (10⁶ tiny files → scheduler + open() overhead dominates) or
    file skew (one 10 GB file serializes a stage). This report is the
    monitor; the fixes are repartition-before-write / maxRecordsPerFile
    / compaction, all write-side.
    """
    # public namespace: covers classic AND Spark Connect exception
    # classes (the ...exceptions.captured path misses the connect
    # variant, which would bypass the empty-dataset fallback)
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.format(fmt).load(path)
    except AnalysisException as exc:
        if "UNABLE_TO_INFER_SCHEMA" not in str(exc):
            raise
        # an empty write leaves ZERO data files (partitioned parquet
        # sinks emit no part files for an empty frame), so there is no
        # schema to infer and nothing to audit — an empty report, not
        # an error: the monitor ran, the dataset has 0 files
        return spark.createDataFrame(
            [],
            schema="n_files long, n_rows long, min_rows long, "
            "max_rows long, avg_rows double, skew_ratio double",
        )
    per_file = df.groupBy(F.input_file_name().alias("file")).agg(
        F.count(F.lit(1)).alias("rows")
    )
    return per_file.agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("rows").cast("long").alias("n_rows"),
        F.min("rows").cast("long").alias("min_rows"),
        F.max("rows").cast("long").alias("max_rows"),
        F.round(F.avg("rows"), 2).alias("avg_rows"),
        F.round(F.max("rows") / F.avg("rows"), 4).alias("skew_ratio"),
    )
