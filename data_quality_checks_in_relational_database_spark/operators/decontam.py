"""Benchmark decontamination: flag training documents that share long
n-grams with an evaluation/benchmark set.

The standard LLM-corpus hygiene pass (the GPT-3 appendix-C recipe:
13-gram overlap; PaLM/Llama variants differ only in n and the overlap
rule). No counterpart in the reference (numeric DQ only) — this is a
BASELINE.json training-data-pipeline extension.

Scale design: the eval set is exploded to DISTINCT n-grams and used as
the build side of an equi-join against the exploded corpus n-grams —
an inverted-index semi-join, never an all-pairs comparison. Eval sets
are tiny next to training corpora (MMLU+friends ≈ 10^6 grams vs 10^10
corpus docs), so Spark broadcasts the eval side and the corpus scan
stays shuffle-free for the match phase; the only shuffle is the final
per-doc count aggregation, carrying (doc_id, 1) pairs for matched
grams only. At 100 TB: corpus n-grams stream map-side against the
broadcast eval-gram set — no corpus-sized shuffle anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.operators.dedup import shingle_sets


def contamination_report(
    corpus: DataFrame,
    eval_set: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-corpus-document overlap with the eval set's n-grams.

    Output: ``(id_col, n_grams, n_overlap_grams)`` — one row per corpus
    document that has at least one n-gram in common with the eval set
    (documents with zero overlap are clean and not emitted; at corpus
    scale they are the overwhelming majority, and carrying them through
    the aggregation would shuffle the whole corpus for no information —
    the caller anti-joins this report to drop/flag contaminated docs).

    ``n_grams`` counts the document's DISTINCT n-grams, ``n_overlap_grams``
    how many of those appear anywhere in the eval set; the caller picks
    the drop rule (``n_overlap_grams >= 1`` is the GPT-3-style default;
    a fraction ``n_overlap_grams / n_grams`` threshold is the lenient
    variant).
    """
    corpus_sh = shingle_sets(corpus, text_col, id_col, n)
    eval_grams = (
        shingle_sets(eval_set, text_col, id_col, n)
        .select(F.explode("shingles").alias("gram"))
        .distinct()
    )
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    exploded = corpus_sh.select(
        F.col(id_col), F.size("shingles").alias("n_grams"), F.explode("shingles").alias("gram")
    )
    # shingles are already distinct per doc (shingle_sets), so a plain
    # count of joined rows IS the distinct-overlap count
    return (
        exploded.join(eval_grams, "gram")
        .groupBy(id_col, "n_grams")
        .agg(F.count(F.lit(1)).alias("n_overlap_grams"))
        .select(
            F.col(id_col),
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_overlap_grams").cast("long").alias("n_overlap_grams"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    n: int = 13,
    min_overlap_grams: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Return the corpus with contaminated documents REMOVED (left-anti
    join against the flagged report — broadcast-sized in practice since
    contamination is rare)."""
    flagged = contamination_report(corpus, eval_set, n, text_col, id_col).filter(
        F.col("n_overlap_grams") >= min_overlap_grams
    )
    return corpus.join(flagged.select(id_col), id_col, "left_anti")
