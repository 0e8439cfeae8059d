"""Distributed BPE (byte-pair-encoding) merge training — tokenizer
fitting, the step before token budgeting in an LLM data pipeline (no
analogue in the reference — SURVEY §2.8 north-star extension).

The classic sequential algorithm (Sennrich et al. 2016) re-expressed
for Spark's execution model:

- the corpus collapses ONCE to a distinct-word frequency table (the
  standard trick: merge statistics depend only on word shapes × their
  frequencies, so the working set is the vocabulary, not the corpus —
  at 100 TB that's the difference between terabytes and gigabytes);
- each merge round is one map-side-combined aggregation over adjacent
  symbol pairs (weighted by word frequency) followed by a
  driver-collected argmax of exactly ONE row — the only driver
  traffic in the loop, bounded by ``n_merges``;
- the symbol-array rewrite after each merge is a JVM-side fold
  (``aggregate`` HOF with a carry accumulator) implementing the same
  greedy left-to-right non-overlapping merge as the reference
  algorithm — no Python in the loop body;
- lineage is truncated per round (``localCheckpoint``) so the plan
  does not deepen with the merge count; on a real cluster use a
  reliable checkpoint dir instead.

Iterative + stateful ⇒ genuinely non-SQL-expressible: the driver gate
records a rows-only check; the in-repo gate is a differential pytest
against a pure-Python BPE reference on the same corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.operators.text import tokens

__all__ = [
    "bpe_train_merges",
    "bpe_reference",
    "bpe_encode_counts",
    "bpe_encode_reference",
]


def _chars(col: Column) -> Column:
    """Split a word into single-character symbols (JVM-side)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(col)), lambda i: col.substr(i, F.lit(1))
    )


def _merge_fold(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping merge of the adjacent pair
    (left, right) into one symbol — a single ``aggregate`` fold with a
    one-symbol carry, identical to the sequential reference scan."""
    merged = left + right
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("carry"),
    )

    def step(acc: Column, s: Column) -> Column:
        return (
            F.when(acc["carry"].isNull(), F.struct(acc["out"].alias("out"), s.alias("carry")))
            .when(
                (acc["carry"] == F.lit(left)) & (s == F.lit(right)),
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                    F.lit(None).cast("string").alias("carry"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["carry"])).alias("out"),
                    s.alias("carry"),
                )
            )
        )

    def finish(acc: Column) -> Column:
        return F.when(acc["carry"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["carry"]))
        )

    return F.aggregate(syms, init, step, finish)


def bpe_train_merges(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 10,
    min_pair_count: int = 2,
) -> DataFrame:
    """Learn the top-``n_merges`` BPE merges over the corpus.

    Returns a SMALL DataFrame (rank, left, right, pair_count) — the
    merge table is driver-sized by definition (``n_merges`` rows).
    Ties in pair count break lexicographically (left, right) so the
    learned merges are deterministic under any partitioning.
    """
    spark = df.sparkSession
    word_freq = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    syms = word_freq.select(
        "freq", _chars(F.col("w")).alias("syms")
    ).localCheckpoint(eager=False)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pair_idx = F.sequence(F.lit(1), F.size("syms") - 1)
        pairs = (
            syms.filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.transform(
                        pair_idx,
                        lambda i: F.struct(
                            F.element_at(F.col("syms"), i).alias("l"),
                            F.element_at(F.col("syms"), i + 1).alias("r"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("c"))
        )
        best = pairs.orderBy(F.col("c").desc(), "l", "r").limit(1).collect()
        if not best or best[0]["c"] < min_pair_count:
            break
        left, right, count = best[0]["l"], best[0]["r"], int(best[0]["c"])
        merges.append((rank, left, right, count))
        syms = syms.select(
            "freq", _merge_fold(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint(eager=False)

    return spark.createDataFrame(
        merges, "rank long, left string, right string, pair_count long"
    )


def bpe_reference(word_freqs: dict[str, int], n_merges: int = 10, min_pair_count: int = 2):
    """Pure-Python sequential BPE (Sennrich-style) — the differential
    test oracle for :func:`bpe_train_merges`. Same tie-break: max
    count, then lexicographic (left, right)."""
    vocab = {tuple(w): c for w, c in word_freqs.items()}
    out = []
    for rank in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), count = best
        if count < min_pair_count:
            break
        out.append((rank, left, right, count))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            res: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            key = tuple(res)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return out


def bpe_encode_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token count per document under a learned BPE merge table — the
    budget a tokenizer with these merges would actually bill.

    The merge chain applies to DISTINCT words (same trick as training:
    word shapes × frequencies), then joins back to per-doc word counts —
    the corpus text is tokenized once and never re-scanned per merge.
    Each merge is one fold layer in a single JVM projection; the merge
    table is driver-sized by contract (``n_merges`` entries), so the
    nested expression stays small and codegen-friendly.

    Output: (doc_id, n_words, n_bpe_tokens).
    """
    word_tf = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count("*").alias("tf"))
    )
    distinct_words = word_tf.select("w").distinct()
    syms = _chars(F.col("w"))
    for left, right in merges:
        syms = _merge_fold(syms, left, right)
    encoded = distinct_words.select("w", F.size(syms).cast("long").alias("n_syms"))
    return (
        word_tf.join(encoded, "w")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_words"),
            F.sum(F.col("tf") * F.col("n_syms")).cast("long").alias("n_bpe_tokens"),
        )
    )


def bpe_encode_reference(texts: list[str], merges: list[tuple[str, str]]) -> dict[int, tuple[int, int]]:
    """Sequential replay of :func:`bpe_encode_counts` for the
    differential pytest: {doc_index: (n_words, n_bpe_tokens)}."""
    out: dict[int, tuple[int, int]] = {}
    for i, t in enumerate(texts):
        words = t.lower().split()
        if not words:
            continue
        total = 0
        for w in words:
            s: list[str] = list(w)
            for left, right in merges:
                res: list[str] = []
                j = 0
                while j < len(s):
                    if j + 1 < len(s) and s[j] == left and s[j + 1] == right:
                        res.append(left + right)
                        j += 2
                    else:
                        res.append(s[j])
                        j += 1
                s = res
            total += len(s)
        out[i] = (len(words), total)
    return out
