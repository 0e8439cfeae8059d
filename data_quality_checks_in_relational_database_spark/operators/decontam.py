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


def bloom_contamination_report(
    corpus: DataFrame,
    eval_set: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 17,
    k_hashes: int = 5,
) -> DataFrame:
    """Bloom-prefiltered contamination report — output IDENTICAL to
    :func:`contamination_report` (the exact verify stage removes the
    bloom's false positives, and a bloom has no false negatives), with
    the expensive corpus-side join gated behind a pure-expression
    membership test.

    Why at 100 TB: even a broadcast semi-join hashes every corpus gram
    into a join-probe table; the bloom turns that into k codegen'd
    bit-probes against a LITERAL bitset baked into the plan (m_bits/8
    bytes — ships with the task binary, no broadcast exchange at all),
    and only the ~fp-rate survivors reach the real join. With defaults
    (2^17 bits, k=5) a 10^4-gram eval set gives fp ≈ 3e-7.

    Mechanics: the eval grams' k bit-positions are computed IN SPARK
    (xxhash64 + Kirsch-Mitzenmacher double hashing, 32-bit masked so
    ANSI-mode arithmetic can't overflow) and collected — bounded by
    the eval set's size, same contract as ANN query sets — then the
    bitset returns to the plan as an array<long> literal. The corpus
    side evaluates the SAME hash expressions, so no false negatives by
    construction.
    """
    mask32 = F.lit(0xFFFFFFFF)

    def positions(gram: F.Column) -> list:
        h = F.xxhash64(gram)
        h1 = h.bitwiseAND(mask32)
        h2 = F.shiftright(h, 32).bitwiseAND(mask32).bitwiseOR(F.lit(1))
        return [F.pmod(h1 + i * h2, F.lit(m_bits)) for i in range(k_hashes)]

    eval_grams = (
        shingle_sets(eval_set, text_col, id_col, n)
        .select(F.explode("shingles").alias("gram"))
        .distinct()
    )
    pos_rows = (
        eval_grams.select(F.explode(F.array(*positions(F.col("gram")))).alias("p"))
        .distinct()
        .collect()  # bounded: <= |eval grams| * k positions
    )
    words = [0] * (m_bits // 64)
    for r in pos_rows:
        p = int(r["p"])
        words[p // 64] |= 1 << (p % 64)
    to_signed = lambda w: w - (1 << 64) if w >= (1 << 63) else w
    bitset = F.array(*[F.lit(to_signed(w)) for w in words])

    corpus_sh = shingle_sets(corpus, text_col, id_col, n)
    exploded = corpus_sh.select(
        F.col(id_col),
        F.size("shingles").alias("n_grams"),
        F.explode("shingles").alias("gram"),
    )
    hit = None
    for p in positions(F.col("gram")):
        word = F.element_at(bitset, (p / 64).cast("int") + 1)
        # getbit takes a runtime position Column (shiftright's numBits
        # parameter is literal-only in the Python API)
        cond = F.getbit(word, F.pmod(p, F.lit(64))) == 1
        hit = cond if hit is None else (hit & cond)
    candidates = exploded.filter(hit)
    return (
        candidates.join(F.broadcast(eval_grams), "gram")  # exact verify
        .groupBy(id_col, "n_grams")
        .agg(F.count(F.lit(1)).alias("n_overlap_grams"))
        .select(
            F.col(id_col),
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_overlap_grams").cast("long").alias("n_overlap_grams"),
        )
    )
