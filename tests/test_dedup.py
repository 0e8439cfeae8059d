"""Dedup-family tests: exact dedup on crafted duplicates; MinHash-LSH
and SimHash pinned against the exact n-gram-Jaccard baseline on the
driver's documents table (which contains planted near-duplicates with
Jaccard ≥ 0.88 vs ≤ 0.07 background — a wide margin)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.operators import dedup as dd
from data_quality_checks_in_relational_database_spark.session import load_tables
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return load_tables(spark, SF_SMOKE, ("documents",))["documents"].cache()


def test_dedup_exact_crafted(spark):
    rows = [
        (1, "the quick brown fox"),
        (2, "  THE   quick Brown fox "),  # same after normalization
        (3, "something else entirely here"),
        (4, "the quick brown fox"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    report = dd.dedup_exact_report(df).collect()
    groups = {r["representative_id"]: r["group_size"] for r in report}
    assert groups == {1: 3, 3: 1}
    kept = sorted(r["doc_id"] for r in dd.dedup_exact(df).collect())
    assert kept == [1, 3]


def test_minhash_equals_exact_on_planted_dups(spark, docs):
    exact = {
        (r["doc_id_a"], r["doc_id_b"]) for r in dd.ngram_jaccard_pairs(docs, 0.5).collect()
    }
    approx = {
        (r["doc_id_a"], r["doc_id_b"]) for r in dd.minhash_lsh_pairs(docs, 0.5).collect()
    }
    assert exact, "testdata should contain planted near-duplicates"
    # LSH misses a 0.89-sim pair with p≈1.4e-7; the exact-Jaccard verify
    # step makes precision exact, so the sets must be equal here
    assert approx == exact


def test_minhash_jaccard_values_match_exact(spark, docs):
    exact = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in dd.ngram_jaccard_pairs(docs, 0.5).collect()
    }
    for r in dd.minhash_lsh_pairs(docs, 0.5).collect():
        assert exact[(r["doc_id_a"], r["doc_id_b"])] == pytest.approx(r["jaccard"], abs=1e-12)


def test_df_capped_jaccard_equals_exact(spark, docs):
    """The stop-shingle-capped candidate index must reproduce the exact
    pair set (precision is exact by construction; this pins recall)."""
    exact = {tuple(r) for r in dd.ngram_jaccard_pairs(docs, 0.5).collect()}
    capped = {tuple(r) for r in dd.ngram_jaccard_pairs(docs, 0.5, max_doc_freq=20).collect()}
    assert capped == exact


def test_simhash_detects_planted_dups(spark, docs):
    """Measured on this corpus: planted near-dup pairs have simhash
    hamming 0-9 (median 2); background pairs start at 3 (p1=9). At
    max_hamming=5 the sketch recovers ~90% of planted pairs while
    examining a tiny fraction of all pairs — that's the contract."""
    exact = {
        (r["doc_id_a"], r["doc_id_b"]) for r in dd.ngram_jaccard_pairs(docs, 0.5).collect()
    }
    sh_pairs = {
        (r["doc_id_a"], r["doc_id_b"]) for r in dd.simhash_pairs(docs, max_hamming=5).collect()
    }
    assert exact, "testdata should contain planted near-duplicates"
    recall = len(exact & sh_pairs) / len(exact)
    assert recall >= 0.8, f"simhash recall {recall} on planted dups"
    n_docs = docs.count()
    all_pairs = n_docs * (n_docs - 1) / 2
    assert len(sh_pairs) <= 0.05 * all_pairs, f"{len(sh_pairs)} pairs of {all_pairs}"


def test_simhash_identical_text_same_sketch(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r["simhash"] for r in dd.simhash(df).collect()}
    assert rows[1] == rows[2]
    assert rows[3] is None


def test_cosine_neardup_planted(spark):
    base = [1.0] + [0.0] * 7
    near = [0.99] + [0.01] * 7
    ortho = [0.0] * 7 + [1.0]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, ortho)],
        "vec_id long, embedding array<double>",
    )
    pairs = dd.cosine_neardup_pairs(df, threshold=0.95).collect()
    assert {(r["vec_id_a"], r["vec_id_b"]) for r in pairs} == {(1, 2)}
    assert pairs[0]["cosine"] > 0.99

def test_simhash_portable_matches_python_reference(spark):
    """The md5_60 SimHash must equal a from-scratch Python reference:
    per-token md5 low-60 hash, ±1 votes per bit, positive-sum bits set.
    Pins every layer the DuckDB oracle relies on."""
    import hashlib

    def ref_simhash(text: str) -> int | None:
        toks = text.strip().lower().split()
        if not toks:
            return None
        votes = [0] * 60
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            for i in range(60):
                votes[i] += 1 if (h >> i) & 1 else -1
        return sum(1 << i for i in range(60) if votes[i] > 0)

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely unrelated content about spark engines"),
        (4, "   "),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["simhash"] for r in dd.simhash(df, hash_name="md5_60").collect()}
    for doc_id, text in rows:
        assert got[doc_id] == ref_simhash(text), doc_id


def test_winnowing_portable_matches_python_reference(spark):
    """md5_60 winnowing (k=5, window=4) vs a from-scratch reference."""
    import hashlib

    from data_quality_checks_in_relational_database_spark.operators.text import (
        winnowing_fingerprint,
    )

    def ref_fp(text: str, k: int = 5, window: int = 4) -> list[int]:
        toks = text.strip().lower().split()
        hs = [
            int(hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()[:15], 16)
            for i in range(len(toks) - k + 1)
        ]
        minima = {min(hs[i : i + window]) for i in range(len(hs) - window + 1)}
        return sorted(minima)

    rows = [
        (1, "a b c d e f g h i j k l m n"),
        (2, "one two three four five six seven eight nine"),
        (3, "too short"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: list(r["fingerprints"])
        for r in winnowing_fingerprint(df, hash_name="md5_60").collect()
    }
    assert got[1] == ref_fp(rows[0][1])
    assert got[2] == ref_fp(rows[1][1])
    assert got[3] == []


def test_decontaminate_crafted(spark):
    """End-to-end decontamination: a corpus doc quoting >= n-gram of an
    eval doc is dropped; clean docs and too-short overlaps survive."""
    from data_quality_checks_in_relational_database_spark.operators.decontam import (
        contamination_report,
        decontaminate,
    )

    eval_rows = [(100, "the secret benchmark answer is forty two exactly")]
    corpus_rows = [
        (1, "my model memorized the secret benchmark answer is forty two exactly sadly"),
        (2, "completely original text with no overlap at all whatsoever"),
        (3, "the secret benchmark"),  # < 5-gram overlap only
    ]
    ev = spark.createDataFrame(eval_rows, ["doc_id", "text"])
    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    rep = {r["doc_id"]: r for r in contamination_report(corpus, ev, n=5).collect()}
    assert set(rep) == {1}
    assert rep[1]["n_overlap_grams"] == 4  # 8-token quote -> 4 shared 5-grams
    kept = sorted(r["doc_id"] for r in decontaminate(corpus, ev, n=5).collect())
    assert kept == [2, 3]


def test_containment_catches_subset_docs(spark):
    """A short doc fully quoted inside a long one: Jaccard far below
    0.5 (missed by symmetric dedup) but containment 1.0."""
    from data_quality_checks_in_relational_database_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, quote), (2, quote + " " + filler), (3, "unrelated text entirely here")],
        ["doc_id", "text"],
    )
    cont = {
        (r["doc_id_small"], r["doc_id_big"]): r["containment"]
        for r in containment_pairs(docs, threshold=0.8).collect()
    }
    assert (1, 2) in cont and cont[(1, 2)] >= 0.8
    assert (2, 1) not in cont  # big side is NOT contained in the small one
    jac = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert not any({r["doc_id_a"], r["doc_id_b"]} == {1, 2} for r in jac)


def test_incremental_dedup_equals_exact_cross_pairs(spark):
    """Banded new-vs-corpus candidates + exact verify must equal the
    brute-force exact cross-set pairs at the 0.5 threshold (recall 1.0
    here — planted near-dups are far above the banding knee)."""
    from pyspark.sql import functions as F

    from data_quality_checks_in_relational_database_spark.operators.dedup import (
        minhash_lsh_pairs_against,
        ngram_jaccard_pairs,
        shingle_sets,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    new = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")
    got = {
        (r.new_id, r.corpus_id, round(r.jaccard, 9))
        for r in minhash_lsh_pairs_against(new, corpus, threshold=0.5).collect()
    }
    # exact baseline: all-pairs over the union, keep cross-set pairs
    exact = {
        (a, b, round(j, 9))
        for (a, b, j) in (
            (r.doc_id_a, r.doc_id_b, r.jaccard)
            for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
        )
    }
    new_ids = {r.doc_id for r in new.select("doc_id").collect()}
    cross = set()
    for a, b, j in exact:
        if (a in new_ids) != (b in new_ids):
            n_, c_ = (a, b) if a in new_ids else (b, a)
            cross.add((n_, c_, j))
    assert got == cross


def test_ledger_incremental_dedup_equals_direct(spark, tmp_path):
    """Dedup against a materialized ledger must equal the direct
    two-sided computation — the ledger is state, not approximation."""
    from pyspark.sql import functions as F

    from data_quality_checks_in_relational_database_spark.operators.dedup import (
        minhash_lsh_pairs_against,
        minhash_pairs_against_ledger,
        write_minhash_ledger,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    new = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")
    write_minhash_ledger(corpus, str(tmp_path / "ledger"))
    via_ledger = {
        (r.new_id, r.corpus_id, round(r.jaccard, 9))
        for r in minhash_pairs_against_ledger(new, str(tmp_path / "ledger")).collect()
    }
    direct = {
        (r.new_id, r.corpus_id, round(r.jaccard, 9))
        for r in minhash_lsh_pairs_against(new, corpus).collect()
    }
    assert via_ledger == direct and via_ledger
