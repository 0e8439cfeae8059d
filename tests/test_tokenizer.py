"""BPE merge training: differential parity with the sequential
reference algorithm, plus sliding-chunk semantics and oracle parity."""

from __future__ import annotations

from collections import Counter

from data_quality_checks_in_relational_database_spark.operators.packing import sliding_chunks
from data_quality_checks_in_relational_database_spark.operators.tokenizer import (
    bpe_reference,
    bpe_train_merges,
)
from data_quality_checks_in_relational_database_spark.plans import extension_queries as xq
from tests.conftest import SF_SMOKE, assert_matches_oracle


def _word_freqs(texts):
    c = Counter()
    for t in texts:
        c.update(t.lower().split())
    return dict(c)


def test_bpe_matches_sequential_reference(spark):
    texts = [
        "low lower lowest newest widest new wide",
        "low low lower newest newest newest",
        "the new list the newest list",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in bpe_train_merges(df, n_merges=8).orderBy("rank").collect()
    ]
    want = bpe_reference(_word_freqs(texts), n_merges=8)
    assert got == want
    assert len(got) >= 4  # corpus is rich enough that training doesn't stall


def test_bpe_merge_is_greedy_nonoverlapping(spark):
    # 'aaaa' with freq 1: round 1 learns (a,a) with count 3 (all adjacent
    # pairs), and the rewrite yields [aa, aa] — NOT [aa, a, a].
    df = spark.createDataFrame([(0, "aaaa")], "doc_id long, text string")
    got = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in bpe_train_merges(df, n_merges=2, min_pair_count=1).orderBy("rank").collect()
    ]
    assert got[0] == (0, "a", "a", 3)
    # round 2 sees [aa, aa] → pair (aa, aa) count 1
    assert got[1] == (1, "aa", "aa", 1)


def test_bpe_smoke_corpus_matches_reference(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    texts = [r.text for r in docs.select("text").collect()]
    got = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in bpe_train_merges(docs, n_merges=5).orderBy("rank").collect()
    ]
    want = bpe_reference(_word_freqs(texts), n_merges=5)
    assert got == want


def test_sliding_chunks_semantics(spark):
    # 10 tokens, size 8, stride 4 → chunks at offsets 0 (len 8) and 4 (len 6);
    # NO third chunk fully contained in the second.
    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(0, text), (1, ""), (2, "one two")], "doc_id long, text string")
    out = sliding_chunks(df, size=8, stride=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_tokens))
    assert by_doc[0] == [(0, 8), (1, 6)]
    assert 1 not in by_doc  # empty doc emits nothing
    assert by_doc[2] == [(0, 2)]  # short doc → single whole-doc chunk


def test_chunk_overlap_oracle_parity(spark, duck):
    assert_matches_oracle(
        xq.q_chunk_overlap(spark, SF_SMOKE), duck, xq.ORACLE_CHUNK_OVERLAP
    )


def test_bpe_encode_matches_sequential_reference(spark):
    from data_quality_checks_in_relational_database_spark.operators.tokenizer import (
        bpe_encode_counts,
        bpe_encode_reference,
    )

    texts = [
        "low lower lowest newest widest new wide",
        "low low lower newest newest newest",
        "the new list the newest list",
        "",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    merges = [
        (r.left, r.right) for r in bpe_train_merges(df, n_merges=6).orderBy("rank").collect()
    ]
    assert merges, "training must learn merges on this corpus"
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_encode_counts(df, merges).collect()
    }
    assert got == bpe_encode_reference(texts, merges)
    # merged symbols bill fewer tokens than raw characters
    chars = {i: sum(len(w) for w in t.lower().split()) for i, t in enumerate(texts) if t}
    assert all(got[i][1] < chars[i] for i in got)
