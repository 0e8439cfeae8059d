"""BM25 keyword retrieval + unigram-LM quality scoring: planted
semantics and oracle parity at the smoke scale factor."""

from __future__ import annotations

import math

import pytest

from data_quality_checks_in_relational_database_spark.operators import text as tx
from data_quality_checks_in_relational_database_spark.plans import extension_queries as xq
from tests.conftest import SF_SMOKE, assert_matches_oracle


@pytest.fixture(scope="module")
def tiny_corpus(spark):
    rows = [
        (0, "spark join window spark join spark"),  # dense in all 3 terms
        (1, "spark table scan filter merge sort"),  # one term only
        (2, "table scan filter merge sort batch"),  # no query terms
        (3, "join window join window join window"),  # dense in 2 rarer terms
        (4, "the quick brown fox jumps over dog"),  # no query terms
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_matching_docs_first(tiny_corpus):
    out = tx.bm25_topk(tiny_corpus, ("spark", "join", "window"), k=5).collect()
    ids = [r.doc_id for r in out]
    scores = {r.doc_id: r.bm25 for r in out}
    # docs with no query term score exactly 0 and sort last
    assert scores[2] == 0.0 and scores[4] == 0.0
    assert set(ids[:3]) == {0, 1, 3}
    # all-three-terms doc beats the one-term doc
    assert scores[0] > scores[1]
    # scores are finite, non-negative
    assert all(s >= 0 and math.isfinite(s) for s in scores.values())


def test_bm25_idf_downweights_ubiquitous_terms(spark):
    # 'common' is in every doc → idf = ln(1 + 0.5/ (n+0.5)) ≈ tiny;
    # 'rare' in one doc → large idf. The rare-term doc must win.
    rows = [(i, "common filler words here") for i in range(9)]
    rows.append((9, "common rare filler words"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tx.bm25_topk(df, ("common", "rare"), k=10).collect()
    assert out[0].doc_id == 9
    assert out[0].bm25 > out[1].bm25


def test_unigram_lm_scores_semantics(tiny_corpus):
    out = {r.doc_id: r for r in tx.unigram_lm_scores(tiny_corpus).collect()}
    assert len(out) == 5
    # every doc's avg logprob is negative (probabilities < 1)
    assert all(r.avg_logprob < 0 for r in out.values())
    # doc 4 is all hapax tokens → rarest → lowest mean logprob
    assert out[4].avg_logprob == min(r.avg_logprob for r in out.values())
    # n_tokens matches whitespace token counts
    assert out[0].n_tokens == 6 and out[4].n_tokens == 7


def test_unigram_lm_identical_docs_score_equal(spark):
    rows = [(0, "alpha beta gamma"), (1, "alpha beta gamma"), (2, "delta epsilon zeta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.avg_logprob for r in tx.unigram_lm_scores(df).collect()}
    assert out[0] == out[1]
    # duplicated doc's tokens have corpus count 2 vs 1 → higher probability
    assert out[0] > out[2]


def test_bm25_oracle_parity(spark, duck):
    assert_matches_oracle(xq.q_bm25_search(spark, SF_SMOKE), duck, xq.ORACLE_BM25_SEARCH)


def test_lm_score_oracle_parity(spark, duck):
    assert_matches_oracle(xq.q_lm_score(spark, SF_SMOKE), duck, xq.ORACLE_LM_SCORE)


def test_raw_ann_production_settings_run(spark):
    """The production-pruning ANN wrappers (deregistered from the
    driver gate in favor of their exact-equality gated forms) must keep
    running and returning ranked rows — they are the documented
    production settings; their recall is gated by ann_*_recall."""
    from data_quality_checks_in_relational_database_spark.plans.extension_queries import (
        q_ann_topk_ivf,
        q_ann_topk_lsh,
    )
    from tests.conftest import SF_SMOKE

    for fn in (q_ann_topk_lsh, q_ann_topk_ivf):
        rows = fn(spark, SF_SMOKE).collect()
        assert len(rows) > 0
        assert {r["rank"] for r in rows} <= set(range(1, 6))


def test_rrf_fuse_formula_and_missing_ids(spark):
    """RRF contract: rank by (rounded score desc, id asc) per system;
    ids absent from a system contribute 0; output covers the union."""
    from data_quality_checks_in_relational_database_spark.operators.fusion import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 5.0)], "doc_id long, s double"
    )
    dense = spark.createDataFrame([(3, 0.9), (4, 0.8)], "doc_id long, c double")
    got = {
        r["doc_id"]: (r["rrf"], r["rank_0"], r["rank_1"])
        for r in rrf_fuse([(lex, "s"), (dense, "c")], k0=60).collect()
    }
    # ties (2 vs 3 at s=5.0) break by doc_id asc
    assert got[1] == (round(1 / 61, 6), 1, None)
    assert got[2] == (round(1 / 62, 6), 2, None)
    assert got[3] == (round(1 / 63 + 1 / 61, 6), 3, 1)
    assert got[4] == (round(1 / 62, 6), None, 2)


def test_rrf_fuse_requires_input(spark):
    from data_quality_checks_in_relational_database_spark.operators.fusion import rrf_fuse
    import pytest as _pt

    with _pt.raises(ValueError):
        rrf_fuse([])
