"""Round-7 operator gates: enforced candidate budgets on the remaining
uncapped pair generators (r6 verdict #5) — the TF-IDF postings
self-join and the dHash band-bucket join refuse loudly past their
budgets, naming the capped twin, instead of running Σdf² / Σbucket²."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_tfidf_pairs_refuse_saturated_vocabulary(spark):
    """Every doc sharing one 3-gram ⇒ df = n ⇒ candidates/posting =
    (n−1)/2: the armed operator must refuse BEFORE building the
    postings join, naming the capped twin; inside-budget and unarmed
    calls still run."""
    from data_quality_checks_in_relational_database_spark.operators.text import (
        tfidf_cosine_pairs,
    )

    docs = spark.createDataFrame(
        # two outlier docs keep df(shared gram) = 20 < N = 22, so its
        # idf > 0 and the gram SURVIVES into the priced vocabulary (a
        # df = N gram has idf 0 and is dropped before the guard)
        [(i, "alpha beta gamma") for i in range(20)]
        + [(100, "delta epsilon zeta"), (101, "eta theta iota")],
        "doc_id long, text string",
    )
    # C(20,2) = 190 candidates over 22 postings: 190 > 5·22 ⇒ refuse
    with pytest.raises(ValueError, match="max_doc_freq"):
        tfidf_cosine_pairs(docs, threshold=0.5, max_candidates_per_posting=5)
    # 190 ≤ 10·22: inside budget, the 20 identical docs pair at cosine 1
    ok = tfidf_cosine_pairs(docs, threshold=0.5, max_candidates_per_posting=10)
    assert ok.count() == 190
    # unarmed (None): never refuses
    assert tfidf_cosine_pairs(docs, threshold=0.5).count() == 190


def test_dhash_pairs_refuse_saturated_buckets(spark):
    """Every image sharing all four band values (the all-black-thumbnail
    lake): Σ_bands C(n, 2) per unpivoted record = (n−1)/2 — the armed
    operator must refuse before any band join, naming the capped twin;
    the cap itself (max_bucket_size) remains the documented escape."""
    from data_quality_checks_in_relational_database_spark.operators.multimodal import (
        dhash_near_pairs,
    )

    hashed = spark.createDataFrame(
        [(i, 7, 7, 7, 7) for i in range(40)],
        "doc_id long, b0 long, b1 long, b2 long, b3 long",
    )
    with pytest.raises(ValueError, match="max_bucket_size"):
        dhash_near_pairs(hashed, max_candidates_per_record=10)
    # (n−1)/2 = 19.5 ≤ 20: inside budget — identical hashes all pair
    ok = dhash_near_pairs(hashed, max_candidates_per_record=20)
    assert ok.count() == 40 * 39 // 2
    # unarmed (None): never refuses
    assert dhash_near_pairs(hashed).count() == 40 * 39 // 2


def test_armed_wrappers_pass_at_smoke(spark):
    """The registered uncapped queries carry budgets tuned to pass every
    shipped SF (fire at the next decade): smoke-scale runs succeed."""
    from tests.conftest import SF_SMOKE
    from data_quality_checks_in_relational_database_spark.plans.extension_queries import (
        q_media_dhash_pairs,
        q_tfidf_cosine_pairs,
    )

    assert q_tfidf_cosine_pairs(spark, SF_SMOKE).count() >= 0
    assert q_media_dhash_pairs(spark, SF_SMOKE).count() >= 0
