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


# ------------------------------------------------------ MP3 probe codec


def test_mp3_probe_roundtrip_and_decoy():
    """Probe fields must replay the encode parameters; the ID3 tag body
    carries a fake sync pair, so a byte-scanning 'parser' would find a
    bogus frame INSIDE the tag — the walk must skip it by syncsafe
    length instead."""
    from data_quality_checks_in_relational_database_spark.operators.multimodal import (
        encode_mp3_stub,
        probe_mp3,
    )

    blob = encode_mp3_stub(bitrate_idx=9, sr_idx=1, n_frames=4, mode=3,
                           id3_body_len=24, pad_seed=5)
    p = probe_mp3(blob)
    assert p["n_frames"] == 4
    assert p["sample_rate"] == 48000
    assert p["bitrate_kbps"] == 128
    assert p["mode"] == "mono"
    assert p["duration_ms"] == 4 * 1152 * 1000 // 48000
    assert p["id3_bytes"] == 34 and p["total_bytes"] == len(blob)
    # the decoy: a naive scanner finds a sync pair well inside the tag
    assert 0 < blob.find(b"\xff\xfb") < p["id3_bytes"]


def test_mp3_probe_error_contracts():
    from data_quality_checks_in_relational_database_spark.operators.multimodal import (
        encode_mp3_stub,
        probe_mp3,
    )

    blob = encode_mp3_stub(3, 0, 2, 0)
    with pytest.raises(ValueError, match="truncated"):
        probe_mp3(blob[:-5])
    # flip the first frame header's version bits to MPEG-2 (version 10)
    hdr = bytearray(blob)
    first = probe_mp3(blob)["id3_bytes"]
    hdr[first + 1] = (hdr[first + 1] & ~0x18) | 0x10
    with pytest.raises(NotImplementedError, match="MPEG-1"):
        probe_mp3(bytes(hdr))
    # bitrate index 15 is invalid
    bad = bytearray(blob)
    bad[first + 2] = 0xF << 4
    with pytest.raises(ValueError, match="bitrate"):
        probe_mp3(bytes(bad))
    # corrupt syncsafe size byte (high bit set)
    ss = bytearray(blob)
    ss[6] = 0x80
    with pytest.raises(ValueError, match="syncsafe"):
        probe_mp3(bytes(ss))


# -------------------------------------------------- skew-split join


def test_skew_split_join_heavy_path_broadcasts(spark):
    """The heavy-key path must plan a BroadcastHashJoin (the mega-key
    never shuffles) and the split must reproduce the plain join
    exactly (matches=True, heavy+light == all fact rows)."""
    from tests.conftest import SF_SMOKE
    from data_quality_checks_in_relational_database_spark.plans.round7_queries import (
        q_skew_split_join,
    )

    df = q_skew_split_join(spark, SF_SMOKE)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    row = df.collect()[0]
    assert row["matches"] is True
    assert row["n_heavy_keys"] >= 1
    n_orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").count()
    assert row["heavy_rows"] + row["light_rows"] == n_orders
    assert row["heavy_rows"] >= n_orders // 4  # the planted mega-key mass


# ------------------------------------------- Mahalanobis outliers


def test_mahalanobis_flags_planted_outlier(spark):
    """A vector far outside the cloud must take the top score, and
    scores must replay the integer arithmetic."""
    from data_quality_checks_in_relational_database_spark.operators import (
        multimodal,  # noqa: F401  (import parity with other gates)
    )
    from data_quality_checks_in_relational_database_spark.plans.round7_queries import (
        _MH_SCALE,
        _MH_SQ,
    )
    import data_quality_checks_in_relational_database_spark.plans.round7_queries as r7q

    base = [
        (i, [((i * 7 + j * 13) % 11 - 5) / 100.0 for j in range(4)])
        for i in range(20)
    ]
    base.append((99, [5.0, -5.0, 5.0, -5.0]))  # the planted outlier
    emb = spark.createDataFrame(base, "vec_id long, embedding array<float>")

    import types

    def fake_load(spark_, sf_dir, names):
        return {"embeddings": emb}

    real = r7q.load_tables
    r7q.load_tables = fake_load
    try:
        out = {r["vec_id"]: r["score_scaled"] for r in
               r7q.q_embedding_mahalanobis(spark, "ignored").collect()}
    finally:
        r7q.load_tables = real
    top = max(out, key=out.get)
    assert top == 99
    # integer replay of one inlier's score
    import collections
    qs = collections.defaultdict(dict)
    for vid, vec in base:
        for i, e in enumerate(vec):
            q = round(float(e) * _MH_SQ)
            qs[i][vid] = q
    expect = 0
    for i, col in qs.items():
        n = len(col)
        s = sum(col.values())
        ss = sum(v * v for v in col.values())
        num = n * ss - s * s
        if num > 0:
            dev = n * col[0] - s
            expect += (dev * dev * _MH_SCALE) // num
    assert out[0] == expect


# --------------------------------------------- Adamic-Adar link prediction


def test_link_prediction_finds_planted_holes(spark):
    """Every planted hole whose endpoints still share >= 1 surviving
    non-hub neighbor must appear among the candidates (two-hop
    completeness), and the ranking must surface a non-trivial number
    of the holes."""
    from tests.conftest import SF_SMOKE
    from data_quality_checks_in_relational_database_spark.plans.round7_queries import (
        q_link_prediction,
    )

    rows = q_link_prediction(spark, SF_SMOKE).collect()
    assert rows, "candidate set must be non-empty"
    holes_found = [r for r in rows if r["is_planted_hole"]]
    assert holes_found, "AA must recover at least one planted hole"
    # scores are exact integer sums of per-node micro weights
    assert all(r["aa_score_micro"] > 0 and r["n_common"] >= 1 for r in rows)


# ------------------------------------------------- scan-pruning pins


def _read_schemas(df):
    import re

    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return [
        set(re.findall(r"(\w+):", m))
        for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    ]


def test_round7_scans_are_column_pruned(spark):
    """The new heavy queries must push projection to the parquet scan:
    a scan reading unused columns silently multiplies 100 TB I/O."""
    from tests.conftest import SF_SMOKE
    from data_quality_checks_in_relational_database_spark.plans.round7_queries import (
        q_bloom_join_prefilter,
        q_theilsen_trend,
    )

    for s in _read_schemas(q_bloom_join_prefilter(spark, SF_SMOKE)):
        assert s <= {"l_orderkey", "l_extendedprice",
                     "o_orderkey", "o_orderdate", "o_orderpriority"}, s
    for s in _read_schemas(q_theilsen_trend(spark, SF_SMOKE)):
        assert s == {"o_totalprice", "o_orderdate"}, s
