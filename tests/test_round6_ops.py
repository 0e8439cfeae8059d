"""Round-6 pins: MP4 box-walk probe contract, JW-over-SNM linkage,
df-capped TF-IDF twin, graph degenerate-input consistency + id-type
validation (r5 verdict items #2-#4 and the r5 ADVICE findings)."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------- MP4 probe


def _mp4_parts():
    from data_quality_checks_in_relational_database_spark.operators.multimodal import (
        encode_mp4_stub,
        probe_mp4,
    )

    return encode_mp4_stub, probe_mp4


def test_mp4_roundtrip_both_mvhd_versions_and_track_orders():
    enc, probe = _mp4_parts()
    for ver in (0, 1):
        for tracks, n, w in (
            ([(640, 360, b"avc1")], 1, 640),
            ([(640, 360, b"hvc1"), (0, 0, b"mp4a")], 2, 640),
            # audio FIRST: the probe must skip to the nonzero-width trak
            ([(0, 0, b"mp4a"), (1280, 720, b"vp09")], 2, 1280),
        ):
            d = probe(enc(90000, 600, tracks, mvhd_version=ver, filler_seed=7))
            assert d["duration_ms"] == 90000 * 1000 // 600 == 150000
            assert d["timescale"] == 600 and d["n_tracks"] == n
            assert d["width"] == w
            assert d["codec"] in ("avc1", "hvc1", "vp09")


def test_mp4_duration_ms_floors_like_the_oracle():
    enc, probe = _mp4_parts()
    # 1234 units at timescale 3000 -> 411.33..ms -> floor 411
    d = probe(enc(1234, 3000, [(16, 16, b"av01")]))
    assert d["duration_ms"] == 1234 * 1000 // 3000 == 411


def test_mp4_decoy_in_largesize_mdat_is_skipped():
    """The mdat body carries a fake moov/mvhd with timescale 0xFA11 —
    a buffer byte-scan reads it; the box walker must not."""
    enc, probe = _mp4_parts()
    b = enc(500, 600, [(32, 32, b"avc1")], filler_seed=3)
    assert b.find(b"mvhd", b.find(b"mdat")) != -1  # decoy really present
    # encoder used the 64-bit largesize form for mdat
    mdat_at = b.find(b"mdat") - 4
    assert struct.unpack(">I", b[mdat_at : mdat_at + 4])[0] == 1
    d = probe(b)
    assert d["timescale"] == 600 and d["duration"] == 500


def test_mp4_audio_only_yields_null_video_fields():
    enc, probe = _mp4_parts()
    d = probe(enc(100, 600, [(0, 0, b"mp4a")]))
    assert d["n_tracks"] == 1
    assert d["width"] is None and d["height"] is None and d["codec"] is None


def test_mp4_corruption_contract():
    enc, probe = _mp4_parts()
    good = enc(100, 600, [(64, 48, b"avc1")])
    with pytest.raises(ValueError, match="ftyp"):
        probe(b"\x00\x00\x00\x08free" + good)
    with pytest.raises(ValueError):
        probe(good[:30])  # truncated inside moov header region
    with pytest.raises(ValueError, match="too short"):
        probe(b"abc")
    # box whose size overruns the buffer
    bad = good[:4].replace(good[:4], struct.pack(">I", 2**31)) + good[4:]
    with pytest.raises(ValueError, match="bad MP4 box size"):
        probe(bad)
    with pytest.raises(ValueError, match="timescale"):
        enc(100, 0, [(64, 48, b"avc1")])
    with pytest.raises(ValueError, match="version"):
        enc(100, 600, [(64, 48, b"avc1")], mvhd_version=2)


# ----------------------------------------------------------- JW over SNM


def test_snm_jw_matches_bruteforce_window_semantics(spark):
    """Crafted names: pairs within the rank window AND jw >= t, exactly
    — computed independently by a pure-Python replay of the definition."""
    from data_quality_checks_in_relational_database_spark.operators.fuzzy import (
        sorted_neighborhood_jw_pairs,
    )

    names = [
        (1, "almond green tea"),
        (2, "almond green tae"),      # transposition of 1
        (3, "almond green tea x"),
        (4, "blueberry muffin"),
        (5, "blueberry muffins"),
        (6, "cherry pie"),
        (7, "zebra stripe paint"),
    ]
    df = spark.createDataFrame(names, "rid long, txt string")
    got = {
        (r["id_a"], r["id_b"]): r["jw"]
        for r in sorted_neighborhood_jw_pairs(
            df, "txt", "rid", window=2, threshold=0.9
        ).collect()
    }

    # independent replay: global sort by (txt, rid), window-2 pairs
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                + ",".join(f"({i}, '{s}')" for i, s in names)
                + ") v(rid, txt)")
    exp = {
        (a, b): round(jw, 6)
        for a, b, jw in con.execute(
            """
            WITH ranked AS (
                SELECT rid, txt, ROW_NUMBER() OVER (ORDER BY txt, rid) AS rank
                FROM t
            )
            SELECT LEAST(a.rid, b.rid), GREATEST(a.rid, b.rid),
                   jaro_winkler_similarity(a.txt, b.txt)
            FROM ranked a JOIN ranked b
              ON b.rank > a.rank AND b.rank - a.rank <= 2
            WHERE jaro_winkler_similarity(a.txt, b.txt) >= 0.9
            """
        ).fetchall()
    }
    assert got == exp and len(got) >= 2


def test_snm_jw_out_of_window_pair_absent(spark):
    """Recall contract: identical strings that sort > window apart are
    NOT paired (the documented SNM trade)."""
    from data_quality_checks_in_relational_database_spark.operators.fuzzy import (
        sorted_neighborhood_jw_pairs,
    )

    rows = [(1, "aaa")] + [(i, f"mid{i:03d}") for i in range(2, 9)] + [(9, "aab")]
    df = spark.createDataFrame(rows, "rid long, txt string")
    got = sorted_neighborhood_jw_pairs(df, "txt", "rid", window=1, threshold=0.9)
    pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    assert (1, 9) not in pairs  # jw("aaa","aab")≈0.93 but ranks differ by >1


# ------------------------------------------------------ TF-IDF cap twin


def test_tfidf_capped_drops_boilerplate_gram_pairs(spark):
    """A gram shared by MORE than max_doc_freq docs must not produce
    pairs under the cap (vocabulary membership, index AND norms)."""
    from data_quality_checks_in_relational_database_spark.operators.text import (
        tfidf_cosine_pairs,
    )

    # 5 identical docs (every gram df=5) + one distinct doc so df < N
    # and idf > 0 (df = N grams are idf-0 and dropped even uncapped)
    docs = [(i, "common boiler plate words here") for i in range(1, 6)]
    docs.append((6, "totally different sentence about giraffes"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    uncapped = tfidf_cosine_pairs(df, threshold=0.5).count()
    capped = tfidf_cosine_pairs(df, threshold=0.5, max_doc_freq=4).count()
    assert uncapped == 10  # all C(5,2) identical docs pair up
    assert capped == 0     # every shared gram has df=5 > 4: dropped


# ------------------------------------- graph degenerate-input contracts


def test_hits_zero_weights_consistent_across_size_split(spark):
    """All-zero weights: BOTH the driver fast path and the distributed
    path (forced via driver_threshold=0) must return all-zero scores —
    not AssertionError (r5 ADVICE #1)."""
    from data_quality_checks_in_relational_database_spark.operators.graph import (
        hits_scores,
    )

    edges = spark.createDataFrame(
        [(1, 2, 0.0), (2, 3, 0.0), (3, 1, 0.0)], "src long, dst long, w double"
    )
    for thr in (10, 0):
        rows = hits_scores(
            edges, weight_col="w", iters=2, driver_threshold=thr
        ).collect()
        assert len(rows) == 3
        assert all(r["hub"] == 0.0 and r["authority"] == 0.0 for r in rows)


def test_modularity_rejects_non_integral_ids(spark):
    """String ids would silently NULL-collapse under the long cast —
    must raise instead (r5 ADVICE #2)."""
    from data_quality_checks_in_relational_database_spark.operators.graph import (
        modularity_terms,
    )

    pairs = spark.createDataFrame(
        [("a", "b")], "doc_id_a string, doc_id_b string"
    )
    labels = spark.createDataFrame([("a", "x")], "node string, label string")
    with pytest.raises(ValueError, match="integral"):
        modularity_terms(pairs, labels)


# ------------------------------------------------- hot-bucket guards


def test_dhash_cap_drops_mega_bucket_keeps_normal_pairs(spark):
    """10 identical hashes form a hot bucket in every band; a separate
    2-member near pair must survive the cap, the 10-clique must not."""
    from data_quality_checks_in_relational_database_spark.operators.multimodal import (
        dhash_near_pairs,
    )

    rows = [(i, 7, 7, 7, 7) for i in range(10)]          # the mega-clique
    rows += [(100, 1, 2, 3, 4), (101, 1, 2, 3, 5)]       # hamming small
    df = spark.createDataFrame(rows, "doc_id long, b0 long, b1 long, b2 long, b3 long")
    uncapped = {(r["doc_id_a"], r["doc_id_b"]) for r in dhash_near_pairs(df).collect()}
    capped = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in dhash_near_pairs(df, max_bucket_size=5).collect()
    }
    assert (100, 101) in uncapped and (0, 1) in uncapped
    assert (100, 101) in capped
    assert not any(a < 10 and b < 10 for a, b in capped)  # clique gone
    assert len(uncapped) == 45 + 1 and len(capped) == 1


def test_minhash_cap_excludes_boilerplate_bucket(spark):
    """A template shared by many docs floods every band bucket; the cap
    removes those candidates while a distinct near-dup pair survives."""
    from data_quality_checks_in_relational_database_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    tpl = "the quick brown fox jumps over the lazy dog again and again"
    docs = [(i, tpl) for i in range(12)]
    # exact-dup pair (identical signatures collide in every band with
    # certainty — no LSH probability in the assertion) forming its own
    # size-2 buckets, safely under the cap
    other = "completely different text about mountain weather patterns"
    docs += [(100, other), (101, other)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    uncapped = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in minhash_lsh_pairs(df, threshold=0.5).collect()
    }
    capped = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in minhash_lsh_pairs(df, threshold=0.5, max_bucket_size=6).collect()
    }
    assert (100, 101) in uncapped and (0, 1) in uncapped
    assert (100, 101) in capped
    assert not any(a < 12 and b < 12 for a, b in capped)


def test_band_bucket_audit_counts_by_hand(spark):
    """Hand-checkable: band 0 has buckets {7:3, 9:1}, band 1 all
    distinct — pair mass and hot columns must match C(n,2) arithmetic."""
    from data_quality_checks_in_relational_database_spark.operators.dedup import (
        band_bucket_audit,
    )

    rows = [
        (1, 0, 7), (2, 0, 7), (3, 0, 7), (4, 0, 9),
        (1, 1, 11), (2, 1, 12), (3, 1, 13), (4, 1, 14),
    ]
    df = spark.createDataFrame(rows, "doc_id long, band long, bucket long")
    out = {
        r["band"]: r
        for r in band_bucket_audit(df, bucket_col="bucket", cap=2).collect()
    }
    b0 = out[0]
    assert (b0["n_buckets"], b0["n_rows"], b0["max_bucket"]) == (2, 4, 3)
    assert b0["pair_mass"] == 3 and b0["hot_buckets"] == 1
    assert b0["hot_rows"] == 3 and b0["hot_pair_mass"] == 3
    b1 = out[1]
    assert b1["pair_mass"] == 0 and b1["hot_buckets"] == 0


# ------------------------------------ enforced blocking-budget guard


def test_blocked_pairs_refuse_saturated_key(spark):
    """One block holding every record: avg pairs/record = (n-1)/2 —
    the enforced budget must refuse BEFORE building the join, and the
    error must name the scale-safe alternatives."""
    from data_quality_checks_in_relational_database_spark.operators.fuzzy import (
        blocked_fuzzy_pairs,
        jaro_winkler_blocked_pairs,
        multi_pass_fuzzy_pairs,
    )

    df = spark.createDataFrame(
        [(i, f"name{i:03d}", "SAME") for i in range(20)],
        "rid long, txt string, blk string",
    )
    with pytest.raises(ValueError, match="sorted_neighborhood"):
        blocked_fuzzy_pairs(
            df, "txt", "rid", ["blk"], max_dist=2, max_pairs_per_record=5
        )
    with pytest.raises(ValueError, match="saturated"):
        jaro_winkler_blocked_pairs(
            df, "txt", "rid", ["blk"], max_pairs_per_record=5
        )
    with pytest.raises(ValueError, match="saturated"):
        multi_pass_fuzzy_pairs(
            df, "txt", "rid", [["blk"]], max_dist=2, max_pairs_per_record=5
        )
    # inside budget: runs and returns the blocked pairs
    ok = blocked_fuzzy_pairs(
        df, "txt", "rid", ["blk"], max_dist=2, max_pairs_per_record=10
    )
    assert ok.count() > 0
    # unarmed (None): never refuses
    assert blocked_fuzzy_pairs(df, "txt", "rid", ["blk"], max_dist=2).count() > 0


# -------------------------------------------------- MP4 sample tables


def _mp4_sample_parts():
    from data_quality_checks_in_relational_database_spark.operators.multimodal import (
        encode_mp4_samples_stub,
        probe_mp4_samples,
    )

    return encode_mp4_samples_stub, probe_mp4_samples


def test_mp4_sample_index_offsets_are_content_verified():
    """Every (offset, size) from the expanded tables must slice exactly
    sample j's payload bytes — including across chunk boundaries and
    past the decoy prefix."""
    enc, probe = _mp4_sample_parts()
    sizes = [5, 9, 4, 17, 6, 8, 11]
    blob = enc(600, sizes, 100, 3, decoy_len=29)
    d = probe(blob)
    assert d["media_timescale"] == 600 and len(d["samples"]) == 7
    for j, ci, off, sz, pts in d["samples"]:
        assert sz == sizes[j] and ci == j // 3 and pts == j * 100
        assert blob[off : off + sz] == bytes(
            (j * 7 + bi * 13) % 256 for bi in range(sz)
        )
    # chunk 1's first sample does NOT start at chunk 0's offset
    offs = {ci: off for j, ci, off, sz, pts in d["samples"] if j % 3 == 0}
    assert offs[1] == offs[0] + sum(sizes[:3])


def test_mp4_sample_index_decoy_shift_matters():
    """Different decoy lengths shift every absolute offset; both blobs
    must still content-verify (the offsets are real, not relative)."""
    enc, probe = _mp4_sample_parts()
    a = enc(600, [8, 8], 100, 2, decoy_len=0)
    b = enc(600, [8, 8], 100, 2, decoy_len=31)
    oa = probe(a)["samples"][0][2]
    ob = probe(b)["samples"][0][2]
    assert ob == oa + 31
    assert a[oa : oa + 8] == b[ob : ob + 8]


def test_mp4_sample_index_error_contract():
    enc, probe = _mp4_sample_parts()
    from data_quality_checks_in_relational_database_spark.operators.multimodal import (
        encode_mp4_stub,
    )

    with pytest.raises(ValueError, match="sample"):
        enc(600, [], 100, 1)
    # a plain probe-stub MP4 has no sample tables
    with pytest.raises(ValueError, match="stbl missing|stsd|stts"):
        probe(encode_mp4_stub(100, 600, [(64, 48, b"avc1")]))
    # audio-only: nothing to index
    with pytest.raises(ValueError, match="no video track"):
        probe(encode_mp4_stub(100, 600, [(0, 0, b"mp4a")]))


# ------------------------------------------- bucketed zero-exchange agg


def test_bucketed_agg_plans_zero_exchanges(spark):
    """groupBy on the bucket key of a bucketed catalog table must plan
    NO shuffle exchange anywhere — the bucketed scan already satisfies
    the aggregate's required hash distribution."""
    import re

    from tests.conftest import SF_SMOKE
    from data_quality_checks_in_relational_database_spark.plans.scale_queries import (
        q_bucketed_agg,
    )

    out = q_bucketed_agg(spark, SF_SMOKE)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"Exchange (hashpartitioning|rangepartitioning)", plan), plan
    assert out.count() > 0


# ------------------------------------------------ retraction view (CDC)


def test_retraction_view_drains_groups_and_matches(spark):
    """Every linenumber-7 group must VANISH (count drained to exactly
    zero by the sign -1 deltas), every surviving group must match the
    full recompute."""
    from tests.conftest import SF_SMOKE
    from data_quality_checks_in_relational_database_spark.plans.scale_queries import (
        q_retraction_view,
    )

    rows = q_retraction_view(spark, SF_SMOKE).collect()
    assert rows and all(r["matches"] for r in rows)
    assert not any(r["linenumber"] == 7 for r in rows)  # retraction GC
    # and some group actually received inserts (cents shifted by +777s)
    assert any(r["linenumber"] == 1 for r in rows)


# --------------------------------------------------- multi-pass SNM


def test_snm_multikey_recovers_early_typo_pair(spark):
    """A FIRST-character typo sorts twins far apart under the forward
    key (single-pass SNM misses the pair) but adjacent under the
    reversed key — the multi-pass union must recover it."""
    from data_quality_checks_in_relational_database_spark.operators.fuzzy import (
        sorted_neighborhood_multikey_pairs,
        sorted_neighborhood_pairs,
    )

    rows = [(1, "aquamarine shimmer dust")] + [
        (i, f"mid{i:03d} filler entry") for i in range(2, 12)
    ] + [(12, "zquamarine shimmer dust")]  # a->z first char typo
    df = spark.createDataFrame(rows, "rid long, txt string")
    single = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(
            df, "txt", "rid", window=2, max_dist=2
        ).collect()
    }
    multi = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_multikey_pairs(
            df, "txt", "rid",
            sort_exprs=[F.col("txt"), F.reverse(F.col("txt"))],
            window=2, max_dist=2,
        ).collect()
    }
    assert (1, 12) not in single      # forward pass blind spot
    assert (1, 12) in multi           # reversed pass recovers it
    assert single <= multi            # union never loses pairs


# ------------------------------------------------- bloom FPP audit


def test_bloom_fpp_audit_bounds(spark):
    """Per file: 1 ≤ bits_set ≤ 2·n_keys (k=2 hashes; cross-key bit
    collisions can push distinct bits_set BELOW n_keys, so a lower
    bound of n_keys is not a true bloom invariant), and with load
    factors this low the 64 absent probes should yield at most a
    handful of false passes across ALL files
    (theory: Σ 64·(bits_set/m)² ≪ 1 at SMOKE)."""
    from tests.conftest import SF_SMOKE
    from data_quality_checks_in_relational_database_spark.plans.scale_queries import (
        q_bloom_fpp_audit,
    )

    rows = q_bloom_fpp_audit(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 1 <= r["bits_set"] <= 2 * r["n_keys"]
    assert sum(r["false_passes"] for r in rows) <= 5
