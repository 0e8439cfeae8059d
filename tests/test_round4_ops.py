"""Round-4 operator pins: sliding-window substring-dup islands,
centroid silhouette arithmetic, and t-closeness EMD edge cases —
hand-computed tiny fixtures, independent of the DuckDB differential
gate."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.operators.linalg import (
    kmeans_silhouette,
)
from data_quality_checks_in_relational_database_spark.operators.text import (
    sliding_window_dup_report,
)


# ---------------------------------------------------------------------------
# sliding-window exact-substring dedup
# ---------------------------------------------------------------------------


def _dup_rows(spark, docs, k):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["doc_id"]: r for r in sliding_window_dup_report(df, k=k).collect()
    }


def test_sliding_window_identical_docs_fully_covered(spark):
    rows = _dup_rows(
        spark,
        [(1, "a b c d e"), (2, "a b c d e"), (3, "x y z w v")],
        k=3,
    )
    # docs 1 and 2 share every window; doc 3 shares none
    for d in (1, 2):
        r = rows[d]
        assert r["n_tokens"] == 5 and r["n_windows"] == 3
        assert r["n_shared_windows"] == 3
        assert r["n_islands"] == 1  # one contiguous run
        assert r["covered_tokens"] == 5  # the whole doc
        assert r["dup_coverage"] == 1.0
    r3 = rows[3]
    assert r3["n_shared_windows"] == 0 and r3["covered_tokens"] == 0
    assert r3["dup_coverage"] == 0.0


def test_sliding_window_two_islands_and_coverage(spark):
    # doc 1 embeds two separate copied trigrams from docs 2 and 3 with
    # a unique gap between them: positions 1 and 5 shared -> 2 islands,
    # coverage = 3 + 3 = 6 of 7 tokens
    rows = _dup_rows(
        spark,
        [
            (1, "p q r GAP s t u"),
            (2, "p q r zz1 zz2"),
            (3, "s t u zz3 zz4"),
        ],
        k=3,
    )
    r = rows[1]
    assert r["n_tokens"] == 7 and r["n_windows"] == 5
    assert r["n_shared_windows"] == 2
    assert r["n_islands"] == 2
    assert r["covered_tokens"] == 6
    assert abs(r["dup_coverage"] - 6 / 7) < 1e-6


def test_sliding_window_overlapping_islands_union_not_sum(spark):
    # ADVICE r3 repro: doc 1 shares windows at positions 1 and 3 with
    # k=3 — two islands whose token spans [1,3] and [3,5] OVERLAP at
    # position 3. Naive per-island sums would report covered=6 of 5
    # tokens (coverage 1.2); the interval union must report exactly 5.
    # doc 2 carries "a b c" and "c d e" but NOT "b c d", so only doc
    # 1's positions 1 and 3 are shared.
    rows = _dup_rows(
        spark,
        [(1, "a b c d e"), (2, "a b c x c d e")],
        k=3,
    )
    r1 = rows[1]
    assert r1["n_shared_windows"] == 2 and r1["n_islands"] == 2
    assert r1["covered_tokens"] == 5  # union {1..5}, not 3+3=6
    assert r1["dup_coverage"] == 1.0
    # doc 2's islands (positions 1 and 5) are >= k apart: no overlap,
    # plain span sum 3+3=6 of 7 tokens
    r2 = rows[2]
    assert r2["n_islands"] == 2 and r2["covered_tokens"] == 6
    assert abs(r2["dup_coverage"] - 6 / 7) < 1e-6


def test_sliding_window_short_and_empty_docs_report_zero(spark):
    rows = _dup_rows(spark, [(1, "a b"), (2, ""), (3, "a b")], k=3)
    # both real docs are shorter than k: no windows, never "shared"
    for d in (1, 2, 3):
        assert rows[d]["n_windows"] == 0
        assert rows[d]["n_shared_windows"] == 0
        assert rows[d]["dup_coverage"] == 0.0
    assert rows[2]["n_tokens"] == 0


def test_sliding_window_within_doc_repeat_not_shared(spark):
    # the trigram "a b a" repeats WITHIN doc 1 only -> distinct-doc
    # count is 1, so nothing is flagged
    rows = _dup_rows(spark, [(1, "a b a b a"), (2, "q r s t u")], k=3)
    assert rows[1]["n_shared_windows"] == 0


# ---------------------------------------------------------------------------
# centroid silhouette
# ---------------------------------------------------------------------------


def test_kmeans_silhouette_hand_values(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    cents = [[0.0, 0.0], [4.0, 0.0]]
    rows = {r["vec_id"]: r for r in kmeans_silhouette(df, cents).collect()}
    # point 1 sits on centroid 0: a=0, b=4, s=(4-0)/4=1
    assert rows[1]["cluster"] == 0
    assert rows[1]["a_dist"] == 0.0 and rows[1]["b_dist"] == 4.0
    assert rows[1]["silhouette"] == 1.0
    # point 2: a=1 (c0), b=3 (c1), s=(3-1)/3
    assert rows[2]["cluster"] == 0
    assert rows[2]["a_dist"] == 1.0 and rows[2]["b_dist"] == 3.0
    assert abs(rows[2]["silhouette"] - 2 / 3) < 1e-6


def test_kmeans_silhouette_tie_and_coincident_centroids(spark):
    df = spark.createDataFrame(
        [(1, [2.0, 0.0]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    # point 1 equidistant from both centroids -> argmin picks cluster
    # 0, a == b -> s = 0; point 2 on coincident duplicate centroids
    cents0 = [[0.0, 0.0], [4.0, 0.0]]
    rows = {r["vec_id"]: r for r in kmeans_silhouette(df, cents0).collect()}
    assert rows[1]["cluster"] == 0 and rows[1]["silhouette"] == 0.0
    cents1 = [[0.0, 0.0], [0.0, 0.0]]
    rows = {r["vec_id"]: r for r in kmeans_silhouette(df, cents1).collect()}
    # a = b = 0 -> defined as 0, not NaN
    assert rows[2]["silhouette"] == 0.0 and not math.isnan(rows[2]["silhouette"])


# ---------------------------------------------------------------------------
# MMR rerank
# ---------------------------------------------------------------------------


def test_mmr_prefers_diverse_second_pick(spark):
    from data_quality_checks_in_relational_database_spark.operators.similarity import (
        mmr_rerank,
    )

    # corpus: 10/11 parallel duplicates (fully redundant), 12 less
    # relevant but diverse; plain top-2 picks 10 then 11, a
    # diversity-weighted MMR (mu > lam) must pick 10 then 12:
    # score(11) = 0.3*1.0 - 0.7*1.0 = -0.4 < score(12) = 0.3*0.6 -
    # 0.7*0.6 = -0.24
    rows = [
        (0, [1.0, 0.0]),  # query
        (10, [1.0, 0.0]),
        (11, [2.0, 0.0]),
        (12, [0.6, 0.8]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id = 0")
    out = mmr_rerank(df, q, k_candidates=3, m=2, lam_w=3, mu_w=7)
    got = [(r["step"], r["neighbor_id"]) for r in out.orderBy("step").collect()]
    assert got == [(1, 10), (2, 12)]
    rows_by_step = {r["step"]: r for r in out.collect()}
    assert rows_by_step[1]["max_sim_selected"] == 0.0
    # step 2's penalty is sim(12, 10), not clamped at zero
    assert 0.0 < rows_by_step[2]["max_sim_selected"] < 1.0


def test_mmr_emits_min_of_m_and_candidates(spark):
    from data_quality_checks_in_relational_database_spark.operators.similarity import (
        mmr_rerank,
    )

    rows = [(0, [1.0, 0.0]), (1, [0.5, 0.5]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id = 0")
    out = mmr_rerank(df, q, k_candidates=10, m=5).collect()
    # only 2 candidates exist (self excluded) -> 2 steps, not 5
    assert sorted(r["step"] for r in out) == [1, 2]


# ---------------------------------------------------------------------------
# curriculum shard dealing
# ---------------------------------------------------------------------------


def test_curriculum_shards_balanced_within_source(spark):
    from data_quality_checks_in_relational_database_spark.plans.curation_queries import (
        _N_SHARDS,
        q_curriculum_shards,
    )
    from tests.conftest import SF_SMOKE

    rep = q_curriculum_shards(spark, SF_SMOKE).collect()
    per_source = {}
    for r in rep:
        per_source.setdefault(r["source"], []).append(r["n_docs"])
    for src, counts in per_source.items():
        # round-robin dealing: shard sizes within a source differ by <= 1
        assert max(counts) - min(counts) <= 1, (src, counts)
        assert len(counts) <= _N_SHARDS


# ---------------------------------------------------------------------------
# label propagation
# ---------------------------------------------------------------------------


def test_label_propagation_driver_and_distributed_agree(spark):
    from data_quality_checks_in_relational_database_spark.operators.cluster import (
        label_propagation,
    )

    # two triangles bridged by one edge + an isolated pair
    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3), (1, 3),
            (3, 4),
            (4, 5), (5, 6), (4, 6),
            (10, 11),
        ],
        "doc_id_a long, doc_id_b long",
    )
    fast = {
        (r["node"], r["label"])
        for r in label_propagation(pairs, rounds=4).collect()
    }
    dist = {
        (r["node"], r["label"])
        for r in label_propagation(pairs, rounds=4, driver_threshold=0).collect()
    }
    assert fast == dist and len(fast) == 8
    labels = dict(fast)
    # triangle members converge onto the triangle's min label
    assert labels[1] == labels[2] == labels[3] == 1
    # the isolated PAIR is the classic synchronous-LP bipartite
    # oscillator: labels swap every round, so after an even number of
    # rounds each node is back to its own label — deterministic, and
    # identical on both physical paths
    assert labels[10] == 10 and labels[11] == 11


# ---------------------------------------------------------------------------
# repeated-step funnels
# ---------------------------------------------------------------------------


def _ev(spark, rows):
    import datetime

    return spark.createDataFrame(
        [
            (u, datetime.datetime(2024, 1, 1, 0, 0, s), t)
            for (u, s, t) in rows
        ],
        "user_id long, ts timestamp, event_type string",
    )


def test_funnel_repeated_step_names(spark):
    from data_quality_checks_in_relational_database_spark.operators.funnel import funnel_report

    # steps view->click->view: an event type owning TWO step positions
    ev = _ev(
        spark,
        [
            (1, 1, "view"), (1, 2, "click"), (1, 3, "view"),   # full funnel
            (2, 1, "view"), (2, 2, "click"),                    # stops at 2
            (3, 1, "view"), (3, 2, "view"),                     # 2nd view is NOT a click
            (4, 1, "click"), (4, 2, "view"),                    # click can't open the funnel
            (5, 1, "view"), (5, 2, "view"), (5, 3, "click"), (5, 4, "view"),
        ],
    )
    got = {
        r["step"]: r["n_users"]
        for r in funnel_report(
            ev, "user_id", "ts", "event_type", ["view", "click", "view"]
        ).collect()
    }
    # hand-computed: reached u1=3 u2=2 u3=1 u4=1 u5=3
    assert got == {1: 5, 2: 3, 3: 2}


def test_funnel_windowed_repeated_step_names(spark):
    from data_quality_checks_in_relational_database_spark.operators.funnel import (
        funnel_report_windowed,
    )

    ev = _ev(
        spark,
        [
            (1, 0, "view"), (1, 5, "click"), (1, 8, "view"),    # all within 10s
            (2, 0, "view"), (2, 5, "click"), (2, 30, "view"),   # 3rd step late
        ],
    )
    got = {
        r["step"]: r["n_users"]
        for r in funnel_report_windowed(
            ev, "user_id", "ts", "event_type", ["view", "click", "view"], 10
        ).collect()
    }
    assert got == {1: 2, 2: 2, 3: 1}


# ---------------------------------------------------------------------------
# survival KM gate
# ---------------------------------------------------------------------------


def test_survival_km_nonempty_at_test_scale(spark):
    # ADVICE r3: with a 7-day churn gap every user was censored and the
    # registered query emitted 0 rows at every shipped SF — a vacuous
    # oracle match. Pin that the gate yields actual deaths (and a
    # survival value strictly below 1) at smoke scale.
    from data_quality_checks_in_relational_database_spark.plans.survival_queries import (
        q_survival_km,
    )
    from tests.conftest import SF_SMOKE

    rows = q_survival_km(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    assert all(r["d_events"] > 0 for r in rows)
    assert min(r["survival"] for r in rows) < 1.0


# ---------------------------------------------------------------------------
# JSON type-inference profile (the registered gate's data is all-int,
# so every other classification branch is pinned here)
# ---------------------------------------------------------------------------


def test_json_schema_profile_classifies_every_type(spark):
    from pyspark.sql import functions as _F

    rows = [
        ('{"a": 1, "b": 1.5, "c": true, "d": null, "e": "x", "f": -7, "g": "2.x"}',),
        ('{"a": -2, "b": 0.25, "c": false, "d": "s", "e": "7seven"}',),
    ]
    ev = spark.createDataFrame(rows, "props string")
    kv = ev.select(
        _F.explode(_F.from_json("props", "map<string,string>")).alias("key", "val")
    )
    is_int = _F.col("val").rlike(r"^-?\d+$")
    is_dbl = _F.col("val").rlike(r"^-?\d+\.\d+$")
    is_bool = _F.col("val").isin("true", "false")
    prof = {
        r["key"]: r
        for r in kv.groupBy("key")
        .agg(
            _F.sum(is_int.cast("int")).alias("n_integer"),
            _F.sum((~is_int & is_dbl).cast("int")).alias("n_double"),
            _F.sum((~is_int & ~is_dbl & is_bool).cast("int")).alias("n_boolean"),
            _F.sum(_F.col("val").isNull().cast("int")).alias("n_null"),
            _F.sum(
                (_F.col("val").isNotNull() & ~is_int & ~is_dbl & ~is_bool).cast("int")
            ).alias("n_string"),
        )
        .collect()
    }
    assert prof["a"]["n_integer"] == 2 and prof["a"]["n_string"] == 0
    assert prof["b"]["n_double"] == 2
    assert prof["c"]["n_boolean"] == 2
    # JSON null parses to a NULL map value; "s" is a string
    assert prof["d"]["n_null"] == 1 and prof["d"]["n_string"] == 1
    assert prof["e"]["n_string"] == 2
    assert prof["f"]["n_integer"] == 1
    assert prof["g"]["n_string"] == 1


# ---------------------------------------------------------------------------
# Jaro-Winkler parity + debounce
# ---------------------------------------------------------------------------


def test_jaro_winkler_matches_duckdb_exactly(spark):
    # the jw_part_linkage oracle replays DuckDB's jaro_winkler_similarity;
    # valid only if OUR implementation matches it bit-for-bit. Fuzz over
    # random short strings incl. empties, transpositions, prefixes.
    import random as _random

    import duckdb

    from data_quality_checks_in_relational_database_spark.operators.fuzzy import (
        jaro_winkler_blocked_pairs,
    )

    rng = _random.Random(7)
    rows = [
        (
            i,
            "".join(rng.choice("abcde ") for _ in range(rng.randint(0, 14))),
        )
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "rid long, name string")
    got = {
        (r["id_a"], r["id_b"]): r["jw"]
        for r in jaro_winkler_blocked_pairs(
            df, "name", "rid", block_cols=[F.lit(1)], threshold=0.0
        ).collect()
    }
    con = duckdb.connect()
    by_id = dict(rows)
    for (ia, ib), jw in got.items():
        want = con.execute(
            "SELECT ROUND(jaro_winkler_similarity(?, ?), 6) + 0.0",
            [by_id[ia], by_id[ib]],
        ).fetchone()[0]
        assert jw == want, (by_id[ia], by_id[ib], jw, want)
    # every unordered pair present (threshold 0 keeps all)
    assert len(got) == 120 * 119 // 2


def test_debounce_greedy_chain(spark):
    import datetime

    from data_quality_checks_in_relational_database_spark.operators.funnel import (
        debounce_events,
    )

    # events at t=0,10,25,40s with gap 20s: keep 0 (first), drop 10,
    # keep 25 (25-0>=20), drop 40 (40-25<20) — a lag-based rule would
    # wrongly keep 40 (40-25 vs last RAW event differs from last KEPT)
    base = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (i, base + datetime.timedelta(seconds=s), 1, "click")
            for i, s in enumerate([0, 10, 25, 40])
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    got = {
        r["event_id"]: r["kept"]
        for r in debounce_events(
            ev, "user_id", "ts", "event_type", "event_id", gap_seconds=20
        ).collect()
    }
    assert got == {0: True, 1: False, 2: True, 3: False}


# ---------------------------------------------------------------------------
# multi-source BFS
# ---------------------------------------------------------------------------


def test_bfs_hops_chain_and_unreached(spark):
    from data_quality_checks_in_relational_database_spark.operators.graph import bfs_hops

    # chain 1-2-3-4-5-6-7, branch 3-10, isolated pair 20-21; seeds {1, 20}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (3, 10), (20, 21)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(1,), (20,)], "node long")
    got = {
        (r["node"], r["hops"])
        for r in bfs_hops(edges, seeds, max_hops=4).collect()
    }
    # node 6 is 5 hops from seed 1 -> absent at max_hops=4; 7 likewise
    assert got == {
        (1, 0), (20, 0), (2, 1), (21, 1), (3, 2), (4, 3), (10, 3), (5, 4)
    }


def test_bfs_hops_min_over_multiple_seeds(spark):
    from data_quality_checks_in_relational_database_spark.operators.graph import bfs_hops

    # diamond: both seeds reach node 3; min distance must win
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (9, 3)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,), (9,)], "node long")
    got = dict(
        (r["node"], r["hops"]) for r in bfs_hops(edges, seeds, max_hops=4).collect()
    )
    assert got[3] == 1  # via seed 9, not 2 via seed 1


def test_bfs_registered_gate_expands_beyond_seeds(spark):
    # guard against the vacuous-gate failure mode: the registered query
    # must emit at least one row with hops > 0 at smoke scale
    from data_quality_checks_in_relational_database_spark.plans.graph_queries import q_bfs_hops
    from tests.conftest import SF_SMOKE

    rows = q_bfs_hops(spark, SF_SMOKE).collect()
    assert any(r["hops"] > 0 for r in rows)


# ---------------------------------------------------------------------------
# prefix-filter Jaccard join
# ---------------------------------------------------------------------------


def test_prefix_filter_equals_inverted_index(spark):
    from data_quality_checks_in_relational_database_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )
    from data_quality_checks_in_relational_database_spark.session import load_tables
    from tests.conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE, ("documents",))["documents"]
    for thr in (0.5, 0.3):
        base = {
            (r["doc_id_a"], r["doc_id_b"], r["jaccard"])
            for r in ngram_jaccard_pairs(docs, threshold=thr).collect()
        }
        pf = {
            (r["doc_id_a"], r["doc_id_b"], r["jaccard"])
            for r in prefix_filter_jaccard_pairs(docs, threshold=thr).collect()
        }
        assert pf == base and len(base) > 0, thr


# ---------------------------------------------------------------------------
# stdlib PNG codec (the real decode_image slot)
# ---------------------------------------------------------------------------


def test_png_roundtrip_every_filter_type():
    from data_quality_checks_in_relational_database_spark.operators.multimodal import (
        decode_png,
        encode_png_gray,
    )

    px = [[(7 * y + 3 * x) % 256 for x in range(9)] for y in range(5)]
    want_total = sum(sum(r) for r in px)
    for ft in range(5):
        d = decode_png(encode_png_gray(px, filter_type=ft))
        assert (d["width"], d["height"]) == (9, 5), ft
        assert d["bit_depth"] == 8 and d["color_type"] == 0
        assert d["n_samples"] == 45
        assert d["brightness_milli"] == want_total * 1000 // 45, ft


def test_png_decode_rgb_and_rgba_via_reference_encoder():
    # hand-rolled RGB/RGBA encodings (filter 0) — decode must handle
    # multi-channel strides and per-channel Sub/Paeth offsets
    import struct
    import zlib

    from data_quality_checks_in_relational_database_spark.operators.multimodal import (
        decode_png,
    )

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    def make(color_type, ch, w, h):
        samples = bytes((11 * i) % 256 for i in range(w * h * ch))
        raw = bytearray()
        for y in range(h):
            raw.append(0)
            raw += samples[y * w * ch : (y + 1) * w * ch]
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )
        return png, samples

    for color_type, ch in ((2, 3), (6, 4)):
        png, samples = make(color_type, ch, 4, 3)
        d = decode_png(png)
        assert (d["width"], d["height"], d["color_type"]) == (4, 3, color_type)
        assert d["n_samples"] == 4 * 3 * ch
        assert d["brightness_milli"] == sum(samples) * 1000 // len(samples)


def test_png_decode_rejects_corruption_and_unsupported():
    import pytest

    from data_quality_checks_in_relational_database_spark.operators.multimodal import (
        decode_image,
        decode_png,
        encode_png_gray,
    )

    png = encode_png_gray([[1, 2], [3, 4]])
    # flip one IDAT byte -> CRC must catch it
    bad = bytearray(png)
    bad[41] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    with pytest.raises(ValueError):
        decode_png(b"GIF89a totally not a png")
    # decode_image: PNG magic routes to the real decoder; JPEG routes to
    # the r5 header probe (a corrupt stream is a ValueError there);
    # genuinely unknown formats still raise NotImplementedError
    assert decode_image(png, "png")["width"] == 2
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff jpeg-ish", "jpeg")
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF....WAVE", "wav")


# ---------------------------------------------------------------------------
# banded SRP-LSH near-dup (the *_lsh registry twins)
# ---------------------------------------------------------------------------


def test_srp_banded_recall_is_one_at_twin_settings(spark):
    # the three *_lsh registry twins share the SAME recursive-CTE
    # oracles as their exact forms — valid ONLY if banding recall is
    # exactly 1.0 at the registered (threshold, bands, bits, seed).
    # Pin it at smoke AND driver-gate scale.
    from data_quality_checks_in_relational_database_spark.operators.similarity import (
        cosine_allpairs_blockjoin,
        srp_banded_neardup,
    )
    from data_quality_checks_in_relational_database_spark.plans.pipeline_queries import (
        _LSH_BANDS,
        _LSH_BITS,
        _LSH_THR,
    )
    from data_quality_checks_in_relational_database_spark.session import load_tables
    from tests.conftest import SF_SMOKE

    for sf_dir in (SF_SMOKE, "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
        exact = {
            (r["vec_id_a"], r["vec_id_b"])
            for r in cosine_allpairs_blockjoin(emb, threshold=_LSH_THR).collect()
        }
        lsh = {
            (r["vec_id_a"], r["vec_id_b"])
            for r in srp_banded_neardup(
                emb, threshold=_LSH_THR, n_bands=_LSH_BANDS, band_bits=_LSH_BITS
            ).collect()
        }
        assert lsh == exact and len(exact) > 0, (sf_dir, len(lsh), len(exact))


def test_srp_banded_production_threshold_selective_and_exact(spark):
    # production regime (threshold 0.9, defaults r=12/L=8): construct a
    # corpus of 40 random unit-ish vectors plus 5 planted near-dup
    # pairs at cosine >= 0.97; banding must (a) recover every true
    # pair after exact verify and (b) actually PRUNE — the candidate
    # join must touch far fewer pairs than n^2/2
    import random as _random

    from pyspark.sql import functions as F

    from data_quality_checks_in_relational_database_spark.operators.similarity import (
        srp_banded_neardup,
    )

    rng = _random.Random(123)
    dim = 64
    rows = []
    for i in range(40):
        rows.append((i, [rng.gauss(0.0, 1.0) for _ in range(dim)]))
    # planted pairs: id 100+j is a tiny perturbation of id j
    for j in range(5):
        base = rows[j][1]
        rows.append((100 + j, [x + rng.gauss(0.0, 0.02) for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in srp_banded_neardup(df, threshold=0.9).collect()
    }
    # brute-force truth
    import numpy as np

    E = {i: np.array(v) for i, v in rows}
    truth = set()
    ids = sorted(E)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            c = E[a] @ E[b] / (np.linalg.norm(E[a]) * np.linalg.norm(E[b]))
            if c >= 0.9:
                truth.add((a, b))
    assert truth == got and len(truth) >= 5
    # selectivity: count candidate pairs the banding admits (before the
    # cosine filter) by re-running with threshold=-1 (verify disabled)
    cands = srp_banded_neardup(df, threshold=-1.0).count()
    n = len(rows)
    assert cands < (n * (n - 1) // 2) * 0.25, cands


# ---------------------------------------------------------------------------
# negative sampling
# ---------------------------------------------------------------------------


def test_negative_sample_matches_naive_window(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from data_quality_checks_in_relational_database_spark.operators.sampling import (
        negative_sample,
    )

    cands = spark.createDataFrame(
        [(a, d) for a in (1, 2) for d in range(100) if d != a],
        "anchor long, key long",
    )
    fast = {
        (r["anchor"], r["rank"], r["key"])
        for r in negative_sample(cands, "anchor", "key", k=5).collect()
    }
    h = F.md5(F.concat_ws(":", F.col("anchor").cast("string"), F.col("key").cast("string")))
    w = Window.partitionBy("anchor").orderBy(h.asc(), F.col("key").asc())
    naive = {
        (r["anchor"], r["rank"], r["key"])
        for r in cands.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter("rank <= 5")
        .collect()
    }
    assert fast == naive and len(fast) == 10


# ---------------------------------------------------------------------------
# k-core peeling
# ---------------------------------------------------------------------------


def test_kcore_triangle_survives_pendants_peel(spark):
    from data_quality_checks_in_relational_database_spark.operators.graph import kcore_peel

    # triangle 1-2-3 with pendant chains 3-4-5 and 1-6; isolated pair 8-9.
    # 2-core = the triangle only; node 4 has degree 2 INITIALLY but
    # peels in round 2 after pendant 5 goes — the iterative part.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (1, 6), (8, 9)],
        "src long, dst long",
    )
    rows = {r["node"]: r for r in kcore_peel(edges, k=2, rounds=4).collect()}
    assert {n for n, r in rows.items() if r["in_kcore"]} == {1, 2, 3}
    assert all(rows[n]["core_degree"] == 2 for n in (1, 2, 3))
    assert rows[4]["in_kcore"] is False and rows[4]["core_degree"] == 0
    assert rows[8]["in_kcore"] is False


def test_kcore_rounds_upper_bound(spark):
    from data_quality_checks_in_relational_database_spark.operators.graph import kcore_peel

    # a 6-chain hung off a triangle needs 6 peel rounds to fully clear;
    # with rounds=2 the inner chain nodes still LOOK like core-degree-2
    # nodes — documents that `rounds` is an upper bound the caller sizes
    chain = [(10 + i, 11 + i) for i in range(6)] + [(16, 17), (17, 18), (16, 18)]
    edges = spark.createDataFrame(chain, "src long, dst long")
    few = {r["node"] for r in kcore_peel(edges, k=2, rounds=2).collect() if r["in_kcore"]}
    full = {r["node"] for r in kcore_peel(edges, k=2, rounds=8).collect() if r["in_kcore"]}
    assert full == {16, 17, 18}
    assert full < few  # under-peeled superset at rounds=2


# ---------------------------------------------------------------------------
# epoch-commit protocol helper (pure filesystem, no Spark)
# ---------------------------------------------------------------------------


def test_epoch_state_version_resolution(tmp_path):
    import os

    from data_quality_checks_in_relational_database_spark.streaming.epoch_state import (
        COMMIT_MARKER,
        commit_version,
        committed_versions,
        latest_committed_version,
        version_dir,
    )

    root = str(tmp_path / "state")
    assert latest_committed_version(root) is None  # missing root tolerated
    # v1 committed, v2 committed, v3 written but NOT committed
    for v in (1, 2, 3):
        d = version_dir(root, v)
        os.makedirs(d)
        if v < 3:
            commit_version(d)
    assert latest_committed_version(root, marker=COMMIT_MARKER) == 2
    # retry of epoch 2 must resolve strictly-older state (v1), never
    # its own half-committed output
    assert latest_committed_version(root, before=2, marker=COMMIT_MARKER) == 1
    assert latest_committed_version(root, before=1, marker=COMMIT_MARKER) is None
    assert committed_versions(root, marker=COMMIT_MARKER) == [1, 2]
    # commit v3 -> becomes latest
    commit_version(version_dir(root, 3))
    assert latest_committed_version(root, marker=COMMIT_MARKER) == 3
