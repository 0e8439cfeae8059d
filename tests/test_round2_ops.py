"""Crafted-input pins for the round-2 additions: interval-overlap join
(operators/interval.py::overlap_pairs), cross-source shingle overlap
(dedup.cross_source_overlap), quality-aware cluster representatives
(cluster.quality_representatives), and frequent-n-gram boilerplate
detection (text.frequent_ngrams). Each pins the semantic contracts the
sf-data differential oracle cannot isolate: boundary inclusion,
exactly-once pair emission across bucket layouts, argmax tie-breaks,
and tie-inclusive top-k ranking.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.operators.cluster import (
    quality_representatives,
)
from data_quality_checks_in_relational_database_spark.operators.dedup import (
    cross_source_overlap,
)
from data_quality_checks_in_relational_database_spark.operators.interval import (
    overlap_pair_counts,
    overlap_pairs,
    overlap_stats,
)
from data_quality_checks_in_relational_database_spark.operators.text import frequent_ngrams


# ---------------------------------------------------------------------------
# overlap_pairs
# ---------------------------------------------------------------------------


def _brute_overlaps(rows):
    """Reference: all same-key overlapping closed-interval pairs."""
    out = set()
    for (k1, i1, s1, e1), (k2, i2, s2, e2) in itertools.combinations(rows, 2):
        if k1 == k2 and s1 <= e2 and s2 <= e1:
            a, b = sorted((i1, i2))
            out.add((k1, a, b, min(e1, e2) - max(s1, s2)))
    return out


def test_overlap_pairs_boundary_and_exactly_once(spark):
    rows = [
        # key 1: chain with endpoint touches and containment
        (1, 10, 0, 10),
        (1, 11, 10, 20),   # touches row 10 at exactly one point -> overlap 0
        (1, 12, 21, 30),   # gap of 1 from row 11 -> NO overlap
        (1, 13, 0, 30),    # long interval spanning many buckets
        # key 2: identical intervals
        (2, 20, 5, 7),
        (2, 21, 5, 7),
        # key 3: lone interval -> no self pair
        (3, 30, 0, 100),
    ]
    df = spark.createDataFrame(rows, "k int, rid int, s int, e int")
    for width in (1, 3, 7, 64):
        got = {
            (r.k, r.id_a, r.id_b, r.overlap_amount)
            for r in overlap_pairs(df, "k", "s", "e", "rid", width).collect()
        }
        assert got == _brute_overlaps(rows), f"bucket_width={width}"


def test_overlap_pairs_no_duplicate_emission(spark):
    # two long co-extensive intervals cover MANY shared buckets; the
    # overlap-start-bucket rule must still emit the pair exactly once
    rows = [(1, 1, 0, 1000), (1, 2, 0, 1000)]
    df = spark.createDataFrame(rows, "k int, rid int, s int, e int")
    out = overlap_pairs(df, "k", "s", "e", "rid", 10).collect()
    assert len(out) == 1
    assert out[0].overlap_amount == 1000


def test_overlap_pair_counts(spark):
    rows = [(1, 1, 0, 5), (1, 2, 3, 8), (1, 3, 4, 9), (2, 4, 0, 1)]
    df = spark.createDataFrame(rows, "k int, rid int, s int, e int")
    got = {
        (r.k, r.n_overlapping_pairs, r.total_overlap)
        for r in overlap_pair_counts(df, "k", "s", "e", "rid", 4).collect()
    }
    # pairs: (1,2) overlap 5-3=2, (1,3) overlap 5-4=1, (2,3) overlap 8-4=4
    assert got == {(1, 3, 7)}


def test_overlap_stats_equals_pair_join(spark):
    # adversarial layout: heavy stacking (many intervals over one
    # point), point intervals (s == e), exact endpoint touches, and a
    # sparse far-away cluster — the sweep-line must agree with the
    # pair-materializing form on both count and total mass
    rows = [
        (1, i, 10 * i, 10 * i + 95) for i in range(12)  # staircase, deep overlap
    ] + [
        (1, 100, 50, 50),      # point interval inside the stack
        (1, 101, 145, 150),    # touches staircase tail
        (2, 200, 0, 0),
        (2, 201, 0, 0),        # identical point intervals -> 1 pair, mass 0
        (3, 300, 1000, 2000),  # lone -> no output row
    ]
    df = spark.createDataFrame(rows, "k int, rid int, s int, e int")
    via_pairs = sorted(
        tuple(r) for r in overlap_pair_counts(df, "k", "s", "e", "rid", 16).collect()
    )
    via_sweep = sorted(tuple(r) for r in overlap_stats(df, "k", "s", "e").collect())
    assert via_sweep == via_pairs
    # spot-check the point-interval key
    assert (2, 1, 0) in via_sweep


def test_overlap_stats_brute_force(spark):
    rows = [(1, i, (7 * i) % 40, (7 * i) % 40 + (3 * i) % 25) for i in range(30)]
    df = spark.createDataFrame(rows, "k int, rid int, s int, e int")
    n_pairs = tot = 0
    for (_, _, s1, e1), (_, _, s2, e2) in itertools.combinations(rows, 2):
        if s1 <= e2 and s2 <= e1:
            n_pairs += 1
            tot += min(e1, e2) - max(s1, s2)
    [r] = overlap_stats(df, "k", "s", "e").collect()
    assert (r.n_overlapping_pairs, r.total_overlap) == (n_pairs, tot)


# ---------------------------------------------------------------------------
# cross_source_overlap
# ---------------------------------------------------------------------------


def test_cross_source_overlap_counts_distinct_shared_shingles(spark):
    docs = spark.createDataFrame(
        [
            # srcA and srcB share exactly the shingle "a b c"
            (1, "A", "a b c x"),       # shingles: "a b c", "b c x"
            (2, "B", "a b c y"),       # shingles: "a b c", "b c y"
            (3, "B", "a b c"),         # duplicate shingle within B -> counted once
            # srcC shares nothing
            (4, "C", "p q r"),
            # short doc contributes no shingles
            (5, "C", "one two"),
        ],
        "doc_id long, source string, text string",
    )
    got = {
        (r.source_a, r.source_b, r.n_shared_shingles)
        for r in cross_source_overlap(docs).collect()
    }
    assert got == {("A", "B", 1)}


# ---------------------------------------------------------------------------
# quality_representatives
# ---------------------------------------------------------------------------


def test_quality_representatives_argmax_and_ties(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_id_a long, doc_id_b long"
    )
    quality = spark.createDataFrame(
        # cluster {1,2,3}: doc 2 wins on quality
        # cluster {10,11}: tie -> min id 10 wins
        [(1, 5), (2, 9), (3, 7), (10, 4), (11, 4)], "doc_id long, quality long"
    )
    rows = {r.doc_id: r for r in quality_representatives(pairs, quality).collect()}
    assert len(rows) == 5
    assert [rows[i].is_representative for i in (1, 2, 3)] == [False, True, False]
    assert [rows[i].is_representative for i in (10, 11)] == [True, False]
    assert all(rows[i].cluster_size == 3 for i in (1, 2, 3))
    assert all(rows[i].cluster_id == 1 for i in (1, 2, 3))
    assert all(rows[i].cluster_size == 2 for i in (10, 11))


# ---------------------------------------------------------------------------
# frequent_ngrams
# ---------------------------------------------------------------------------


def test_frequent_ngrams_doc_frequency_and_tie_rank(spark):
    boiler = "all rights reserved by the site"  # 2 distinct 5-grams
    docs = spark.createDataFrame(
        [
            (1, boiler + " extra unique words here one"),
            (2, boiler + " different tail for doc two"),
            (3, boiler),
            (4, "totally unrelated words making one gram"),
        ],
        "doc_id long, text string",
    )
    out = frequent_ngrams(docs, n=5, top_k=3).collect()
    assert [r.rank for r in out] == [1, 2, 3]
    # both boilerplate 5-grams appear in 3 docs; tie broken by gram ASC
    assert out[0].gram == "all rights reserved by the"
    assert out[0].doc_freq == 3
    assert out[1].gram == "rights reserved by the site"
    assert out[1].doc_freq == 3
    assert out[2].doc_freq == 1  # some singleton gram fills rank 3


def test_frequent_ngrams_repeat_within_doc_counts_once(spark):
    docs = spark.createDataFrame(
        [(1, "x y z w v " * 10), (2, "a b c d e")],
        "doc_id long, text string",
    )
    out = {r.gram: r.doc_freq for r in frequent_ngrams(docs, n=5, top_k=50).collect()}
    # "x y z w v" repeats 10x inside doc 1 but doc_freq counts documents
    assert out["x y z w v"] == 1


# ---------------------------------------------------------------------------
# join_explosion_report
# ---------------------------------------------------------------------------


def test_join_explosion_flags_hot_keys_only(spark):
    from data_quality_checks_in_relational_database_spark.operators.skew import (
        join_explosion_report,
    )

    left = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 1 + [("d",)] * 10, "k string"
    )
    right = spark.createDataFrame(
        [("a",)] * 2 + [("b",)] * 1 + [("c",)] * 50, "k string"
    )
    got = {
        (r.k, r.left_rows, r.right_rows, r.product)
        for r in join_explosion_report(left, right, ["k"], threshold=5).collect()
    }
    # a: 3*2=6 >= 5 flagged; b: 1 no; c/d: key absent on one side -> no join output
    assert got == {("a", 3, 2, 6)}


# ---------------------------------------------------------------------------
# pmi_collocations
# ---------------------------------------------------------------------------


def test_pmi_collocations_ranks_collocation_first(spark):
    import math

    from data_quality_checks_in_relational_database_spark.operators.text import (
        pmi_collocations,
    )

    # "strong coffee" always co-occurs; "the" is everywhere, so
    # "the strong" has low PMI despite equal count
    docs = spark.createDataFrame(
        [(i, "the strong coffee the house the road") for i in range(6)],
        "doc_id long, text string",
    )
    out = pmi_collocations(docs, top_k=10, min_count=5).collect()
    assert out[0].x == "strong" and out[0].y == "coffee"
    assert out[0].rank == 1
    # hand-check PMI: 7 tokens/doc x 6 docs -> N_uni=42, N_bi=36;
    # c_xy=6, c_strong=6, c_coffee=6
    expect = round(math.log(6 / 36) - math.log(6 / 42) - math.log(6 / 42), 6)
    assert abs(out[0].pmi - expect) < 1e-9
    # every pair occurs 6 times >= min_count; rare pairs impossible here
    assert all(r.pair_count == 6 for r in out)


def test_pmi_collocations_min_count_excludes_rare(spark):
    from data_quality_checks_in_relational_database_spark.operators.text import (
        pmi_collocations,
    )

    docs = spark.createDataFrame(
        [(1, "rare pair"), (2, "common duo common duo common duo common duo common duo")],
        "doc_id long, text string",
    )
    out = pmi_collocations(docs, top_k=10, min_count=5).collect()
    assert all((r.x, r.y) != ("rare", "pair") for r in out)
    assert any((r.x, r.y) == ("common", "duo") for r in out)


# ---------------------------------------------------------------------------
# ppl_buckets (registered-query semantics via the registry)
# ---------------------------------------------------------------------------


def test_ppl_buckets_orders_head_to_tail_by_rarity(spark, tmp_path):
    import shutil

    # head = common-word doc, tail = rare-gibberish doc; thresholds are
    # exact interpolated tertiles of the three scores
    docs = spark.createDataFrame(
        [
            (1, "A", "the the the the the the"),
            (2, "A", "the the the zq pf kx"),
            (3, "A", "zq pf kx wv jj qq"),
        ],
        "doc_id long, source string, text string",
    )
    sf = str(tmp_path / "sf")
    docs.write.parquet(f"{sf}/documents.parquet")
    from data_quality_checks_in_relational_database_spark.plans.extension_queries import q_ppl_buckets

    out = {r.bucket: r for r in q_ppl_buckets(spark, sf).collect()}
    assert set(out) == {"head", "middle", "tail"}
    assert out["head"].n_docs == out["middle"].n_docs == out["tail"].n_docs == 1
    assert (
        out["head"].mean_logprob > out["middle"].mean_logprob > out["tail"].mean_logprob
    )
    shutil.rmtree(sf, ignore_errors=True)


# ---------------------------------------------------------------------------
# categorical_drift (JS divergence)
# ---------------------------------------------------------------------------


def test_categorical_drift_properties(spark):
    import math

    from data_quality_checks_in_relational_database_spark.operators.diff import (
        categorical_drift,
    )

    a = spark.createDataFrame([("x",)] * 6 + [("y",)] * 2, "c string")
    b = spark.createDataFrame([("x",)] * 2 + [("z",)] * 2, "c string")
    rows = {r.category: r for r in categorical_drift(a, b, "c").collect()}
    assert set(rows) == {"x", "y", "z"}
    # one-sided categories get a finite term: share * ln(2) / 2
    # (y: base share 2/8 = 0.25; z: curr share 2/4 = 0.5)
    assert rows["y"].curr_n == 0 and rows["z"].base_n == 0
    assert abs(rows["y"].js_term - round(0.25 * math.log(2) / 2, 6)) < 1e-9
    assert abs(rows["z"].js_term - round(0.5 * math.log(2) / 2, 6)) < 1e-9
    # hand-check x: p=0.75, q=0.5, m=0.625
    px, qx, mx = 0.75, 0.5, 0.625
    expect = round((px * math.log(px / mx) + qx * math.log(qx / mx)) / 2, 6)
    assert abs(rows["x"].js_term - expect) < 1e-9
    # total JS bounded by ln 2
    total = sum(r.js_term for r in rows.values())
    assert 0 < total <= math.log(2)


def test_categorical_drift_identical_is_zero(spark):
    from data_quality_checks_in_relational_database_spark.operators.diff import (
        categorical_drift,
    )

    a = spark.createDataFrame([("x",)] * 3 + [("y",)] * 7, "c string")
    out = categorical_drift(a, a, "c").collect()
    assert all(r.js_term == 0.0 for r in out)
    assert all(r.base_share == r.curr_share for r in out)


# ---------------------------------------------------------------------------
# global_row_index
# ---------------------------------------------------------------------------


def test_global_row_index_contiguous_and_layout_independent(spark):
    from data_quality_checks_in_relational_database_spark.operators.sampling import (
        global_row_index,
    )

    rows = [(i, (i * 37) % 101) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long")
    expected = {
        rid: i + 1
        for i, (rid, _) in enumerate(sorted(rows, key=lambda r: (r[1], r[0])))
    }
    for layout in (df, df.repartition(13), df.coalesce(1)):
        out = {r.id: r.row_idx for r in global_row_index(layout, ["v", "id"]).collect()}
        assert out == expected
        spark.catalog.clearCache()


# ---------------------------------------------------------------------------
# overlap_join / point_in_interval_join (two-table forms)
# ---------------------------------------------------------------------------


def test_overlap_join_matches_brute_force(spark):
    from data_quality_checks_in_relational_database_spark.operators.interval import overlap_join

    lrows = [(1, 10, 0, 9), (1, 11, 20, 30), (2, 12, 5, 5)]
    rrows = [(1, 50, 9, 19), (1, 51, 31, 40), (2, 52, 0, 5), (3, 53, 0, 100)]
    left = spark.createDataFrame(lrows, "k int, id int, s int, e int")
    right = spark.createDataFrame(rrows, "k int, id int, s int, e int")
    expect = set()
    for (k1, i1, s1, e1) in lrows:
        for (k2, i2, s2, e2) in rrows:
            if k1 == k2 and s1 <= e2 and s2 <= e1:
                expect.add((k1, i1, i2, min(e1, e2) - max(s1, s2)))
    for width in (1, 4, 64):
        got = {
            (r.k, r.left_id, r.right_id, r.overlap_amount)
            for r in overlap_join(left, right, "k", width).collect()
        }
        assert got == expect, f"width={width}"
    # sanity: endpoint touch (10 vs 50 at t=9) and point-interval hit present
    assert (1, 10, 50, 0) in expect and (2, 12, 52, 0) in expect


def test_point_in_interval_join(spark):
    from data_quality_checks_in_relational_database_spark.operators.interval import (
        point_in_interval_join,
    )

    pts = spark.createDataFrame(
        [(1, 100, 5), (1, 101, 10), (1, 102, 99), (2, 103, 5)],
        "k int, id int, t int",
    )
    iv = spark.createDataFrame(
        [(1, 200, 0, 10), (1, 201, 10, 20), (2, 202, 6, 9)],
        "k int, id int, s int, e int",
    )
    got = {
        (r.k, r.point_id, r.interval_id, r.offset)
        for r in point_in_interval_join(pts, iv, "k", 4).collect()
    }
    # point 101 at t=10 sits on BOTH intervals' shared endpoint
    assert got == {(1, 100, 200, 5), (1, 101, 200, 10), (1, 101, 201, 0)}


# ---------------------------------------------------------------------------
# mutual_information / suggest_rules
# ---------------------------------------------------------------------------


def test_mutual_information_extremes(spark):
    import math

    from data_quality_checks_in_relational_database_spark.operators.profile import (
        mutual_information,
    )

    # perfectly dependent: b == a -> MI = H(a) = ln 2 for a uniform binary
    dep = spark.createDataFrame(
        [("x", "x")] * 5 + [("y", "y")] * 5, "a string, b string"
    )
    total = sum(r.mi_term for r in mutual_information(dep, "a", "b").collect())
    assert abs(total - math.log(2)) < 1e-5
    # independent uniform: MI = 0 (every cell equally likely)
    ind = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "pq" for _ in range(3)], "a string, b string"
    )
    total = sum(r.mi_term for r in mutual_information(ind, "a", "b").collect())
    assert abs(total) < 1e-5


def test_suggest_rules_crafted(spark):
    from data_quality_checks_in_relational_database_spark.operators.rules import suggest_rules

    df = spark.createDataFrame(
        [
            (1, "a", None, 1.5),
            (2, "b", "m", 2.5),
            (3, "a", "m", -0.25),
        ],
        "id long, status string, flaky string, amount double",
    )
    got = {(r.column, r.rule): r.param for r in suggest_rules(df, ["id", "status", "flaky", "amount"]).collect()}
    assert got[("id", "not_null")] == ""
    assert got[("id", "unique")] == ""
    assert got[("id", "accepted_values")] == "1|2|3"
    assert got[("id", "numeric_range")] == "1000000..3000000"
    assert got[("status", "accepted_values")] == "a|b"
    assert ("status", "unique") not in got          # duplicate 'a'
    assert ("flaky", "not_null") not in got         # has a NULL
    assert got[("flaky", "accepted_values")] == "m"
    assert got[("amount", "numeric_range")] == "-250000..2500000"
    assert ("status", "numeric_range") not in got   # non-numeric


# ---------------------------------------------------------------------------
# pattern_profile
# ---------------------------------------------------------------------------


def test_pattern_profile_shapes_and_ranks(spark):
    from data_quality_checks_in_relational_database_spark.operators.profile import (
        pattern_profile,
    )

    df = spark.createDataFrame(
        [
            ("2024-01-02", "AB-12"),
            ("2024-13-01", "cd_34"),
            ("03/04/2024", None),      # second date format + NULL excluded
            ("2024-05-06", "AB-99"),
        ],
        "d string, code string",
    )
    out = {(r.column, r.shape): (r.n, r.rank) for r in pattern_profile(df, ["d", "code"]).collect()}
    assert out[("d", "9999-99-99")] == (3, 1)
    assert out[("d", "99/99/9999")] == (1, 2)
    assert out[("code", "AA-99")] == (2, 1)
    assert out[("code", "aa_99")] == (1, 2)


# ---------------------------------------------------------------------------
# jl_project
# ---------------------------------------------------------------------------


def test_jl_project_preserves_norms_roughly(spark):
    import math
    import random

    from data_quality_checks_in_relational_database_spark.operators.similarity import (
        jl_project,
        jl_signs,
    )

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = jl_project(df, in_dim=64, out_dim=16).collect()
    assert len(out) == 40 * 16
    by_id = {}
    for r in out:
        by_id.setdefault(r.vec_id, {})[r.dim] = r.value
    # JL norm preservation: E[||proj||^2] = ||x||^2; check mean ratio
    ratios = []
    for i, v in rows:
        pn = sum(x * x for x in by_id[i].values())
        vn = sum(x * x for x in v)
        ratios.append(pn / vn)
    mean = sum(ratios) / len(ratios)
    assert 0.7 < mean < 1.3
    # python replay of one output cell (left-to-right fold, same signs)
    signs = jl_signs(64, 16)
    acc = 0.0
    for x, s in zip(rows[0][1], signs[3]):
        acc += x * s
    assert abs(by_id[0][3] - round(acc / math.sqrt(16.0), 6)) < 1e-12


# ---------------------------------------------------------------------------
# cdc_compact
# ---------------------------------------------------------------------------


def test_cdc_compact_latest_wins_and_deletes_drop(spark):
    from data_quality_checks_in_relational_database_spark.operators.diff import cdc_compact

    ops = spark.createDataFrame(
        [
            # key 1: upsert then delete -> gone
            (1, 10, 1, "upsert"),
            (1, 20, 2, "delete"),
            # key 2: delete then upsert -> survives with latest
            (2, 10, 3, "delete"),
            (2, 20, 4, "upsert"),
            # key 3: same ts, seq breaks the tie -> seq 6 wins
            (3, 10, 5, "upsert"),
            (3, 10, 6, "upsert"),
        ],
        "k long, ts long, seq long, op string",
    )
    out = {r.k: r.seq for r in cdc_compact(ops, "k", "ts", "seq", "op").collect()}
    assert out == {2: 4, 3: 6}


# ---------------------------------------------------------------------------
# top_event_paths / conversion_lag
# ---------------------------------------------------------------------------


def test_top_event_paths_per_user_distinct_and_ordering(spark):
    from data_quality_checks_in_relational_database_spark.operators.funnel import top_event_paths

    ev = spark.createDataFrame(
        [
            # user 1 repeats the loop twice -> path counts ONCE for them
            (1, 10, 1, "a"), (1, 20, 2, "b"), (1, 30, 3, "c"),
            (1, 40, 4, "a"), (1, 50, 5, "b"), (1, 60, 6, "c"),
            # user 2 walks it once; same-ts tie broken by event_id
            (2, 10, 7, "a"), (2, 20, 8, "b"), (2, 20, 9, "c"),
            # user 3 different path
            (3, 10, 10, "x"), (3, 20, 11, "y"), (3, 30, 12, "z"),
        ],
        "user_id long, ts long, event_id long, event_type string",
    )
    out = {r.path: (r.n_users, r.rank) for r in
           top_event_paths(ev, "user_id", "ts", "event_id", "event_type").collect()}
    assert out["a b c"] == (2, 1)
    assert out["x y z"][0] == 1


def test_conversion_lag_at_or_after_and_unconverted(spark):
    from data_quality_checks_in_relational_database_spark.operators.funnel import conversion_lag

    ev = spark.createDataFrame(
        [
            # user 1: purchase BEFORE signup is ignored; later one counts
            (1, 100, "purchase"), (1, 200, "signup"), (1, 500, "purchase"),
            # user 2: signup, never purchases -> starts but not converted
            (2, 100, "signup"),
            # user 3: purchase only -> not a starter
            (3, 100, "purchase"),
        ],
        "user_id long, ts long, event_type string",
    ).withColumn("ts", F.timestamp_seconds(F.col("ts")))
    [r] = conversion_lag(ev, "user_id", "ts", "event_type", "signup", "purchase").collect()
    assert (r.n_start, r.n_converted) == (2, 1)
    assert r.min_lag_s == r.max_lag_s == 300


# ---------------------------------------------------------------------------
# rule tolerance thresholds
# ---------------------------------------------------------------------------


def test_rule_tolerance_threshold(spark):
    from data_quality_checks_in_relational_database_spark.operators.rules import (
        evaluate_rules,
        not_null,
        with_tolerance,
    )

    df = spark.createDataFrame(
        [(i, "x" if i != 0 else None) for i in range(10)], "id long, v string"
    )
    base = not_null("t", "v")
    rules = [base, with_tolerance(base, 0.2), with_tolerance(base, 0.05)]
    report = {r.rule_name: r for r in evaluate_rules({"t": df}, rules).collect()}
    # 1/10 rows violate: strict fails, 20% ceiling passes, 5% fails
    assert report["t.v.not_null"].passed is False
    assert report["t.v.not_null.tol_0.2"].passed is True
    assert report["t.v.not_null.tol_0.05"].passed is False
    assert all(r.n_violations == 1 for r in report.values())
