"""Pins for the bucketed range self-join (operators/interval.py), the
blocked fuzzy linkage (operators/fuzzy.py), span-level dedup
(text.span_dedup_report), and the Benford digit extraction
(profile.benford_report). Crafted inputs pin the semantic contracts
the sf-data differential oracle cannot isolate (exact-boundary
inclusion, adjacent-bucket matching, blocking recall tradeoff, digit
edge values)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.operators.fuzzy import blocked_fuzzy_pairs
from data_quality_checks_in_relational_database_spark.operators.interval import (
    close_pair_counts,
    close_pairs,
)
from data_quality_checks_in_relational_database_spark.operators.profile import benford_report
from data_quality_checks_in_relational_database_spark.operators.text import span_dedup_report


def _ts(s: float) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


def test_close_pairs_boundary_and_buckets(spark):
    # bucket width = delta = 60 s from epoch-aligned midnight:
    # (1, 2) same bucket at exactly delta apart -> INCLUDED (<=)
    # (3, 4) adjacent buckets, 1 s apart across the boundary -> included
    # (5, 6) 61 s apart -> excluded
    # (7,)   lone row -> no self-pair
    rows = [
        (1, 10, _ts(0.0)),
        (2, 10, _ts(60.0)),  # adjacent bucket, exactly delta from row 1
        (3, 10, _ts(119.5)),
        (4, 10, _ts(120.5)),
        (5, 20, _ts(0.0)),
        (6, 20, _ts(61.0)),
        (7, 30, _ts(0.0)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        (r.id_a, r.id_b, r.delta_us)
        for r in close_pairs(df, "user_id", "ts", "event_id", 60).collect()
    }
    assert got == {
        (1, 2, 60_000_000),  # exactly delta: inclusive
        (2, 3, 59_500_000),  # 60 s -> 119.5 s, within delta
        (3, 4, 1_000_000),  # adjacent-bucket match
    }


def test_close_pairs_each_pair_once_no_dedup_needed(spark):
    # Three rows inside one bucket -> C(3,2)=3 pairs, each exactly once
    rows = [(i, 1, _ts(float(i))) for i in range(3)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    pairs = close_pairs(df, "user_id", "ts", "event_id", 300).collect()
    assert len(pairs) == 3
    assert len({(r.id_a, r.id_b) for r in pairs}) == 3
    counts = close_pair_counts(df, "user_id", "ts", "event_id", 300).collect()
    assert [(r.user_id, r.n_close_pairs) for r in counts] == [(1, 3)]


def test_close_pairs_keys_never_cross(spark):
    rows = [(1, 1, _ts(0.0)), (2, 2, _ts(1.0))]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    assert close_pairs(df, "user_id", "ts", "event_id", 60).count() == 0


def test_blocked_fuzzy_pairs_matches_and_blocking_tradeoff(spark):
    rows = [
        (1, "B1", "widget alpha red"),
        (2, "B1", "widget alpha rod"),  # dist 1 from row 1, same block
        (3, "B1", "gadget alpha red"),  # dist <= 2 from row 1, but first token differs: blocked away
        (4, "B2", "widget alpha red"),  # identical text, different brand: blocked away
        (5, "B1", "widget omega blue"),  # same block, dist > 2
    ]
    df = spark.createDataFrame(rows, "p_partkey long, p_brand string, p_name string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in blocked_fuzzy_pairs(
            df,
            text_col="p_name",
            id_col="p_partkey",
            block_cols=[F.col("p_brand"), F.split(F.col("p_name"), " ").getItem(0)],
            max_dist=2,
        ).collect()
    }
    assert got == {(1, 2, 1)}


def test_span_dedup_report_marks_shared_and_repeated_spans(spark):
    w = lambda n, tag: " ".join(f"{tag}{i}" for i in range(n))  # noqa: E731
    shared = w(4, "s")
    rows = [
        (1, shared),  # span shared with doc 2 -> dup
        (2, shared + " " + w(4, "x")),  # first span == doc 1's, second unique
        (3, w(4, "u")),  # unique single span
    ]
    # span_words=4: doc1 -> ["s0 s1 s2 s3"]; doc2 -> ["s0 s1 s2 s3", "x0 x1 x2 x3"];
    # doc3 -> ["u0 u1 u2 u3"]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    rep = {
        r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_span_fraction)
        for r in span_dedup_report(df, span_words=4).collect()
    }
    assert rep[1] == (1, 1, 1.0)
    assert rep[2] == (2, 1, 0.5)
    assert rep[3] == (1, 0, 0.0)


def test_span_dedup_counts_within_doc_repeats(spark):
    text = "a b c d a b c d"  # the same 4-token span twice in ONE doc
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = span_dedup_report(df, span_words=4).collect()[0]
    assert (r.n_spans, r.n_dup_spans) == (2, 2)


def test_benford_digit_extraction_edges(spark):
    rows = [(123.45,), (0.05,), (999.99,), (-5.0,), (0.0,), (0.001,)]
    # -5.0 and 0.0 excluded (non-positive); 0.001 scales to 0 cents -> excluded;
    # digits: 1 (12345 cents), 5 (5 cents), 9 (99999 cents)
    df = spark.createDataFrame(rows, "v double")
    rep = {r.digit: r.n for r in benford_report(df, "v").collect()}
    assert rep == {1: 1, 5: 1, 9: 1}


def test_benford_share_and_deviation(spark):
    # ten values, all first-digit 1 -> share 1.0, dev = |1000 - 301| = 699
    df = spark.createDataFrame([(float(v),) for v in range(10, 20)], "v double")
    r = benford_report(df, "v").collect()
    assert len(r) == 1
    assert (r[0].digit, r[0].n, r[0].share, r[0].expected_milli, r[0].dev_milli) == (
        1,
        10,
        1.0,
        301,
        699,
    )


def test_multi_pass_blocking_recovers_blocked_key_typo(spark):
    """A typo in pass-1's blocking key hides the pair from pass 1;
    pass 2 (different key) recovers it."""
    import pyspark.sql.functions as F
    from data_quality_checks_in_relational_database_spark.operators.fuzzy import (
        blocked_fuzzy_pairs,
        multi_pass_fuzzy_pairs,
    )

    rows = [
        (1, "acme hammer", "tools"),
        (2, "acme hammer", "tools"),   # first-token typo: acme vs acme? -> same
        (3, "zcme hammer", "tools"),   # typo IN the first token
    ]
    df = spark.createDataFrame(rows, "id long, name string, cat string")
    first_tok = [F.split(F.col("name"), " ").getItem(0)]
    by_cat = [F.col("cat")]
    single = {
        (r.id_a, r.id_b)
        for r in blocked_fuzzy_pairs(df, "name", "id", first_tok, 2).collect()
    }
    multi = {
        (r.id_a, r.id_b)
        for r in multi_pass_fuzzy_pairs(df, "name", "id", [first_tok, by_cat], 2).collect()
    }
    assert (1, 3) not in single and (2, 3) not in single  # hidden by the typo
    assert {(1, 2), (1, 3), (2, 3)} <= multi  # recovered by the category pass
