"""Round-3 operator pins: count-min sketch properties, normalized
dedup semantics, co-occurrence lift arithmetic, and the train→encode
BPE composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.operators.cooccur import (
    cooccurrence_lift,
)
from data_quality_checks_in_relational_database_spark.operators.dedup import (
    normalize_text,
    normalized_dedup_report,
)
from data_quality_checks_in_relational_database_spark.operators.sketch import (
    cms_counters,
    cms_topk,
)


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def test_cms_never_undercounts_and_bounds(spark):
    df = spark.createDataFrame(
        [(i % 37,) for i in range(2000)] + [(999,)] * 500, "k long"
    )
    out = cms_topk(df, "k", k=50, depth=4, width=256).collect()
    assert len(out) > 0
    for r in out:
        assert r["est_count"] >= r["exact_count"]  # CMS only over-counts
        assert r["overestimate"] == r["est_count"] - r["exact_count"]
    # the planted heavy hitter must surface with its exact count intact
    top = out[0]
    assert top["key"] == "999" and top["exact_count"] == 500


def test_cms_counters_bounded_and_mergeable(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    c = cms_counters(df, "k", depth=4, width=64)
    rows = c.collect()
    assert len(rows) <= 4 * 64
    # every row's counters sum to N (each input row increments one
    # bucket per row) — the invariant cell-wise merging preserves
    per_row = {r["row"]: 0 for r in rows}
    for r in rows:
        per_row[r["row"]] += r["cnt"]
    assert set(per_row.values()) == {1000}


def test_cms_sketch_deterministic_across_partitionings(spark):
    df = spark.createDataFrame([(i % 10,) for i in range(500)], "k long")
    a = {(r["row"], r["bucket"]): r["cnt"] for r in cms_counters(df, "k").collect()}
    b = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_counters(df.repartition(13), "k").collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# normalized dedup
# ---------------------------------------------------------------------------


def test_normalize_text_canonical_form(spark):
    df = spark.createDataFrame(
        [("Hello,  World!",), ("hello world",), ("HELLO---WORLD",), ("different",)],
        "text string",
    )
    got = [r[0] for r in df.select(normalize_text(F.col("text"))).collect()]
    assert got[0] == "hello world"
    assert got[1] == "hello world"
    assert got[2] == "helloworld"  # punctuation strips; no space inserted
    assert got[3] == "different"


def test_normalized_dedup_groups_reformatted_duplicates(spark):
    df = spark.createDataFrame(
        [
            (1, "The Quick Brown Fox."),
            (2, "the quick brown fox"),
            (3, "THE  QUICK  BROWN  FOX!!!"),
            (4, "something else"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in normalized_dedup_report(df).collect()}
    assert got[1]["canonical_id"] == 1 and got[1]["is_canonical"]
    assert got[2]["canonical_id"] == 1 and not got[2]["is_canonical"]
    assert got[3]["canonical_id"] == 1 and got[3]["n_members"] == 3
    assert got[4]["canonical_id"] == 4 and got[4]["n_members"] == 1


# ---------------------------------------------------------------------------
# co-occurrence lift
# ---------------------------------------------------------------------------


def test_cooccurrence_lift_exact_values(spark):
    # 4 users: u1{a,b}, u2{a,b}, u3{a}, u4{c,b} -> n=4, a:3, b:3, c:1
    rows = [
        (1, "a"), (1, "b"), (1, "b"),  # duplicate event must not double count
        (2, "a"), (2, "b"),
        (3, "a"),
        (4, "c"), (4, "b"),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {
        (r["item_a"], r["item_b"]): r
        for r in cooccurrence_lift(df, "user_id", "event_type").collect()
    }
    ab = out[("a", "b")]
    assert ab["n_a"] == 3 and ab["n_b"] == 3 and ab["n_ab"] == 2
    assert abs(ab["lift"] - (2 * 4) / (3 * 3)) < 1e-6  # 6dp rounding
    # (b, c) co-occurs once only -> filtered by min_pair_entities=2
    assert ("b", "c") not in out


def test_cooccurrence_lift_independence_is_one(spark):
    # every user has both items -> lift exactly 1
    rows = [(u, t) for u in range(6) for t in ("x", "y")]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = cooccurrence_lift(df, "user_id", "event_type").collect()
    assert len(out) == 1 and abs(out[0]["lift"] - 1.0) < 1e-6


# ---------------------------------------------------------------------------
# BPE train -> encode composition
# ---------------------------------------------------------------------------


def test_bpe_token_budget_matches_reference(spark):
    from data_quality_checks_in_relational_database_spark.operators.tokenizer import (
        bpe_encode_counts,
        bpe_encode_reference,
        bpe_reference,
        bpe_train_merges,
    )

    texts = ["low lower lowest", "low low newer newest", "wider wide wide low"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges_df = bpe_train_merges(df, n_merges=4).orderBy("rank").collect()
    merges = [(r["left"], r["right"]) for r in merges_df]
    wf: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split():
            wf[w] = wf.get(w, 0) + 1
    assert [(m[1], m[2]) for m in bpe_reference(wf, n_merges=4)] == merges
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode_counts(df, merges).collect()
    }
    assert got == bpe_encode_reference(texts, merges)
