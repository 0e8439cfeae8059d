"""Semantic pins for the round-2 pipeline operators (embedding QA,
int8 quantization, KS drift, funnel, state history) — properties the
differential oracle can't express: recall vs the exact metric,
monotonicity, interval coverage."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_quality_checks_in_relational_database_spark.operators import quantize as qz
from data_quality_checks_in_relational_database_spark.plans import extension_queries as xq
from data_quality_checks_in_relational_database_spark.plans import pipeline_queries as pq
from data_quality_checks_in_relational_database_spark.session import load_tables
from tests.conftest import SF_SMOKE


def test_quantized_topk_recall_vs_exact(spark):
    """int8 quantization must preserve >= 80% of the exact cosine
    top-5 sets (64-dim random vectors; absmax int8 keeps ~9 bits of
    the metric — empirically lossless-adjacent)."""
    exact = {
        (r.query_id, r.neighbor_id)
        for r in xq.q_cosine_topk(spark, SF_SMOKE).collect()
    }
    quant = {
        (r.query_id, r.neighbor_id)
        for r in pq.q_quantized_topk(spark, SF_SMOKE).collect()
    }
    assert len(exact) > 0
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.8, f"quantized recall {recall:.2f} < 0.8"


def test_quantization_codes_bounded(spark):
    emb = load_tables(spark, SF_SMOKE, ("embeddings",))["embeddings"]
    qv = qz.quantize_vectors(emb, "embedding", "vec_id")
    bad = qv.filter(
        F.exists(F.col("qvec"), lambda x: (x > 127) | (x < -127))
    ).count()
    assert bad == 0


def test_funnel_monotone(spark):
    rows = {r.step: r.n_users for r in pq.q_funnel(spark, SF_SMOKE).collect()}
    assert rows[1] >= rows[2] >= rows[3]
    assert rows[1] > 0


def test_ks_drift_bounds(spark):
    row = pq.q_ks_drift(spark, SF_SMOKE).collect()[0]
    assert row.n_a > 0 and row.n_b > 0
    assert 0.0 <= row.ks_stat <= 1.0
    assert row.d_numer <= row.n_a * row.n_b


def test_ks_identical_distributions_zero(spark):
    orders = load_tables(spark, SF_SMOKE, ("orders",))["orders"]
    from data_quality_checks_in_relational_database_spark.operators.diff import ks_two_sample

    row = ks_two_sample(orders, orders, "o_totalprice", decimals=0).collect()[0]
    assert row.d_numer == 0
    assert row.ks_stat == 0.0


def test_state_history_covers_all_events(spark):
    """Run row counts must sum to the event count per user, and
    intervals within a user must not overlap across runs."""
    ev = load_tables(spark, SF_SMOKE, ("events",))["events"]
    hist = pq.q_state_history(spark, SF_SMOKE)
    total = hist.agg(F.sum("n_events")).collect()[0][0]
    assert total == ev.count()
    # runs are disjoint in time per user: sort by valid_from and check
    # each run starts strictly after the previous run ends (ties are
    # broken by event_id in the operator, so equal boundary timestamps
    # can only occur inside a run, not across runs of the same user)
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("valid_from_us")
    overl = (
        hist.withColumn("prev_to", F.lag("valid_to_us").over(w))
        .filter(F.col("prev_to").isNotNull() & (F.col("valid_from_us") < F.col("prev_to")))
        .count()
    )
    assert overl == 0


def test_embedding_qa_clean_corpus(spark):
    """Driver testdata embeddings are clean: no NaN, no bad dims, no
    zero vectors — the report must say so (guards against the checks
    themselves false-positive)."""
    rep = pq.q_embedding_qa(spark, SF_SMOKE)
    bad = rep.agg(
        F.sum("n_bad_dim").alias("bd"),
        F.sum("n_nan_vecs").alias("nn"),
        F.sum("n_zero_vecs").alias("nz"),
        F.sum("n_null_vecs").alias("nu"),
    ).collect()[0]
    assert (bad.bd, bad.nn, bad.nz, bad.nu) == (0, 0, 0, 0)


def test_embedding_qa_flags_dirty_vectors(spark):
    """Planted defects must each be counted exactly once."""
    from data_quality_checks_in_relational_database_spark.operators.embedding_qa import (
        embedding_qa_report,
    )

    rows = [
        (1, [1.0, 2.0, 2.0, 4.0]),      # clean, norm 5
        (2, [0.0, 0.0, 0.0, 0.0]),      # zero vector
        (3, [1.0, float("nan"), 0.0, 0.0]),  # NaN payload
        (4, [1.0, 2.0]),                # wrong dim
        (5, None),                      # null
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    rep = embedding_qa_report(df, "embedding", "label", expected_dim=4).collect()
    by = {r.label: r for r in rep}
    assert by[2].n_zero_vecs == 1 and by[2].min_norm_micro == 0
    assert by[3].n_nan_vecs == 1 and by[3].min_norm_micro is None
    assert by[4].n_bad_dim == 1
    assert by[5].n_null_vecs == 1
    assert by[1].n_zero_vecs == 0 and by[1].min_norm_micro == 5_000_000


def test_next_fit_invariants(spark):
    """Bins never exceed cap unless a single oversized doc owns the
    bin; bin ids are contiguous from 0 per stream; every doc appears
    exactly once."""
    from data_quality_checks_in_relational_database_spark.operators.packing import next_fit_bins
    from data_quality_checks_in_relational_database_spark.session import load_tables

    docs = load_tables(spark, SF_SMOKE, ("documents",))["documents"]
    packed = next_fit_bins(docs, "text", "doc_id", cap=512, n_streams=8)
    packed.cache()
    try:
        assert packed.count() == docs.count()
        assert packed.select("doc_id").distinct().count() == docs.count()
        per_bin = packed.groupBy("stream", "bin_id").agg(
            F.sum("n_tokens").alias("tot"), F.count(F.lit(1)).alias("n")
        )
        over = per_bin.filter((F.col("tot") > 512) & (F.col("n") > 1)).count()
        assert over == 0, "multi-doc bin exceeds cap"
        gaps = (
            per_bin.groupBy("stream")
            .agg(F.max("bin_id").alias("mx"), F.count(F.lit(1)).alias("nb"))
            .filter(F.col("mx") != F.col("nb") - 1)
            .count()
        )
        assert gaps == 0, "bin ids not contiguous"
    finally:
        packed.unpersist()


def test_concat_chunks_no_gaps(spark):
    """Concat-chunk offsets tile the stream exactly: each doc starts
    where the previous ended."""
    from data_quality_checks_in_relational_database_spark.operators.packing import (
        concat_chunk_plan,
    )
    from data_quality_checks_in_relational_database_spark.session import load_tables
    from pyspark.sql.window import Window

    docs = load_tables(spark, SF_SMOKE, ("documents",))["documents"]
    plan = concat_chunk_plan(docs, "text", "doc_id", cap=512, n_streams=8)
    w = Window.partitionBy("stream").orderBy("doc_id")
    bad = (
        plan.withColumn("prev_end", F.lag(F.col("start_offset") + F.col("n_tokens")).over(w))
        .filter(F.col("prev_end").isNotNull() & (F.col("start_offset") != F.col("prev_end")))
        .count()
    )
    assert bad == 0


def test_mixture_weights_sum_to_one(spark):
    rep = pq.q_mixture_weights(spark, SF_SMOKE).collect()
    assert abs(sum(r.actual_frac for r in rep) - 1.0) < 1e-4
    for r in rep:
        if r.target_frac > 0 and r.actual_frac > 0:
            assert abs(r.sample_weight - r.target_frac / r.actual_frac) < 1e-4


def test_quality_filter_reasons(spark):
    """Each planted defect trips its intended rule, in priority order."""
    from data_quality_checks_in_relational_database_spark.operators.text import quality_filter

    good = (
        "the quick brown fox jumps over a lazy dog and then it runs home "
        "to find the warm dinner waiting in a small kitchen while rain "
        "falls softly of course the evening settles and it feels calm"
    )
    rows = [
        (1, good),                                   # keep
        (2, "tiny doc"),                             # too_short
        (3, "!!! ??? *** " * 40),                    # high_punct (no stopwords either, but punct fires first)
        (4, "alpha bravo charlie delta echo foxtrot golf hotel india juliet " * 4),  # low_stopword
        (5, "the spam of spam and spam to spam in spam is it " * 10),  # high_repetition
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.keep, r.reason) for r in quality_filter(df).collect()}
    assert got[1] == (True, None)
    assert got[2] == (False, "too_short")
    assert got[3] == (False, "high_punct")
    assert got[4] == (False, "low_stopword")
    assert got[5] == (False, "high_repetition")


def test_corpus_clean_counts_consistent(spark):
    rep = {r.source: r for r in pq.q_corpus_clean(spark, SF_SMOKE).collect()}
    assert rep
    for r in rep.values():
        assert r.n_final <= r.n_kept <= r.n_docs
        assert r.final_tokens > 0


def test_standardize_zero_mean_unit_std(spark):
    """Standardized corpus must have per-dim mean ~0 and sample std ~1."""
    from data_quality_checks_in_relational_database_spark.operators.embedding_qa import (
        dim_stats,
        standardize,
    )
    from data_quality_checks_in_relational_database_spark.session import load_tables

    emb = load_tables(spark, SF_SMOKE, ("embeddings",))["embeddings"]
    z = standardize(emb, "embedding", "vec_id")
    stats = dim_stats(z, "embedding", "vec_id").collect()
    assert len(stats) == 64
    for r in stats:
        assert abs(r.mean) < 1e-4, f"dim {r.pos} mean {r.mean}"
        assert abs(r.std - 1.0) < 1e-3, f"dim {r.pos} std {r.std}"


def test_backfill_ranges_planted_gaps(spark):
    """Planted holes collapse into the right contiguous ranges."""
    from data_quality_checks_in_relational_database_spark.operators.completeness import (
        backfill_ranges,
    )

    rows = [
        ("a", "2024-01-01"), ("a", "2024-01-02"),
        # gap 03-05 (3 days)
        ("a", "2024-01-06"),
        # gap 07 (1 day)
        ("a", "2024-01-08"),
        ("b", "2024-02-01"), ("b", "2024-02-02"),  # no gaps
    ]
    df = spark.createDataFrame(rows, "series string, ts string").select(
        "series", F.to_timestamp("ts").alias("ts")
    )
    got = {
        (r.series, str(r.gap_start), str(r.gap_end), r.n_days)
        for r in backfill_ranges(df, "series", "ts").collect()
    }
    assert got == {
        ("a", "2024-01-03", "2024-01-05", 3),
        ("a", "2024-01-07", "2024-01-07", 1),
    }


def test_fk_containment_planted_orphans(spark):
    from data_quality_checks_in_relational_database_spark.operators.completeness import (
        fk_containment_report,
    )
    from pyspark.sql import functions as F

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (None,)], "k: int"
    ).select(F.col("k").alias("ck"))
    parent = spark.createDataFrame([(1,), (2,)], "k: int").select(
        F.col("k").alias("pk")
    )
    rows = fk_containment_report([("c->p", child, "ck", parent, "pk")]).collect()
    assert len(rows) == 1
    r = rows[0]
    # NULL child key excluded; distinct child keys {1,2,3}; orphan {3}
    assert (r["n_child_keys"], r["n_orphan_keys"]) == (3, 1)
    assert abs(r["containment"] - 2 / 3) < 1e-12


def test_bloom_decontam_equals_exact(spark):
    """Bloom prefilter has no false negatives and the verify join
    removes false positives: the report must EQUAL the plain
    inverted-index contamination report."""
    from data_quality_checks_in_relational_database_spark.operators.decontam import (
        bloom_contamination_report,
        contamination_report,
    )
    from data_quality_checks_in_relational_database_spark.session import load_tables
    from pyspark.sql import functions as F

    docs = load_tables(spark, "/root/testdata/sf0.001", ("documents",))["documents"]
    corpus = docs.filter(F.col("source") != "src0")
    eval_set = docs.filter(F.col("source") == "src0")
    exact = sorted(map(tuple, contamination_report(corpus, eval_set, n=5).collect()))
    bloom = sorted(
        map(tuple, bloom_contamination_report(corpus, eval_set, n=5).collect())
    )
    assert bloom == exact and len(exact) > 0


def test_ewma_control_chart_matches_python_and_flags_small_drift(spark):
    """A run of small same-direction drifts must breach the EWMA chart
    (its whole point vs one-day z-scores); values replay the textbook
    recursion exactly."""
    import math

    from data_quality_checks_in_relational_database_spark.operators.anomaly import (
        ewma_control_chart,
    )

    # stable around 100 (±2), then a persistent +6..7 shift for 10 days
    series = [100, 102, 98, 101, 99, 100, 98, 102, 99, 101,
              100, 99, 101, 100, 98, 102, 100, 99, 101, 100] + [
        106, 107, 106, 107, 106, 107, 106, 107, 106, 107]
    rows = [("s", i, float(v)) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, "key string, t long, v double")
    out = ewma_control_chart(df, ["key"], "t", "v", lam=0.2, l_sigma=3.0).orderBy("t").collect()

    mu = sum(series) / len(series)
    var = sum((x - mu) ** 2 for x in series) / (len(series) - 1)
    sig = math.sqrt(var)
    z = mu
    for i, (r, x) in enumerate(zip(out, series), start=1):
        z = 0.2 * x + 0.8 * z
        assert r.ewma == round(z, 6)
        lim = 3.0 * sig * math.sqrt(0.2 / 1.8 * (1 - 0.8 ** (2 * i)))
        assert r.limit == round(lim, 6)
        assert r.breach == (abs(z - mu) > lim)
    # the drift run is caught...
    assert any(r.breach for r in out[-4:])
    # ...and the stable head is quiet
    assert not any(r.breach for r in out[:15])
