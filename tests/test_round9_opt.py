"""Round-9 optimization pins.

Plan/semantics pins for the r9 changes: batched iterative-loop probes
(same labels/ranks, fewer probe jobs), the one-scan split-cohort
two-sample counts (row-identical to the two-filter + full-outer form,
including NULL-predicate rows), and the operator-internal persist
footprint (a bench-style sweep releases everything the pinned
operators registered).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _sweep(spark) -> None:
    """bench.py's between-query hygiene: DataFrame cache + every
    persistent RDD (operator-internal persists, localCheckpoints)."""
    spark.catalog.clearCache()
    for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        jrdd.unpersist(True)


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_pinned_operators_footprint_sweepable(spark):
    """Two pinned operators back-to-back register persistent blocks
    (that is the documented session-lifetime contract: the pins back
    the returned frame, so the operator cannot release them itself);
    one bench-style sweep must release every one of them — nothing the
    operators register survives the caller's documented hygiene."""
    from data_quality_checks_in_relational_database_spark.operators.linalg import (
        covariance_long,
    )
    from data_quality_checks_in_relational_database_spark.operators.text import (
        tfidf_cosine_pairs,
    )

    _sweep(spark)
    assert _n_persistent(spark) == 0

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta " * 3 + f"tail{i % 3}")
         for i in range(12)],
        schema="doc_id long, text string",
    )
    tfidf_cosine_pairs(docs, n=3).count()
    emb = spark.createDataFrame(
        [(i, [float(i % 5), float(i % 7), 1.0]) for i in range(40)],
        schema="id long, embedding array<double>",
    )
    covariance_long(emb).count()
    assert _n_persistent(spark) > 0  # the pins are real
    _sweep(spark)
    assert _n_persistent(spark) == 0  # and fully releasable


def test_tfidf_empty_corpus_releases_pin(spark):
    """The n_docs == 0 early return must unpersist the tf pin instead
    of leaking an empty-but-registered cache entry (r9 ADVICE fix)."""
    from data_quality_checks_in_relational_database_spark.operators.text import (
        tfidf_cosine_pairs,
    )

    _sweep(spark)
    empty = spark.createDataFrame([], schema="doc_id long, text string")
    assert tfidf_cosine_pairs(empty).count() == 0
    assert _n_persistent(spark) == 0


def test_split_two_sample_counts_equal_joined_form(spark):
    """The one-scan split-cohort counts must be row-identical to the
    two-filter + full-outer form on an adversarial frame: NULL values,
    NULL predicates (belong to NEITHER cohort), and values present on
    only one side (exact 0, not NULL, for the absent side)."""
    from data_quality_checks_in_relational_database_spark.operators.diff import (
        _two_sample_counts_joined,
        _two_sample_counts_split,
    )

    rows = [
        (1.0, True),
        (1.4, True),   # rounds into 1.0's bucket
        (2.0, False),
        (2.0, True),
        (3.0, False),  # one-sided value
        (None, True),  # NULL value dropped on both paths
        (4.0, None),   # NULL predicate: in NEITHER cohort
        (9.0, None),   # value that exists ONLY via NULL-predicate rows
    ]
    df = spark.createDataFrame(rows, schema="v double, flag boolean")
    cond = F.col("flag")
    joined = _two_sample_counts_joined(
        df.filter(cond), df.filter(~cond), "v", 0
    )
    split = _two_sample_counts_split(df, cond, "v", 0)
    assert joined.schema == split.schema
    got_j = sorted(map(tuple, joined.collect()))
    got_s = sorted(map(tuple, split.collect()))
    assert got_j == got_s
    # and the grid really dropped the NULL-predicate-only value
    assert all(r[0] != 9.0 for r in got_s)


@pytest.mark.parametrize("probe_every", [1, 3])
def test_pagerank_distributed_probe_cadence_identical(spark, probe_every):
    """Batched invariant probes must not change the distributed loop's
    output — probe_every=1 is the old per-round schedule."""
    from data_quality_checks_in_relational_database_spark.operators.graph import (
        pagerank,
    )

    edges = spark.createDataFrame(
        [("a", "b", 2.0), ("b", "c", 1.0), ("c", "a", 1.0), ("c", "d", 3.0)],
        schema="src string, dst string, w double",
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(
            edges, weight_col="w", driver_threshold=0, probe_every=probe_every
        ).collect()
    }
    want = {
        r["node"]: r["rank"]
        for r in pagerank(edges, weight_col="w").collect()  # driver path
    }
    assert got == want
    _sweep(spark)


def test_connected_components_stride_probe_identical_and_fewer_jobs(spark):
    """The warmup-then-stride convergence probing must label a deep
    chain identically to per-round probing, with strictly fewer probe
    jobs (the job-group count is the measurable artifact)."""
    from data_quality_checks_in_relational_database_spark.operators.cluster import (
        connected_components,
    )

    # deep chain (diameter 18): long enough that the stride's saved
    # probe jobs dominate the ≤stride-1 overshoot rounds' stage jobs
    # (the forced-distributed A/B measured 83 -> 69 jobs on this graph;
    # at diameter ~12 the two effects cancel exactly)
    chain = spark.createDataFrame(
        [(i + 1, i) for i in range(18)], schema="doc_id_a long, doc_id_b long"
    )
    sc = spark.sparkContext
    out, jobs = {}, {}
    for lbl, stride in (("old", 1), ("new", 4)):
        group = f"cc-cadence-{lbl}"
        sc.setJobGroup(group, group)
        out[lbl] = sorted(
            map(
                tuple,
                connected_components(
                    chain, driver_threshold=0, probe_warmup=2, probe_stride=stride
                ).collect(),
            )
        )
        jobs[lbl] = len(sc.statusTracker().getJobIdsForGroup(group))
        sc.setJobGroup(None, None)
        _sweep(spark)
    assert out["old"] == out["new"]
    assert jobs["new"] < jobs["old"], jobs


def test_nonconvergence_raise_contract_survives_stride(spark):
    """probe_stride > 1 must not weaken the raise contract: a chain
    that cannot converge within max_iter still raises (probes at
    max_iter-1 and max_iter reproduce the eager schedule's verdict)."""
    from data_quality_checks_in_relational_database_spark.operators.cluster import (
        connected_components,
    )

    chain = spark.createDataFrame(
        [(i + 1, i) for i in range(10)], schema="doc_id_a long, doc_id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            chain, max_iter=3, driver_threshold=0, probe_warmup=2, probe_stride=4
        )
    _sweep(spark)
