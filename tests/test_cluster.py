"""Connected-components / cluster-resolution tests: hand-checkable
graphs including the adversarial chain shape (max diameter), plus the
pipeline property that clustering minhash pairs equals clustering
exact pairs on the smoke corpus."""

from __future__ import annotations

import pytest

from data_quality_checks_in_relational_database_spark.session import load_tables
from tests.conftest import SF_SMOKE
from data_quality_checks_in_relational_database_spark.operators.cluster import (
    connected_components,
    dedup_clusters,
    removal_list,
)


@pytest.fixture(scope="module")
def docs(spark):
    return load_tables(spark, SF_SMOKE, ("documents",))["documents"].cache()


def _pairs(spark, edges):
    return spark.createDataFrame(edges, ["doc_id_a", "doc_id_b"])


# threshold 0 forces the distributed min-label loop; the default takes
# the driver union-find fast path — both must agree on every graph
@pytest.mark.parametrize("thr", [0, 1_000_000], ids=["distributed", "unionfind"])
def test_two_components_and_isolated_edge(spark, thr):
    # {1,2,3,7} via 1-2, 2-3, 3-7 ; {10,11} ; transitivity closes 1..7
    p = _pairs(spark, [(1, 2), (2, 3), (3, 7), (10, 11)])
    got = {r["node"]: r["cluster_id"] for r in connected_components(p, driver_threshold=thr).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


@pytest.mark.parametrize("thr", [0, 1_000_000], ids=["distributed", "unionfind"])
def test_chain_converges(spark, thr):
    # worst-case diameter: a 12-node path given as reversed edges
    edges = [(i + 1, i) for i in range(11)]
    got = {r["node"]: r["cluster_id"] for r in connected_components(_pairs(spark, edges), driver_threshold=thr).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 12


def test_cluster_report_and_removal_list(spark):
    p = _pairs(spark, [(5, 9), (9, 2), (30, 40)])
    rep = dedup_clusters(p)
    rows = {r["doc_id"]: r for r in rep.collect()}
    assert rows[2]["cluster_id"] == 2 and rows[2]["is_representative"]
    assert rows[5]["cluster_id"] == 2 and not rows[5]["is_representative"]
    assert rows[9]["cluster_size"] == 3
    assert rows[30]["cluster_id"] == 30 and rows[30]["cluster_size"] == 2
    drop = {r["doc_id"] for r in removal_list(rep).collect()}
    assert drop == {5, 9, 40}


def test_nonconvergence_raises(spark):
    # distributed path only: the union-find fast path cannot fail to
    # converge, so force the loop with threshold 0
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            _pairs(spark, [(i + 1, i) for i in range(10)]), max_iter=2, driver_threshold=0
        )


def test_minhash_clusters_equal_exact_clusters(spark, docs):
    """Clustering the LSH-candidate pairs must give the same components
    as clustering the exact all-pairs output (recall 1.0 on this data —
    the same property the pair-level pin asserts, lifted to clusters)."""
    from data_quality_checks_in_relational_database_spark.operators import dedup as dd

    exact = dedup_clusters(dd.ngram_jaccard_pairs(docs, threshold=0.5))
    lsh = dedup_clusters(dd.minhash_lsh_pairs(docs, threshold=0.5))
    e = {(r["doc_id"], r["cluster_id"]) for r in exact.collect()}
    l = {(r["doc_id"], r["cluster_id"]) for r in lsh.collect()}
    assert e == l and len(e) > 0


def test_star_cc_matches_union_find_random(spark):
    """large-star/small-star must agree with the union-find ground
    truth on random graphs, cliques, and stars."""
    import random

    from data_quality_checks_in_relational_database_spark.operators.cluster import (
        connected_components_star,
    )

    rng = random.Random(7)
    edges = [(rng.randrange(120), rng.randrange(120)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    edges += [(200 + i, 200 + j) for i in range(6) for j in range(i)]  # clique
    edges += [(300, 300 + i) for i in range(1, 8)]  # star
    got = {
        r.node: r.cluster_id
        for r in connected_components_star(_pairs(spark, edges)).collect()
    }
    want = {
        r.node: r.cluster_id
        for r in connected_components(_pairs(spark, edges)).collect()
    }
    assert got == want


def test_star_cc_deep_chain_converges_fast(spark):
    """A 200-node path needs ~200 min-label rounds but must finish in
    the O(log^2 n) star budget."""
    from data_quality_checks_in_relational_database_spark.operators.cluster import (
        connected_components_star,
    )

    edges = [(i + 1, i) for i in range(199)]
    got = {
        r.node: r.cluster_id
        for r in connected_components_star(
            _pairs(spark, edges), max_iter=15
        ).collect()
    }
    assert set(got.values()) == {0}
    assert len(got) == 200
