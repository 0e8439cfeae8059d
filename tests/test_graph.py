"""PageRank unit gates: hand-graph vs a pure-Python replay of the same
recurrence (fixed iterations, dangling redistribution), plus edge cases
the differential oracle can't reach (empty graph, pure-sink node)."""

import pytest
from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.operators.graph import pagerank


def _reference_pagerank(edges, iters=10, d=0.85):
    """Pure-Python replay of the documented recurrence.

    edges: list of (src, dst, w)."""
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    n = len(nodes)
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0.0) + w
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dang = sum(r[v] for v in nodes if v not in outw)
        contrib = {v: 0.0 for v in nodes}
        for s, t, w in edges:
            contrib[t] += r[s] * w / outw[s]
        r = {v: (1 - d) / n + d * (contrib[v] + dang / n) for v in nodes}
    return {v: round(r[v], 6) for v in nodes}


def test_pagerank_matches_reference_with_dangling(spark):
    # c is a pure sink (dangling); multi-edge a->b collapses by weight
    edges = [
        ("a", "b", 1.0),
        ("a", "b", 2.0),
        ("b", "a", 1.0),
        ("a", "c", 1.0),
        ("b", "c", 3.0),
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    got = {r["node"]: r["rank"] for r in pagerank(df, weight_col="w").collect()}
    # collapse the multi-edge the same way the operator does
    collapsed = [("a", "b", 3.0), ("b", "a", 1.0), ("a", "c", 1.0), ("b", "c", 3.0)]
    want = _reference_pagerank(collapsed)
    assert got == want
    assert abs(sum(got.values()) - 1.0) < 1e-5  # mass conserved


def test_pagerank_unweighted_defaults(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    got = {r["node"]: r["rank"] for r in pagerank(df).collect()}
    # symmetric cycle: uniform ranks
    assert got == {"a": round(1 / 3, 6), "b": round(1 / 3, 6), "c": round(1 / 3, 6)}


def test_pagerank_empty_graph(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert pagerank(df).count() == 0


def test_pagerank_null_endpoints_dropped(spark):
    df = spark.createDataFrame(
        [("a", "b", 1.0), (None, "b", 9.0), ("b", None, 9.0), ("b", "a", 1.0)],
        "src string, dst string, w double",
    )
    got = {r["node"]: r["rank"] for r in pagerank(df, weight_col="w").collect()}
    want = _reference_pagerank([("a", "b", 1.0), ("b", "a", 1.0)])
    assert got == want


def test_pagerank_distributed_path_equals_driver_path(spark):
    """driver_threshold=0 forces the iterative Spark loop; outputs must
    be identical to the small-graph driver replay (same recurrence)."""
    edges = [
        ("a", "b", 1.0),
        ("b", "a", 2.0),
        ("a", "c", 1.0),
        ("b", "c", 3.0),
        ("c", "d", 1.0),
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    fast = {r["node"]: r["rank"] for r in pagerank(df, weight_col="w").collect()}
    dist = {
        r["node"]: r["rank"]
        for r in pagerank(df, weight_col="w", driver_threshold=0).collect()
    }
    assert fast == dist


def test_triangle_counts_hand_graph(spark):
    """Triangle {1,2,3} plus pendant 4 attached to 3; duplicate and
    reversed edges collapse."""
    from data_quality_checks_in_relational_database_spark.operators.graph import triangle_counts

    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (3, 4), (4, 3), (5, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r for r in triangle_counts(df).collect()}
    assert {n: got[n]["triangles"] for n in (1, 2, 3, 4)} == {1: 1, 2: 1, 3: 1, 4: 0}
    assert {n: got[n]["degree"] for n in (1, 2, 3, 4)} == {1: 2, 2: 2, 3: 3, 4: 1}
    assert got[1]["clustering_coeff"] == 1.0  # 2*1/(2*1)
    assert got[3]["clustering_coeff"] == round(2 * 1 / (3 * 2), 6)
    assert got[4]["clustering_coeff"] is None  # degree < 2
    assert 5 not in got  # self-loop dropped entirely
