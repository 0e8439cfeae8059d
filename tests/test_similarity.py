"""Similarity-search tests: brute-force top-k sanity against numpy, and
ANN (random-hyperplane LSH) recall pinned against the exact baseline."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.operators import similarity as sim
from data_quality_checks_in_relational_database_spark.session import load_tables
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return load_tables(spark, SF_SMOKE, ("embeddings",))["embeddings"].cache()


def test_cosine_topk_matches_numpy(spark, emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    queries = emb.filter(F.col("vec_id") < 3)
    got = sim.cosine_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["cosine"]))
    for q in range(3):
        scores = M @ M[ids == q][0]
        scores[ids == q] = -np.inf
        # numpy reference: top-5 by (rounded score desc, id asc)
        order = sorted(
            [(round(s, 6), -i) for i, s in zip(ids, scores) if np.isfinite(s)], reverse=True
        )[:5]
        expect = [(-i, s) for s, i in order]
        got_q = [(nid, c) for _, nid, c in sorted(by_q[q])]
        assert got_q == [(nid, pytest.approx(s, abs=1e-9)) for nid, s in expect]


def test_ann_recall_vs_bruteforce(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20)
    exact = sim.cosine_topk(emb, queries, k=5).collect()
    approx = sim.ann_topk_lsh(emb, queries, k=5, n_planes=12, max_probe_hamming=4).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # random embeddings are the adversarial case for LSH; multi-probe at
    # hamming ≤ 4 of 12 bits still has to recover a solid majority
    assert recall >= 0.5, f"ANN recall {recall}"


def test_blocked_topk_equals_hof_topk(spark, emb):
    """The numpy block-matmul path must produce byte-identical output
    to the expression-fold baseline (same rounding, same tie-breaks)."""
    queries = emb.filter(F.col("vec_id") < 10)
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])  # noqa: E731
    a = sorted(map(key, sim.cosine_topk(emb, queries, k=5).collect()))
    b = sorted(map(key, sim.cosine_topk_blocked(emb, queries, k=5).collect()))
    assert a == b


def test_hyperplane_neardup_finds_planted_pair(spark):
    from data_quality_checks_in_relational_database_spark.operators.similarity import (
        hyperplane_lsh_neardup,
    )

    base = [1.0] * 8 + [0.0] * 56
    near = [0.99] * 8 + [0.015] * 56
    ortho = ([0.0] * 8 + [1.0] * 8) * 4
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, ortho)], "vec_id long, embedding array<double>"
    )
    pairs = hyperplane_lsh_neardup(df, threshold=0.95, dim=64).collect()
    assert {(r["vec_id_a"], r["vec_id_b"]) for r in pairs} == {(1, 2)}


def test_winnowing_fingerprint_properties(spark):
    from data_quality_checks_in_relational_database_spark.operators.text import (
        winnowing_fingerprint,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j k l m n o p"),
            (2, "a b c d e f g h i j k l m n o p"),  # identical → same fp set
            (3, "z y x w v u t s r q p o n m l k"),
            (4, "ab"),  # shorter than k tokens → empty fingerprint set
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r["fingerprints"] for r in winnowing_fingerprint(df).collect()}
    assert rows[1] == rows[2] and len(rows[1]) > 0
    assert rows[1] != rows[3]
    assert rows[4] == []


def test_ann_candidates_shrink(spark, emb):
    """The point of LSH: the candidate set must be much smaller than
    brute force."""
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < 5)
    c = sim.hyperplane_signatures(emb, 12, 64).select(
        F.col("vec_id").alias("nid"), F.col("signature").alias("cs")
    )
    q = sim.hyperplane_signatures(queries, 12, 64).select(
        F.col("vec_id").alias("qid"), F.col("signature").alias("qs")
    )
    cand = (
        c.join(F.broadcast(q), F.lit(True))
        .filter(F.bit_count(F.col("cs").bitwiseXOR(F.col("qs"))) <= 2)
        .count()
    )
    assert cand < 0.15 * n * 5, f"candidates {cand} vs brute {n * 5}"

def test_ivf_recall_vs_bruteforce(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20)
    exact = sim.cosine_topk(emb, queries, k=5).collect()
    approx = sim.ann_topk_ivf(emb, queries, k=5, n_cells=16, n_probe=8).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # probing 8/16 cells scores ~half the corpus; random (near-
    # orthogonal) embeddings are IVF's adversarial case, so pin a
    # floor well above the ~50% a random half would give
    assert recall >= 0.6, f"IVF recall {recall}"
    # approx results are a subset of valid scored pairs: every emitted
    # cosine must equal the exact cosine for that pair
    exact_scores = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_scores:
            assert abs(r["cosine"] - exact_scores[key]) < 1e-9


def test_ivf_centroids_deterministic(spark, emb):
    import numpy as np

    c1 = sim.train_ivf_centroids(emb, n_cells=8, seed=7)
    c2 = sim.train_ivf_centroids(emb.repartition(13), n_cells=8, seed=7)
    assert np.array_equal(c1, c2)


def test_knn_label_agreement_perfect_clusters(spark):
    """Two tight clusters labeled by cluster: every neighbor shares the
    query's label, so agreement is exactly 1.0 for both labels."""
    from data_quality_checks_in_relational_database_spark.operators.embedding_qa import (
        knn_label_agreement,
    )

    rows = []
    for i in range(4):  # cluster 0 near e_x
        rows.append((i, [10.0 + i * 0.01, 0.1 * i, 0.0, 0.0], 0))
    for i in range(4, 8):  # cluster 1 near e_z
        rows.append((i, [0.0, 0.1 * (i - 4), 10.0 + i * 0.01, 0.0], 1))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    rep = knn_label_agreement(emb, k=2, probe_mod=1)
    got = {r["label"]: r for r in rep.collect()}
    assert set(got) == {0, 1}
    for lab in (0, 1):
        assert got[lab]["n_queries"] == 4
        assert got[lab]["n_neighbors"] == 8
        assert got[lab]["n_same_label"] == 8
        assert got[lab]["agreement"] == 1.0


def test_cosine_neardup_blocked_equals_hof(spark, sf_dir_smoke=None):
    """The Arrow block-matmul all-pairs variant must emit EXACTLY the
    pairs of the expression-fold baseline (ids identical; cosines equal
    to 1e-9 — BLAS vs fold summation order)."""
    from data_quality_checks_in_relational_database_spark.operators.dedup import (
        cosine_neardup_pairs,
    )
    from data_quality_checks_in_relational_database_spark.operators.similarity import (
        cosine_neardup_blocked,
    )
    from data_quality_checks_in_relational_database_spark.session import load_tables

    emb = load_tables(spark, "/root/testdata/sf0.001", ("embeddings",))["embeddings"]
    thr = 0.35
    hof = {
        (r["vec_id_a"], r["vec_id_b"]): r["cosine"]
        for r in cosine_neardup_pairs(emb, threshold=thr).collect()
    }
    blk = {
        (r["vec_id_a"], r["vec_id_b"]): r["cosine"]
        for r in cosine_neardup_blocked(emb, threshold=thr).collect()
    }
    assert set(hof) == set(blk) and len(blk) > 0
    for k, v in blk.items():
        assert abs(v - hof[k]) < 1e-9


def test_cosine_allpairs_blockjoin_equals_blocked(spark):
    """The distributed block-pair join (no driver collect) must emit
    EXACTLY the pairs of the in-closure blocked baseline at every block
    count, including B=1 (single group) and B > n_distinct_blocks."""
    from data_quality_checks_in_relational_database_spark.operators.similarity import (
        cosine_allpairs_blockjoin,
        cosine_neardup_blocked,
    )

    emb = load_tables(spark, "/root/testdata/sf0.001", ("embeddings",))["embeddings"]
    thr = 0.35
    base = {
        (r["vec_id_a"], r["vec_id_b"]): r["cosine"]
        for r in cosine_neardup_blocked(emb, threshold=thr).collect()
    }
    assert len(base) > 0
    for nb in (1, 3, 8):
        got = {
            (r["vec_id_a"], r["vec_id_b"]): r["cosine"]
            for r in cosine_allpairs_blockjoin(
                emb, threshold=thr, num_blocks=nb
            ).collect()
        }
        assert set(got) == set(base), f"num_blocks={nb}"
        for k, v in got.items():
            assert abs(v - base[k]) < 1e-9


def test_cosine_allpairs_blockjoin_empty(spark):
    from data_quality_checks_in_relational_database_spark.operators.similarity import (
        cosine_allpairs_blockjoin,
    )

    emb = load_tables(spark, "/root/testdata/sf0.001", ("embeddings",))["embeddings"]
    assert cosine_allpairs_blockjoin(emb.filter(F.lit(False)), threshold=0.5).count() == 0
