"""Gates for the distributed Gramian/covariance/PCA kernels:
numpy-differential on the covariance (same statistic, entirely
different evaluation path), spectral properties for the PCA fit, and
an exact equivalence between distributed projection and the driver-side
numpy projection."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.operators import linalg as la


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(7)
    d = 12
    n = 400
    # anisotropic: a few dominant directions so top-k PCA is meaningful
    basis = rng.randn(d, d)
    scales = np.linspace(3.0, 0.1, d)
    x = rng.randn(n, d) @ (basis * scales)
    rows = [(i, x[i].tolist(), int(i % 3)) for i in range(n)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    ).repartition(7)
    return df, x


def test_covariance_long_matches_numpy(spark, emb):
    df, x = emb
    got = {(r["i"], r["j"]): r["cov"] for r in la.covariance_long(df).collect()}
    want = np.cov(x, rowvar=False, bias=True)
    d = x.shape[1]
    assert len(got) == d * d
    for i in range(d):
        for j in range(d):
            assert got[(i + 1, j + 1)] == pytest.approx(want[i, j], abs=2e-6)


def test_gram_stats_partials_combine(spark, emb):
    df, x = emb
    row = la.gram_stats(df).collect()[0]
    assert row["n"] == x.shape[0]
    assert np.allclose(row["s"], x.sum(axis=0))
    assert np.allclose(np.asarray(row["xx"]).reshape(x.shape[1], -1), x.T @ x)


def test_pca_fit_spectral_properties(spark, emb):
    df, x = emb
    k = 4
    mean, comps, evals = la.pca_fit(df, k=k)
    # orthonormal rows
    assert np.allclose(comps @ comps.T, np.eye(k), atol=1e-9)
    # eigenvalues descending, non-negative, and match numpy's spectrum
    assert all(evals[i] >= evals[i + 1] for i in range(k - 1))
    want = np.sort(np.linalg.eigvalsh(np.cov(x, rowvar=False, bias=True)))[::-1][:k]
    assert np.allclose(evals, want, rtol=1e-9)
    # deterministic: second fit identical bit-for-bit after sign fix
    mean2, comps2, evals2 = la.pca_fit(df, k=k)
    assert np.array_equal(comps, comps2) and np.array_equal(evals, evals2)


def test_pca_project_matches_numpy_and_diagonalizes(spark, emb):
    df, x = emb
    k = 4
    mean, comps, evals = la.pca_fit(df, k=k)
    out = la.pca_project(df, k=k, mean=mean, components=comps)
    rows = out.orderBy("vec_id").collect()
    got = np.asarray([r["proj"] for r in rows])
    want = (x - x.mean(axis=0)) @ comps.T
    assert np.allclose(got, want, atol=1e-9)
    # passthrough columns survive with values intact
    assert [r["vec_id"] for r in rows] == list(range(x.shape[0]))
    # projected covariance is diag(evals): variance concentrated as claimed
    pc = np.cov(got, rowvar=False, bias=True)
    assert np.allclose(pc, np.diag(evals), atol=1e-8)


def test_pca_project_refits_when_no_fit_given(spark, emb):
    df, x = emb
    out = la.pca_project(df, k=2)
    assert out.count() == x.shape[0]
    assert len(out.first()["proj"]) == 2


def test_covariance_skips_null_vectors(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None), (2, [3.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    got = {(r["i"], r["j"]): r["cov"] for r in la.covariance_long(df).collect()}
    want = np.cov(np.array([[1.0, 2.0], [3.0, 5.0]]), rowvar=False, bias=True)
    assert got[(1, 1)] == pytest.approx(want[0, 0])
    assert got[(1, 2)] == pytest.approx(want[0, 1])
    assert got[(2, 2)] == pytest.approx(want[1, 1])


def test_kmeans_matches_pure_python_replay(spark):
    """Lloyd replay on a tiny planted-clusters set, including the
    deterministic seeding (k smallest ids) and tie rule."""
    rng = np.random.RandomState(3)
    centers = np.array([[0.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    pts = np.vstack([c + 0.5 * rng.randn(20, 2) for c in centers])
    rows = [(i, pts[i].tolist()) for i in range(len(pts))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(5)

    cents = la.kmeans_fit(df, k=3, iters=4)

    # pure-python replay of the same recurrence
    ref = pts[:3].copy()
    for _ in range(4):
        d2 = ((pts[:, None, :] - ref[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        new = ref.copy()
        for ci in range(3):
            if (a == ci).any():
                new[ci] = pts[a == ci].mean(axis=0)
        ref = new
    assert np.allclose(cents, ref, atol=1e-9)

    got = {r["vec_id"]: r["cluster"] for r in la.kmeans_assign(df, cents).collect()}
    want = ((pts[:, None, :] - ref[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    assert got == {i: int(want[i]) for i in range(len(pts))}


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # two far points, k=2 seeded from ids 0,1 which are coincident:
    # cluster 1 (duplicate seed) immediately empties (ties go to 0)
    # and must keep its seed centroid
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = la.kmeans_fit(df, k=2, iters=2)
    assert np.allclose(cents[1], [0.0, 0.0])  # kept, not NaN
    assert not np.isnan(cents).any()
