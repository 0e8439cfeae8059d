"""Distributed dense linear algebra over embedding columns: Gramian /
covariance aggregation and PCA (fit + project).

No counterpart in the reference (flat tabular checks only); this is a
training-data-pipeline extension: PCA whitening/compression of
embedding columns is standard before clustering or ANN indexing
(e.g. the dimensionality-reduction step in SemDeDup-style pipelines).

Scale design — the MLlib ``computeGramianMatrix`` shape, kept in the
DataFrame/Arrow world:

- The only full-data pass is an Arrow-batched ``mapInPandas`` that
  reduces each batch to a PARTIAL (count, sum-vector, X^T X) — one
  d·(d+2)-value row per batch, a d×d numpy matmul per batch (BLAS).
  For n rows in B batches the shuffle carries B·d² doubles, never
  n·d²; at d=64 that is 4 KB per batch regardless of corpus size.
- Partials combine by an exploded-index keyed SUM (map-side partial
  aggregation applies), so the merge is associative and cluster-wide.
- Everything past the combine is O(d²) — covariance assembly stays
  distributed (broadcast mean joins); only ``pca_fit`` pulls the d×d
  matrix to the driver for ``numpy.linalg.eigh`` (bounded: d ≤ a few
  thousand by contract, documented below), exactly where MLlib's
  RowMatrix.computePrincipalComponents does the same.
- ``pca_project`` ships the (k×d) component matrix to executors via
  closure capture (small by the same bound) and projects batch-wise
  with one matmul per Arrow batch.

Determinism: partial sums are doubles, so combine order perturbs the
last ulp; every user-facing value is rounded (default 6 dp) and the
eigenvector sign is fixed (largest-|component| coordinate made
positive) so repeated fits are identical.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_partials(df: DataFrame, vec_col: str) -> DataFrame:
    """One row per Arrow batch: (n, s, xx) partials of the Gramian."""
    import numpy as np

    out_schema = "n long, s array<double>, xx array<double>"

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = pdf[vec_col].dropna()
            if vecs.empty:
                continue
            x = np.asarray([np.asarray(v, dtype="float64") for v in vecs])
            yield pd.DataFrame(
                {
                    "n": [int(x.shape[0])],
                    "s": [x.sum(axis=0).tolist()],
                    "xx": [(x.T @ x).ravel().tolist()],
                }
            )

    return df.select(vec_col).mapInPandas(emit, schema=out_schema)


def gram_stats(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Combined Gramian statistics as three tiny frames in one:
    returns a single-row DataFrame ``(n, s, xx)`` where ``s`` is the
    per-dimension sum (length d) and ``xx`` the row-major X^T X
    (length d²). The combine explodes partials to (idx, val) pairs so
    the SUM is keyed/associative (map-side combine) rather than a
    single-task array fold."""
    parts = _gram_partials(df, vec_col)
    # same pin as covariance_long: three consumers, one Arrow pass.
    # No eager fill, deliberately (r9, ADVICE follow-up): the consumers
    # are independent leaf stages in one action, so on first execution
    # they CAN race the cold cache and duplicate the Arrow pass — the
    # inputs are deterministic, so that race is perf-only, and the r9
    # interleaved A/B measured the eager fill a wash locally (medians
    # 1.106 vs 1.088 s on embedding_covariance at sf0.1; identical
    # mins): the duplicated pass runs in otherwise-idle task slots,
    # while an eager count() serializes the query on a barrier. Same
    # verdict as corpus_clean/skew_split_join; revisit with a
    # cluster-scale measurement.
    from pyspark import StorageLevel

    parts = parts.persist(StorageLevel.MEMORY_AND_DISK)
    n_row = parts.agg(F.sum("n").alias("n"))
    s_sum = (
        parts.select(F.posexplode("s").alias("idx", "val"))
        .groupBy("idx")
        .agg(F.sum("val").alias("val"))
    )
    xx_sum = (
        parts.select(F.posexplode("xx").alias("idx", "val"))
        .groupBy("idx")
        .agg(F.sum("val").alias("val"))
    )
    s_arr = s_sum.agg(
        F.array_sort(
            F.collect_list(F.struct("idx", "val"))
        ).alias("p")
    ).select(F.transform("p", lambda st: st["val"]).alias("s"))
    xx_arr = xx_sum.agg(
        F.array_sort(F.collect_list(F.struct("idx", "val"))).alias("p")
    ).select(F.transform("p", lambda st: st["val"]).alias("xx"))
    return n_row.crossJoin(F.broadcast(s_arr)).crossJoin(F.broadcast(xx_arr))


def covariance_long(
    df: DataFrame, vec_col: str = "embedding", prec: int = 6
) -> DataFrame:
    """Population covariance matrix in long form: ``(i, j, cov)`` with
    1-indexed dimensions — COVAR_POP(x_i, x_j) over the corpus. Stays
    distributed end-to-end: the d² Gramian rows broadcast-join the
    d-row mean vector; no driver collect anywhere."""
    parts = _gram_partials(df, vec_col)
    # parts feeds FOUR subtrees (row total, Gramian sums, mean sums,
    # the 1-row dim probe); unpinned, each re-ran the whole-corpus
    # Arrow pass (r8 before-plan: 5 ArrowEvalPython nodes). The frame
    # is B·(d²+d+1) doubles (B = Arrow batches) — bounded by batch
    # count, not corpus size — so pin it once. No eager fill: the
    # first-execution cold-cache race between the leaf stages is
    # perf-only (deterministic inputs) and an eager count() measured a
    # wash at sf0.1 (see gram_stats) — the pin's job is steady-state
    # reuse, not first-touch serialization.
    from pyspark import StorageLevel

    parts = parts.persist(StorageLevel.MEMORY_AND_DISK)
    n_df = parts.agg(F.sum("n").alias("n_rows"))
    xx = (
        parts.select(F.posexplode("xx").alias("idx", "val"))
        .groupBy("idx")
        .agg(F.sum("val").alias("xx"))
    )
    s = (
        parts.select(F.posexplode("s").alias("i0", "sv"))
        .groupBy("i0")
        .agg(F.sum("sv").alias("sv"))
    )
    # d is bounded (an array column's width); read it from one partial
    dim_df = parts.select(F.size("s").alias("d")).limit(1)
    withdim = xx.crossJoin(F.broadcast(dim_df)).crossJoin(F.broadcast(n_df))
    ij = withdim.select(
        (F.col("idx") / F.col("d")).cast("long").alias("i0"),
        (F.col("idx") % F.col("d")).alias("j0"),
        "xx",
        "n_rows",
    )
    mean = s.select("i0", (F.col("sv")).alias("sv"))
    out = (
        ij.join(F.broadcast(mean), "i0")
        .join(
            F.broadcast(mean.select(F.col("i0").alias("j0"), F.col("sv").alias("svj"))),
            "j0",
        )
        .select(
            (F.col("i0") + 1).alias("i"),
            (F.col("j0") + 1).alias("j"),
            # + 0.0 canonicalizes IEEE negative zero (round can emit
            # -0.0 here and the differential gate compares exact reprs)
            (
                F.round(
                    F.col("xx") / F.col("n_rows")
                    - (F.col("sv") / F.col("n_rows"))
                    * (F.col("svj") / F.col("n_rows")),
                    prec,
                )
                + F.lit(0.0)
            ).alias("cov"),
        )
    )
    return out


def pca_fit(
    df: DataFrame, vec_col: str = "embedding", k: int = 8
) -> tuple["object", "object", "object"]:
    """Fit PCA: returns ``(mean, components, eigenvalues)`` as numpy
    arrays — mean (d,), components (k, d) row-orthonormal, eigenvalues
    (k,) descending. The ONLY driver materialization is the d×d
    covariance matrix (bounded by the embedding width, not the corpus;
    d=4096 is 128 MB — fine, the corpus never moves). Eigenvector sign
    is fixed deterministically (largest-|coeff| coordinate positive)."""
    import numpy as np

    row = gram_stats(df, vec_col).collect()[0]  # 1 row, d²+d+1 doubles: bounded
    n = row["n"]
    s = np.asarray(row["s"])
    xx = np.asarray(row["xx"])
    d = s.shape[0]
    mean = s / n
    cov = xx.reshape(d, d) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    evals = evals[order]
    # deterministic sign: flip each component so its largest-|x| entry
    # is positive (ties broken by lowest index via argmax)
    for r in range(comps.shape[0]):
        pivot = np.argmax(np.abs(comps[r]))
        if comps[r, pivot] < 0:
            comps[r] = -comps[r]
    return mean, comps, evals


def pca_project(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    out_col: str = "proj",
    mean=None,
    components=None,
) -> DataFrame:
    """Project every row onto the top-k principal axes; all non-vector
    columns pass through. Fit is reused when (mean, components) are
    given (train-once / apply-many). The component matrix rides the
    task closure (k·d doubles — bounded), projection is one BLAS
    matmul per Arrow batch."""
    import numpy as np

    if mean is None or components is None:
        mean, components, _ = pca_fit(df, vec_col, k)
    mu = np.asarray(mean, dtype="float64")
    w = np.asarray(components, dtype="float64")  # (k, d)

    passthrough = [f.name for f in df.schema.fields if f.name != vec_col]
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != vec_col
    )
    out_schema = (fields + ", " if fields else "") + f"{out_col} array<double>"

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.asarray(
                [np.asarray(v, dtype="float64") for v in pdf[vec_col]]
            )
            proj = (x - mu) @ w.T
            out = pdf[passthrough].copy()
            out[out_col] = [p.tolist() for p in proj]
            yield out

    return df.mapInPandas(emit, schema=out_schema)


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    iters: int = 4,
):
    """Lloyd's k-means with a deterministic contract: centroids
    initialize to the vectors of the ``k`` smallest ids (TakeOrdered —
    no global sort) and exactly ``iters`` update rounds run — no
    convergence test, so the differential oracle can replay the
    identical recurrence. Returns the (k, d) centroid numpy array.

    Scale shape per round (the MLlib Lloyd shape, Arrow-side):

    - ASSIGN is map-only: the centroid matrix rides the task closure
      (k·d doubles, bounded), each Arrow batch does one BLAS distance
      matmul + argmin;
    - UPDATE reduces each batch to k partial rows (count, sum-vector)
      — never n rows — which combine by keyed sum; only the k×d
      result reaches the driver;
    - an emptied cluster keeps its previous centroid (both engines of
      the gate implement the same rule).
    """
    import numpy as np

    init_rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )  # bounded: k rows
    cents = np.asarray([np.asarray(r[vec_col], dtype="float64") for r in init_rows])

    for _ in range(iters):
        c = cents  # bind for closure

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if pdf.empty:
                    continue
                x = np.asarray(
                    [np.asarray(v, dtype="float64") for v in pdf[vec_col]]
                )
                d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
                assign = d2.argmin(axis=1)  # ties -> lowest index
                out = {"cluster": [], "n": [], "s": []}
                for ci in range(c.shape[0]):
                    mask = assign == ci
                    if mask.any():
                        out["cluster"].append(ci)
                        out["n"].append(int(mask.sum()))
                        out["s"].append(x[mask].sum(axis=0).tolist())
                yield pd.DataFrame(out)

        parts = df.select(vec_col).mapInPandas(
            partials, schema="cluster int, n long, s array<double>"
        )
        combined = (
            parts.select("cluster", "n", F.posexplode("s").alias("idx", "val"))
            .groupBy("cluster", "idx")
            .agg(F.sum("val").alias("sv"), F.sum("n").alias("nn"))
        ).collect()  # bounded: k·d rows
        new = cents.copy()  # emptied cluster keeps its centroid
        # n repeats identically on every idx row of a cluster; read it
        # from idx 0
        counts = {r["cluster"]: r["nn"] for r in combined if r["idx"] == 0}
        for r in combined:
            if counts.get(r["cluster"]):
                new[r["cluster"], r["idx"]] = r["sv"] / counts[r["cluster"]]
        cents = new
    return cents


def kmeans_assign(
    df: DataFrame,
    centroids,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    prec: int = 6,
) -> DataFrame:
    """Map-only assignment of every row to its nearest centroid (ties
    → lowest cluster index). Output: (id, cluster, dist) with the
    EUCLIDEAN distance rounded to ``prec`` (+0.0 canonicalizes any
    negative zero for the repr-exact differential gate)."""
    import numpy as np

    c = np.asarray(centroids, dtype="float64")

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.asarray([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "cluster": assign.astype("int64"),
                    "dist": np.sqrt(d2[np.arange(len(assign)), assign]),
                }
            )

    out = df.select(id_col, vec_col).mapInPandas(
        emit, schema=f"{id_col} long, cluster long, dist double"
    )
    return out.select(
        id_col, "cluster", (F.round("dist", prec) + F.lit(0.0)).alias("dist")
    )


def kmeans_silhouette(
    df: DataFrame,
    centroids,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    prec: int = 6,
) -> DataFrame:
    """Per-point SIMPLIFIED silhouette against fixed centroids:
    a = distance to the assigned (nearest) centroid, b = distance to
    the nearest OTHER centroid, s = (b - a) / max(a, b) (0 when both
    distances are 0, i.e. a point sitting exactly on two coincident
    centroids). The classic O(n^2) silhouette needs all-pairs point
    distances; the centroid form is the O(n*k) scale-path quality gate
    actually run over billion-row corpora, and it stays map-only — one
    Arrow pass, no shuffle at all, so it survives 100 TB by
    construction. Ties (a == b) yield s = 0, matching the assignment's
    lowest-index argmin.

    Output: (id, cluster, a_dist, b_dist, silhouette), every double
    rounded to ``prec`` with -0.0 canonicalized."""
    import numpy as np

    c = np.asarray(centroids, dtype="float64")

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.asarray([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            d = np.sqrt(((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2))
            assign = d.argmin(axis=1)
            rows = np.arange(len(assign))
            a = d[rows, assign]
            masked = d.copy()
            masked[rows, assign] = np.inf
            b = masked.min(axis=1)
            denom = np.maximum(a, b)
            s = np.where(denom > 0, (b - a) / denom, 0.0)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "cluster": assign.astype("int64"),
                    "a_dist": a,
                    "b_dist": b,
                    "silhouette": s,
                }
            )

    out = df.select(id_col, vec_col).mapInPandas(
        emit,
        schema=f"{id_col} long, cluster long, a_dist double, "
        "b_dist double, silhouette double",
    )
    return out.select(
        id_col,
        "cluster",
        (F.round("a_dist", prec) + F.lit(0.0)).alias("a_dist"),
        (F.round("b_dist", prec) + F.lit(0.0)).alias("b_dist"),
        (F.round("silhouette", prec) + F.lit(0.0)).alias("silhouette"),
    )
