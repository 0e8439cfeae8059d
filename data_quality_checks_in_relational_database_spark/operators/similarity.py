"""Similarity search over embedding columns (array<float>).

Two tiers, per the north-star contract:

- **Brute-force cosine top-k** — the exact baseline: broadcast the
  (small) query set against the corpus, fold dot products JVM-side via
  ``zip_with``/``aggregate`` higher-order functions (no UDF, no Python
  boundary). Cost O(|corpus|·|queries|·dim) flops but embarrassingly
  parallel: each corpus partition scores independently, and top-k is a
  per-query shuffle of only k·|queries| candidate rows thanks to a
  partial per-partition cutoff via window row_number (Spark's
  WindowGroupLimit pushes the rank filter before the final sort).
- **Random-hyperplane LSH (ANN)** — the scale path: h deterministic
  hyperplanes (seeded, data-independent) give each vector an h-bit
  signature; probing compares only same-bucket (or near-bucket)
  vectors. Sub-linear candidate sets at 100 TB; recall is tunable by
  signature width / multi-probe and is pinned empirically in tests
  against the brute-force baseline.

Determinism: all float math is promoted to double and folded in array
order, so scores are bit-identical regardless of partitioning; emitted
scores are rounded to 6 decimals to absorb any cross-engine FP-reorder
in oracles, and ranking uses (rounded score, id) which is total.
"""

from __future__ import annotations

import random

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_quality_checks_in_relational_database_spark.functions.scalars import rebalance


def _unit(vec_col):
    v = vec_col.cast("array<double>")
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.transform(v, lambda x: x / norm)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cosine, rank); cosine rounded to
    6dp, rank dense over (cosine desc, neighbor_id asc).
    """
    c = rebalance(corpus).select(
        F.col(id_col).alias("neighbor_id"), _unit(F.col(vec_col)).alias("cu")
    )
    q = queries.select(F.col(id_col).alias("query_id"), _unit(F.col(vec_col)).alias("qu"))
    scored = c.join(F.broadcast(q), F.lit(True))
    if exclude_self:
        scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    dot = F.aggregate(
        F.zip_with(F.col("cu"), F.col("qu"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = scored.select("query_id", "neighbor_id", F.round(dot, 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_blocked(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors via Arrow-batched numpy matmul.

    The dense-math variant of :func:`cosine_topk` — same output
    contract, different physical strategy: the (small, bounded) query
    matrix is collected once and shipped in the closure; each corpus
    Arrow batch computes a BLAS block matmul and emits only its local
    top-k per query (≤ k·|queries| rows per batch), so the shuffle
    carries candidates, not scores. Global top-k then reduces the
    per-batch winners. 10-100× faster than per-element expression
    folds on wide embeddings — this is the scale path; the HOF variant
    stays as the dependency-free baseline.

    Bound: |queries| must fit on the driver/executors (~10⁵ × dim
    doubles). For query sets beyond that, block BOTH sides (corpus ⋈
    query-chunk cross of mapInPandas stages).
    """
    import numpy as np

    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:  # empty query set -> empty result, not a numpy axis error
        return queries.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank long"
        )
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([r[1] for r in q_rows], dtype=np.float64)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    kk = k + (1 if exclude_self else 0)

    def score(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = _np.stack(pdf[vec_col].to_numpy()).astype(_np.float64)
            C /= _np.linalg.norm(C, axis=1, keepdims=True)
            cids = pdf[id_col].to_numpy()
            S = C @ Q.T  # (batch, n_queries)
            take = min(kk, S.shape[0])
            idx = _np.argpartition(-S, take - 1, axis=0)[:take]  # per-query local top
            out = {
                "query_id": _np.repeat(qids, take),
                "neighbor_id": cids[idx].T.ravel(),
                "cosine": _np.take_along_axis(S, idx, axis=0).T.ravel(),
            }
            yield _pd.DataFrame(out)

    cand = corpus.select(id_col, vec_col).mapInPandas(
        score, schema="query_id long, neighbor_id long, cosine double"
    )
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    cand = cand.select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return cand.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


def hyperplane_signatures(
    df: DataFrame,
    n_planes: int = 16,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Append an n_planes-bit random-hyperplane signature (SRP-LSH).

    Hyperplanes are generated driver-side from a seeded RNG (tiny:
    n_planes × dim literals) and evaluated as a broadcast-free constant
    expression — every executor computes signatures map-only. P(two
    vectors at angle θ agree on one bit) = 1 − θ/π (Charikar 2002).
    """
    rng = random.Random(seed)
    planes = [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]
    v = F.col(vec_col).cast("array<double>")
    bits = []
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        dot = F.aggregate(
            F.zip_with(v, lit_plane, lambda x, y: x * y), F.lit(0.0), lambda acc, d: acc + d
        )
        bits.append(F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long"))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig.bitwiseOR(b)
    return df.select(F.col(id_col), F.col(vec_col), sig.alias("signature"))


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
    max_probe_hamming: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: compare only corpus vectors whose hyperplane
    signature is within ``max_probe_hamming`` bits of the query's
    (multi-probe LSH). Candidate set shrinks ~2^-n_planes per bucket;
    recall vs :func:`cosine_topk` is pinned in tests.
    """
    c = hyperplane_signatures(rebalance(corpus), n_planes, dim, seed, vec_col, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        _unit(F.col(vec_col)).alias("cu"),
        F.col("signature").alias("c_sig"),
    )
    q = hyperplane_signatures(queries, n_planes, dim, seed, vec_col, id_col).select(
        F.col(id_col).alias("query_id"),
        _unit(F.col(vec_col)).alias("qu"),
        F.col("signature").alias("q_sig"),
    )
    ham = F.bit_count(F.col("c_sig").bitwiseXOR(F.col("q_sig")))
    cand = (
        c.join(F.broadcast(q), F.lit(True))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .filter(ham <= max_probe_hamming)
    )
    dot = F.aggregate(
        F.zip_with(F.col("cu"), F.col("qu"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = cand.select("query_id", "neighbor_id", F.round(dot, 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


def hyperplane_lsh_neardup(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
    max_block_hamming: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding near-dup pairs at scale: block by hyperplane signature,
    verify candidates with the exact cosine.

    A pair at cosine ≥ 0.95 (angle ≤ 18°) disagrees on each hyperplane
    bit with p = θ/π ≤ 0.1, so its signatures differ by ~Binomial(12,
    0.1) bits — blocking on exact-or-1-bit-off signatures keeps recall
    high while comparing only same-block vectors. Output matches
    :func:`~.dedup.cosine_neardup_pairs` (the brute-force oracle).
    """
    assert max_block_hamming in (0, 1)
    sig = hyperplane_signatures(rebalance(df), n_planes, dim, seed, vec_col, id_col).select(
        F.col(id_col).alias("id"), _unit(F.col(vec_col)).alias("unit"), F.col("signature")
    )
    # multi-probe as an EQUI-join: side a explodes into its signature
    # plus (optionally) every 1-bit flip; join b on signature equality —
    # a keyed shuffle on the signature, never an all-pairs comparison
    probe_list = [F.col("signature")]
    if max_block_hamming == 1:
        probe_list += [
            F.col("signature").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)
        ]
    a = sig.select(
        F.col("id").alias("id_a"),
        F.col("unit").alias("unit_a"),
        F.explode(F.array(*probe_list)).alias("probe"),
    )
    b = sig.select(
        F.col("id").alias("id_b"), F.col("unit").alias("unit_b"), F.col("signature").alias("probe")
    )
    dot = F.aggregate(
        F.zip_with(F.col("unit_a"), F.col("unit_b"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        a.join(b, ["probe"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select(
            F.col("id_a").alias("vec_id_a"),
            F.col("id_b").alias("vec_id_b"),
            dot.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def srp_banded_neardup(
    df: DataFrame,
    threshold: float = 0.9,
    n_bands: int = 8,
    band_bits: int = 12,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """OR-amplified banded SRP-LSH near-dup pairs: ``n_bands``
    independent ``band_bits``-bit hyperplane signatures per vector;
    a pair is a CANDIDATE when any band matches exactly, then every
    candidate is verified with the exact cosine — so whenever banding
    recall is 1.0 at the threshold (pytest-pinned on the shipped data,
    plus a constructed high-similarity fixture), the output EQUALS the
    brute-force pair list and shares its oracle.

    Tuning is the classic (r, L) banding tradeoff: P(candidate) =
    1-(1-(1-θ/π)^r)^L. At production thresholds (cosine ≥ 0.9, θ ≤
    26°, per-bit agreement ≥ 0.86) the default r=12/L=8 keeps buckets
    fine-grained — candidates ≈ true pairs, sub-quadratic end to end.
    At LOW thresholds (pair angle → 63°+) no (r, L) is selective —
    per-bit agreement → 0.5 means coarse bands admit most pairs — so
    there the value of this operator is gating the banding machinery,
    not flops (the exact ``cosine_allpairs_blockjoin`` stays the
    compute-optimal form; registry entries document which is which).

    Plan shape: signatures are ONE Arrow batch matmul per partition
    (vectors × a seeded constant plane matrix — no shuffle), candidates
    an equi-join keyed on (band, signature) — shuffle is L·n signature
    rows plus the candidate pairs, never an all-pairs comparison."""
    import numpy as np

    rng = random.Random(seed)
    n_planes = n_bands * band_bits
    # deterministic plane matrix (plane p = gaussian stream positions
    # [p·dim, (p+1)·dim)): tiny constant closure, same on every task
    P = np.array(
        [rng.gauss(0.0, 1.0) for _ in range(n_planes * dim)]
    ).reshape(n_planes, dim)
    weights = (1 << np.arange(band_bits)).astype(np.int64)
    sig_schema = f"{id_col} long, sigs array<long>"

    def signatures(batches):
        import pandas as _pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = np.stack(pdf["__v"].to_numpy()).astype(np.float64)
            bits = (E @ P.T) >= 0  # n × (L·r)
            sigs = [
                (bits[:, b * band_bits : (b + 1) * band_bits] @ weights)
                for b in range(n_bands)
            ]
            S = np.stack(sigs, axis=1)  # n × L
            yield _pd.DataFrame(
                {id_col: pdf["__id"].to_numpy(), "sigs": list(S)}
            )

    staged = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).cast("array<double>").alias("__v")
    )
    sigged = staged.mapInPandas(signatures, schema=sig_schema)
    keyed = sigged.select(
        F.col(id_col).alias("id"), F.posexplode("sigs").alias("band", "sig")
    )
    a = keyed.select(
        F.col("id").alias("id_a"), "band", "sig"
    )
    b = keyed.select(F.col("id").alias("id_b"), "band", "sig")
    cands = (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    units = df.select(F.col(id_col).alias("__uid"), _unit(F.col(vec_col)).alias("__unit"))
    dot = F.aggregate(
        F.zip_with(F.col("ua"), F.col("ub"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        cands.join(units.select(F.col("__uid").alias("id_a"), F.col("__unit").alias("ua")), "id_a")
        .join(units.select(F.col("__uid").alias("id_b"), F.col("__unit").alias("ub")), "id_b")
        .select(
            F.col("id_a").alias("vec_id_a"),
            F.col("id_b").alias("vec_id_b"),
            dot.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    seed: int = 42,
    sample_rows: int = 4096,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Spherical k-means centroids for IVF, trained driver-side on a
    bounded sample (numpy, seeded — deterministic across runs and
    partitionings because the sample is taken in ``id_col`` order).

    The sample is O(sample_rows × dim) — tiny and constant regardless
    of corpus size; at 100 TB the TakeOrdered limit ships only the
    sample to the driver. Returns a unit-row (n_cells, dim) ndarray.
    """
    import numpy as np

    rows = corpus.select(id_col, vec_col).orderBy(id_col).limit(sample_rows).collect()
    if not rows:  # empty corpus -> no centroids (callers emit empty results)
        return np.zeros((0, 1), dtype=np.float64)
    X = np.array([r[1] for r in rows], dtype=np.float64)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    rng = np.random.RandomState(seed)
    C = X[rng.permutation(len(X))[:n_cells]].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(n_cells):
            members = X[assign == j]
            if len(members):  # empty cell keeps its old centroid
                m = members.sum(axis=0)
                nrm = np.linalg.norm(m)
                if nrm > 0:
                    C[j] = m / nrm
    return C


def ann_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k via an inverted-file (IVF) index — the
    partition-pruning analogue of vector search.

    Offline phase: spherical k-means on a bounded sample (driver-side,
    seeded) gives ``n_cells`` unit centroids. Each corpus vector is
    assigned to its nearest cell by an Arrow-batched numpy argmax
    (map-only — no shuffle); each query probes its ``n_probe`` nearest
    cells. Candidates are then a broadcast equi-join on ``cell`` —
    corpus vectors are scored only against queries probing their cell,
    so the scored fraction is ~n_probe/n_cells of the corpus instead
    of all of it, and it shrinks as n_cells grows with data size.

    At cluster scale the cell id doubles as a physical partitioning /
    clustering key: writing the corpus bucketed by ``cell`` turns each
    probe into a partition-pruned scan. Physically this runs as ONE
    Arrow-batched map pass over the corpus (assign cell + BLAS block
    matmul + probe-mask + local top-k per query, ≤ k·|queries| rows
    emitted per batch — the :func:`cosine_topk_blocked` shape); the
    final shuffle carries candidates only. Output contract matches
    :func:`cosine_topk`; recall is pinned in tests.
    """
    import numpy as np

    C = train_ivf_centroids(
        corpus, n_cells=n_cells, seed=seed, vec_col=vec_col, id_col=id_col
    )

    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows or C.shape[0] == 0:  # empty queries or corpus -> empty result
        return queries.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank long"
        )
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([r[1] for r in q_rows], dtype=np.float64)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    # each query's n_probe nearest cells (ties → lowest cell index)
    q_probe = np.argsort(-(Q @ C.T), kind="stable", axis=1)[:, :n_probe]
    # (n_queries, n_cells) eligibility mask
    probe_mask = np.zeros((len(qids), C.shape[0]), dtype=bool)
    np.put_along_axis(probe_mask, q_probe, True, axis=1)
    kk = k + 1  # self-match is dropped after scoring

    def score(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = _np.stack(pdf[vec_col].to_numpy()).astype(_np.float64)
            X /= _np.linalg.norm(X, axis=1, keepdims=True)
            cids = pdf[id_col].to_numpy()
            cell = _np.argmax(X @ C.T, axis=1)  # corpus → 1 cell each
            S = X @ Q.T  # (batch, n_queries)
            # IVF pruning: a corpus vector is a candidate for a query
            # only if its cell is among the query's probed cells
            S = _np.where(probe_mask[:, cell].T, S, -_np.inf)
            take = min(kk, S.shape[0])
            idx = _np.argpartition(-S, take - 1, axis=0)[:take]
            sc = _np.take_along_axis(S, idx, axis=0).T.ravel()
            keep = _np.isfinite(sc)
            yield _pd.DataFrame(
                {
                    "query_id": _np.repeat(qids, take)[keep],
                    "neighbor_id": cids[idx].T.ravel()[keep],
                    "cosine": sc[keep],
                }
            )

    cand = (
        rebalance(corpus)
        .select(id_col, vec_col)
        .mapInPandas(score, schema="query_id long, neighbor_id long, cosine double")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return cand.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


def cosine_neardup_blocked(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All-pairs cosine ≥ threshold via Arrow block matmul — the dense
    compute path for :func:`~.dedup.cosine_neardup_pairs` (identical
    output contract; the HOF join stays as the dependency-free
    baseline the oracle mirrors).

    SMALL-CORPUS baseline only (pytest-pinned, not registered): it
    collects the corpus matrix to the driver and ships it in the
    closure (~10⁶ × dim doubles ceiling). The registered/scale path is
    :func:`cosine_allpairs_blockjoin` — same exact semantics with no
    driver materialization. Only the i < j upper triangle is emitted
    and pairs never shuffle until the (small) threshold survivors.
    10-100× over the expression-fold self-join at the corpus sizes
    where this in-closure form applies (measured 16 s → 1.3 s at
    5 000 × 64 on local[32]).
    """
    import numpy as np

    rows = df.select(id_col, vec_col).collect()
    if not rows:  # empty corpus -> no pairs
        return df.sparkSession.createDataFrame(
            [], "vec_id_a long, vec_id_b long, cosine double"
        )
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.array([r[1] for r in rows], dtype=np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, M = ids[order], M[order]
    thr = float(threshold)

    def score(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = _np.stack(pdf[vec_col].to_numpy()).astype(_np.float64)
            C /= _np.linalg.norm(C, axis=1, keepdims=True)
            cids = pdf[id_col].to_numpy()
            S = C @ M.T  # (batch, corpus)
            # upper triangle only: batch id < corpus id
            mask = (S >= thr) & (cids[:, None] < ids[None, :])
            bi, cj = _np.nonzero(mask)
            yield _pd.DataFrame(
                {
                    "vec_id_a": cids[bi],
                    "vec_id_b": ids[cj],
                    "cosine": S[bi, cj],
                }
            )

    from data_quality_checks_in_relational_database_spark.functions.scalars import rebalance

    return rebalance(df).select(id_col, vec_col).mapInPandas(
        score, schema="vec_id_a long, vec_id_b long, cosine double"
    )


def cosine_allpairs_blockjoin(
    df: DataFrame,
    threshold: float = 0.95,
    num_blocks: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold, fully distributed — the
    block-pair self-join that replaces :func:`cosine_neardup_blocked`'s
    full-corpus driver collect as the registered scale path.

    Classic blocked all-pairs: vectors hash into ``B = num_blocks``
    blocks; every unordered block pair (i ≤ j) becomes one task that
    BLAS-multiplies block i against block j (the diagonal multiplies
    its own upper triangle). Nothing ever aggregates on the driver:

    - replication: each vector ships to exactly B block-pair groups
      (as left side of (b, j≥b) plus right side of (i<b, b)), so the
      shuffle is B·n·dim — linear in the corpus for fixed B;
    - task memory: O((n/B)·dim) per side — choose
      B ≈ n·dim·8 / target_task_bytes so blocks fit executors at any
      corpus size (B grows with n; total flops stay the inherent
      O(n²·dim) of the EXACT contract);
    - output: only threshold survivors shuffle onward.

    For corpora where exact all-pairs flops are themselves infeasible
    (real 100 TB embedding stores at threshold ≥0.9),
    :func:`hyperplane_lsh_neardup` is the sub-quadratic candidate path;
    THIS operator is the exact gate whose semantics match the
    brute-force oracle at ANY threshold, including low ones where LSH
    blocking recall collapses (pair angle → 90°).
    """
    import numpy as np

    B = int(num_blocks)
    assert B >= 1
    sig = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    blk = F.pmod(F.xxhash64(F.col("id")), F.lit(B)).cast("int")
    # left role: block b joins pairs (b, j) for j in b..B-1
    left = sig.withColumn("bi", blk).select(
        "id", "v", "bi", F.explode(F.sequence(F.col("bi"), F.lit(B - 1))).alias("bj"),
        F.lit(0).alias("side"),
    )
    # right role: block b joins pairs (i, b) for i in 0..b-1 (the
    # diagonal pair (b, b) is covered by the left role alone)
    right = (
        sig.withColumn("bj", blk)
        .select(
            "id", "v",
            F.explode(F.sequence(F.lit(0), F.col("bj"))).alias("bi"),
            "bj", F.lit(1).alias("side"),
        )
        .filter(F.col("bi") < F.col("bj"))
    )
    staged = left.select("bi", "bj", "side", "id", "v").unionByName(
        right.select("bi", "bj", "side", "id", "v")
    )
    thr = float(threshold)

    def pairs_in_group(pdf):
        import numpy as _np
        import pandas as _pd

        a = pdf[pdf["side"] == 0]
        ids_a = a["id"].to_numpy()
        if len(ids_a) == 0:
            return _pd.DataFrame({"vec_id_a": [], "vec_id_b": [], "cosine": []})
        A = _np.stack(a["v"].to_numpy()).astype(_np.float64)
        A /= _np.linalg.norm(A, axis=1, keepdims=True)
        diagonal = int(pdf["bi"].iat[0]) == int(pdf["bj"].iat[0])
        if diagonal:
            ids_b, Bm = ids_a, A
        else:
            b = pdf[pdf["side"] == 1]
            ids_b = b["id"].to_numpy()
            if len(ids_b) == 0:
                return _pd.DataFrame({"vec_id_a": [], "vec_id_b": [], "cosine": []})
            Bm = _np.stack(b["v"].to_numpy()).astype(_np.float64)
            Bm /= _np.linalg.norm(Bm, axis=1, keepdims=True)
        S = A @ Bm.T
        # id order defines the pair orientation (blocks are hash-assigned,
        # so either side may hold the smaller id)
        mask = (S >= thr) & (ids_a[:, None] < ids_b[None, :])
        ai, bj = _np.nonzero(mask)
        lo, hi = ids_a[ai], ids_b[bj]
        if not diagonal:
            mask2 = (S >= thr) & (ids_a[:, None] > ids_b[None, :])
            ai2, bj2 = _np.nonzero(mask2)
            lo = _np.concatenate([lo, ids_b[bj2]])
            hi = _np.concatenate([hi, ids_a[ai2]])
            cos = _np.concatenate([S[ai, bj], S[ai2, bj2]])
        else:
            cos = S[ai, bj]
        return _pd.DataFrame({"vec_id_a": lo, "vec_id_b": hi, "cosine": cos})

    return staged.groupBy("bi", "bj").applyInPandas(
        pairs_in_group, schema="vec_id_a long, vec_id_b long, cosine double"
    )


def cosine_topk_flops(n_corpus: int, n_queries: int, dim: int) -> float:
    """Rough flop count for capacity planning (brute force)."""
    return 2.0 * n_corpus * n_queries * dim


def jl_signs(in_dim: int, out_dim: int, seed: str = "jl") -> list[list[int]]:
    """Deterministic ±1 sign matrix for :func:`jl_project`, derived
    from md5 so ANY engine (or oracle) can reproduce it bit-for-bit —
    no RNG state, no library dependence."""
    import hashlib

    return [
        [
            1 if hashlib.md5(f"{seed}_{i}_{j}".encode()).digest()[0] % 2 == 0 else -1
            for j in range(in_dim)
        ]
        for i in range(out_dim)
    ]


def jl_project(
    df: DataFrame,
    in_dim: int,
    out_dim: int,
    seed: str = "jl",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: reduce embeddings to
    ``out_dim`` with a signed (±1/√out_dim) projection — the cheap
    dimensionality cut before clustering / visualization / coarse ANN
    (pairwise distances preserved within 1±ε w.h.p.).

    Output: one row per (id, dim) — (id, dim, value), value 6-dp
    (scalar rows; the array form is trivially regrouped downstream).

    Engine-portable by construction: the sign matrix comes from
    :func:`jl_signs` (md5-derived, embedded as literals), each output
    is a LEFT-TO-RIGHT fold of sign·component products, and ±1 signs
    keep every product exact — the doubles are bit-identical in any
    IEEE engine evaluating the same shape. Map-only: no shuffle at
    all; cost is O(in_dim · out_dim) per row, inherent to the
    transform.
    """
    signs = jl_signs(in_dim, out_dim, seed)
    scale = float(out_dim) ** 0.5
    v = F.col(vec_col).cast("array<double>")
    outputs = []
    for i in range(out_dim):
        sign_arr = F.array(*[F.lit(float(s)) for s in signs[i]])
        dot = F.aggregate(
            F.zip_with(v, sign_arr, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        outputs.append(
            F.struct(
                F.lit(i).cast("long").alias("dim"),
                F.round(dot / scale, 6).alias("value"),
            )
        )
    return df.select(
        F.col(id_col), F.explode(F.array(*outputs)).alias("o")
    ).select(id_col, F.col("o.dim").alias("dim"), F.col("o.value").alias("value"))


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k_candidates: int = 20,
    m: int = 5,
    lam_w: int = 7,
    mu_w: int = 3,
    weight_denom: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    prec: int = 6,
) -> DataFrame:
    """Maximal-Marginal-Relevance reranking (Carbonell & Goldstein
    1998): per query, greedily pick ``m`` results maximizing
    ``lam * relevance - mu * max_sim_to_already_selected`` (lam =
    lam_w/weight_denom, mu = mu_w/weight_denom) — the diversification
    pass retrieval pipelines run on top of a dense top-k so
    near-duplicate hits don't crowd the context window.

    Two stages, both scale-shaped: (1) exact top-``k_candidates``
    per query via the blocked BLAS matmul (candidates-only shuffle);
    (2) the greedy selection runs per-query over its BOUNDED candidate
    set inside ``applyInPandas`` — O(k²) pairwise sims on ≤ k rows per
    group, embarrassingly parallel across queries, nothing global.

    Determinism: relevance and candidate-candidate cosines are
    quantized to INTEGER micro-units (round(x·10^prec)) before the
    greedy loop, the MMR objective is evaluated in exact integer
    arithmetic (lam_w·rel_i − mu_w·ms_i — hence integer weights, not
    float lam), and argmax ties break on the lower neighbor id. The
    emitted doubles are single exact-integer divisions, bit-identical
    across engines WITHOUT a final round (re-rounding a pre-rounded
    combination sits exactly on decimal boundaries where Spark's
    BigDecimal HALF_UP and DuckDB's binary rounding disagree).

    Output per query: (query_id, step 1..m, neighbor_id, relevance,
    max_sim_selected, mmr_score). The max-sim penalty is 0 at step 1
    (empty selected set) and UNclamped thereafter (may be negative).
    """
    import numpy as np

    scale = 10 ** prec
    cands = cosine_topk_blocked(
        corpus, queries, k=k_candidates, vec_col=vec_col, id_col=id_col
    )
    nv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nv")
    )
    joined = cands.join(nv, "neighbor_id")

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = [
            "query_id",
            "step",
            "neighbor_id",
            "relevance",
            "max_sim_selected",
            "mmr_score",
        ]
        if pdf.empty:
            return pd.DataFrame(columns=cols)
        pdf = pdf.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True]
        ).reset_index(drop=True)
        V = np.stack(pdf["__nv"].to_numpy()).astype(np.float64)
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        S_i = np.rint((V @ V.T) * scale).astype(np.int64)
        rel = pdf["cosine"].to_numpy(dtype=np.float64)  # pre-rounded
        rel_i = np.rint(rel * scale).astype(np.int64)
        ids = pdf["neighbor_id"].to_numpy()
        n = len(pdf)
        chosen = np.zeros(n, dtype=bool)
        # zero penalty while nothing is selected; thereafter the TRUE
        # max over selected (which can be negative — no clamping at 0)
        max_sim_i = np.zeros(n, dtype=np.int64)
        out = []
        for step in range(1, min(m, n) + 1):
            score_i = lam_w * rel_i - mu_w * max_sim_i  # exact ints
            best = -1
            for i in range(n):
                if chosen[i]:
                    continue
                if (
                    best < 0
                    or score_i[i] > score_i[best]
                    or (score_i[i] == score_i[best] and ids[i] < ids[best])
                ):
                    best = i
            chosen[best] = True
            out.append(
                (
                    int(pdf["query_id"].iat[0]),
                    step,
                    int(ids[best]),
                    rel_i[best] / scale,
                    max_sim_i[best] / scale,
                    score_i[best] / (scale * weight_denom),
                )
            )
            max_sim_i = (
                S_i[:, best].copy()
                if step == 1
                else np.maximum(max_sim_i, S_i[:, best])
            )
        return pd.DataFrame(out, columns=cols)

    res = joined.groupBy("query_id").applyInPandas(
        pick,
        schema="query_id long, step long, neighbor_id long, relevance double, "
        "max_sim_selected double, mmr_score double",
    )
    return res.select(
        "query_id",
        "step",
        "neighbor_id",
        (F.col("relevance") + F.lit(0.0)).alias("relevance"),
        (F.col("max_sim_selected") + F.lit(0.0)).alias("max_sim_selected"),
        (F.col("mmr_score") + F.lit(0.0)).alias("mmr_score"),
    )


def cosine_threshold_hits(
    corpus: DataFrame,
    queries: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    prec: int = 6,
) -> DataFrame:
    """Per corpus row: how many query vectors it matches at cosine ≥
    ``threshold``, and its maximum cosine to ANY query — the
    embedding-space (semantic) eval-decontamination primitive: unlike
    top-k, contamination needs EVERY row above the bar, and unlike the
    n-gram recipe it catches paraphrases.

    Scale shape: the (bounded) query matrix ships in the closure; one
    Arrow pass over the corpus does a BLAS block matmul per batch and
    emits exactly one row per corpus row — no join, no shuffle beyond
    the scan. Cosines are rounded to ``prec`` BEFORE the threshold
    compare so the flag is engine-portable."""
    import numpy as np

    q_rows = queries.select(id_col, vec_col).collect()  # bounded eval set
    if not q_rows:
        return corpus.sparkSession.createDataFrame(
            [], f"{id_col} long, n_hits long, max_cos double"
        )
    Q = np.array([r[1] for r in q_rows], dtype=np.float64)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)

    def score(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = _np.stack(pdf[vec_col].to_numpy()).astype(_np.float64)
            C /= _np.linalg.norm(C, axis=1, keepdims=True)
            S = _np.round(C @ Q.T, prec)
            yield _pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "n_hits": (S >= threshold).sum(axis=1).astype("int64"),
                    "max_cos": S.max(axis=1),
                }
            )

    out = corpus.select(id_col, vec_col).mapInPandas(
        score, schema=f"{id_col} long, n_hits long, max_cos double"
    )
    return out.select(
        id_col, "n_hits", (F.col("max_cos") + F.lit(0.0)).alias("max_cos")
    )
