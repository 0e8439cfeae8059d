"""Iterative graph ranking over edge lists: weighted PageRank.

No counterpart in the reference (two single-table pandas/MySQL check
scripts, `/root/reference/data_consistency_checks.py:43-77`,
`pre_and_post_etl_checks.py:45-110` — no graph structure anywhere);
this is a training-data-pipeline extension: page/domain authority is a
standard corpus-quality prior (harvested link graphs rank sources
before sampling), and the same kernel ranks states in the event
transition graph.

Scale design (the 100 TB contract is a web-scale link graph):

- The edge list is aggregated to one ``(src, dst, weight)`` row per
  arc, normalized by out-weight ONCE, repartitioned by ``src`` and
  persisted — a cached frame keeps its ``HashPartitioning(src)``
  output partitioning, so every iteration's join exchanges ONLY the
  (node, rank) side (tiny relative to edges). Edges never re-shuffle
  after the initial placement.
- Each iteration is one hash join + one keyed aggregation — no
  windows, no driver-side structures; rank rows shuffle as
  ``(node, double)`` pairs.
- The dangling-node mass (rank parked on nodes with no out-edges) is
  a single global scalar per iteration; it rides a 1-row aggregate
  cross-joined back via ``broadcast`` — never a per-node collect.
- Lineage is truncated every round with ``localCheckpoint`` (lazy,
  materialized by the rank-sum probe job) exactly as in
  :mod:`..operators.cluster` — a depth-k iterated join plan
  otherwise blows up Catalyst analysis super-linearly. Checkpoint
  blocks are freed explicitly after the final frame detaches.
- Iteration count is FIXED (default 10), not convergence-tested:
  deterministic output for the differential oracle, bounded job
  count at any scale. The rank-sum probe doubles as a sanity
  invariant (total mass stays 1 ± fp-noise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _pagerank_driver(
    spark: SparkSession, norm_rows, iters: int, damping: float, prec: int
) -> DataFrame:
    """Small-graph fast path: the identical recurrence over the
    collected normalized arc list (src, dst, frac). The arc list is
    already bounded by ``driver_threshold``; both the node order AND
    the arc iteration order are sorted, so every float accumulation
    runs in the same order run-to-run regardless of how ``collect()``
    happened to order the partitions."""
    norm_rows = sorted(norm_rows, key=lambda r: (r.src, r.dst))
    nodes = sorted({r.src for r in norm_rows} | {r.dst for r in norm_rows})
    n = len(nodes)
    srcs = {r.src for r in norm_rows}
    r = {v: 1.0 / n for v in nodes}
    base = (1.0 - damping) / n
    for _ in range(iters):
        dang = sum(r[v] for v in nodes if v not in srcs)
        contrib = {v: 0.0 for v in nodes}
        for row in norm_rows:
            contrib[row.dst] += r[row.src] * row.frac
        r = {v: base + damping * (contrib[v] + dang / n) for v in nodes}
    out = [(v, round(r[v], prec) + 0.0) for v in nodes]
    schema = "node string, rank double"
    if norm_rows and not isinstance(norm_rows[0].src, str):
        schema = "node long, rank double"
    return spark.createDataFrame(out, schema=schema)


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    iters: int = 10,
    damping: float = 0.85,
    prec: int = 6,
    driver_threshold: int = 1_000_000,
    probe_every: int = 5,
) -> DataFrame:
    """Weighted PageRank over an edge list; returns ``(node, rank)``
    with ``rank`` rounded to ``prec`` decimals (both engines of the
    differential gate sum doubles in different orders; the analytic
    values agree to ~1e-15, so a fixed rounding makes the comparison
    exact). Multi-edges are collapsed by summing their weights; an
    absent ``weight_col`` means every edge counts 1.

    Size-adaptive like :func:`..operators.cluster.connected_components`:
    the aggregated arc list's size is already known from the eager
    cache fill, and at or under ``driver_threshold`` arcs the fixed-
    iteration recurrence runs as a driver-side numpy loop — identical
    output, none of the per-round scheduler+shuffle floor (~0.6 s ×
    rounds even for a 10-node transition graph). Above the threshold
    the distributed loop below is the 100 TB web-graph contract.
    """
    from pyspark import StorageLevel

    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    arcs = (
        edges.select(
            F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    outw = arcs.groupBy("src").agg(F.sum("w").alias("tw"))
    # normalize once: each arc carries its transition probability, so
    # the per-iteration join needs no third table
    norm = (
        arcs.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("tw")).alias("frac"))
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_arcs = norm.count()  # eager cache fill: iterations must reuse, not rebuild
    if n_arcs == 0:
        norm.unpersist()
        return edges.sparkSession.createDataFrame(
            [], schema=f"node {edges.schema[src].dataType.simpleString()}, rank double"
        )
    if n_arcs <= driver_threshold:
        rows = norm.collect()
        norm.unpersist()
        return _pagerank_driver(
            edges.sparkSession, rows, iters, damping, prec
        )

    nodes = (
        norm.select(F.col("src").alias("node"))
        .unionByName(norm.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_nodes = nodes.count()  # bounded scalar: graph order, not data volume
    if n_nodes == 0:
        norm.unpersist()
        nodes.unpersist()
        return edges.sparkSession.createDataFrame(
            [], schema=f"node {edges.schema[src].dataType.simpleString()}, rank double"
        )
    srcs = norm.select("src").distinct().persist(StorageLevel.MEMORY_AND_DISK)

    spark = edges.sparkSession
    jsc = spark.sparkContext._jsc

    def _rdd_ids() -> set[int]:
        return {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}

    def _free(ids: set[int]) -> None:
        it = jsc.getPersistentRDDs().entrySet().iterator()
        while it.hasNext():
            e = it.next()
            if int(e.getKey()) in ids:
                e.getValue().unpersist(False)

    pre = _rdd_ids()
    base = (1.0 - damping) / n_nodes
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("r")).localCheckpoint(
        eager=False
    )
    for it in range(iters):
        # global dangling mass: 1-row aggregate, broadcast back onto
        # every node row (never a driver collect in the loop)
        dang = ranks.join(srcs, ranks["node"] == srcs["src"], "left_anti").agg(
            F.coalesce(F.sum("r"), F.lit(0.0)).alias("dang")
        )
        contribs = (
            norm.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("r") * F.col("frac")).alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dang") / F.lit(float(n_nodes))
                    )
                ).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
        # Batched invariant probe (every probe_every rounds + the final
        # round, instead of every round): the probe is a pure tripwire
        # — the recurrence conserves mass analytically, the loop is a
        # FIXED round count, and the rounds in between still truncate
        # lineage per round (each lazy localCheckpoint becomes a
        # LogicalRDD at call time) and still run their shuffle stages
        # exactly once (all references share one RDD whose blocks are
        # saved on first compute, inside the next probe's job). What a
        # skipped probe saves is one scheduled job + one full pass over
        # the node-sized rank frame + a driver collect barrier PER
        # ROUND — at web-graph scale, a cluster-wide sync for a scalar
        # the probed round re-checks anyway. Drift introduced in an
        # unprobed round is caught at the next probe ≤ probe_every
        # rounds later; healthy runs return bit-identical output.
        if (it + 1) % probe_every == 0 or it == iters - 1:
            total = ranks.agg(F.sum("r")).collect()[0][0]
            # ValueError, not assert: must hold under -O too
            if abs(total - 1.0) >= 1e-6:
                raise ValueError(f"rank mass drifted: {total}")
    mid = _rdd_ids()
    out = ranks.select("node", F.round(F.col("r"), prec).alias("rank")).localCheckpoint()
    _free(mid - pre)
    norm.unpersist()
    nodes.unpersist()
    srcs.unpersist()
    return out


def _ppr_driver(
    spark: SparkSession, norm_rows, seed_set, iters: int, damping: float, prec: int
) -> DataFrame:
    """Small-graph fast path for :func:`personalized_pagerank` — the
    identical recurrence over the collected normalized arc list, with
    teleport mass confined to ``seed_set``. Sorted node and arc orders
    make every float accumulation run-to-run identical (same rationale
    as :func:`_pagerank_driver`)."""
    norm_rows = sorted(norm_rows, key=lambda r: (r.src, r.dst))
    nodes = sorted(
        {r.src for r in norm_rows} | {r.dst for r in norm_rows} | set(seed_set)
    )
    srcs = {r.src for r in norm_rows}
    ns = len(seed_set)
    tele = {v: (1.0 / ns if v in seed_set else 0.0) for v in nodes}
    r = dict(tele)
    for _ in range(iters):
        dang = sum(r[v] for v in nodes if v not in srcs)
        contrib = {v: 0.0 for v in nodes}
        for row in norm_rows:
            contrib[row.dst] += r[row.src] * row.frac
        r = {
            v: (1.0 - damping) * tele[v]
            + damping * (contrib[v] + dang * tele[v])
            for v in nodes
        }
    out = [(v, round(r[v], prec) + 0.0) for v in nodes]
    schema = "node string, rank double"
    if nodes and not isinstance(nodes[0], str):
        schema = "node long, rank double"
    return spark.createDataFrame(out, schema=schema)


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    seed_col: str = "node",
    iters: int = 10,
    damping: float = 0.85,
    prec: int = 6,
    driver_threshold: int = 1_000_000,
    probe_every: int = 5,
) -> DataFrame:
    """Personalized (seeded) PageRank: the teleport vector is uniform
    over ``seeds`` instead of over all nodes, so rank mass measures
    proximity/influence RELATIVE to the seed set — the standard
    "blast radius with decay" score (contamination influence from
    known-bad documents, conversion-adjacency of funnel states) that
    plain PageRank's global prior washes out. Dangling mass returns to
    the SEEDS (r_{t+1} = (1-d)·e_S + d·(Pᵀr + dang·e_S)), keeping
    total mass exactly 1 — the invariant probe below asserts it.

    Same size-adaptive physical strategy and lineage discipline as
    :func:`pagerank`: at or under ``driver_threshold`` arcs the fixed
    recurrence runs as a sorted driver loop; above it, each round is
    one hash join + keyed aggregation over ``(node, rank)`` pairs with
    the once-placed normalized arc list never re-shuffling, the
    dangling scalar riding a 1-row broadcast, and ``localCheckpoint``
    truncating lineage per round. Seeds absent from the edge list
    still hold teleport mass (they are unioned into the node set).
    """
    from pyspark import StorageLevel

    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    arcs = (
        edges.select(
            F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    outw = arcs.groupBy("src").agg(F.sum("w").alias("tw"))
    norm = (
        arcs.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("tw")).alias("frac"))
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    seed_frame = seeds.select(F.col(seed_col).alias("node")).distinct()
    n_arcs = norm.count()  # eager cache fill
    spark = edges.sparkSession
    if n_arcs <= driver_threshold:
        # seed sets are release gates / query inputs — bounded by
        # contract, so the collect here is a driver-path prerequisite,
        # not a data-sized pull (the distributed loop below never
        # collects seeds)
        seed_set = {r.node for r in seed_frame.collect()}
        rows = norm.collect()
        norm.unpersist()
        if not seed_set:
            return spark.createDataFrame(
                [],
                schema=f"node {edges.schema[src].dataType.simpleString()}, rank double",
            )
        return _ppr_driver(spark, rows, seed_set, iters, damping, prec)

    graph_nodes = (
        norm.select(F.col("src").alias("node"))
        .unionByName(norm.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_seeds = seed_frame.count()
    if n_seeds == 0:
        norm.unpersist()
        return spark.createDataFrame(
            [],
            schema=f"node {edges.schema[src].dataType.simpleString()}, rank double",
        )
    # teleport vector: one row per node, 1/|S| on seeds, 0 elsewhere
    nodes = (
        graph_nodes.unionByName(seed_frame)
        .distinct()
        .join(seed_frame.withColumn("is_seed", F.lit(True)), "node", "left")
        .select(
            "node",
            F.when(F.col("is_seed"), F.lit(1.0 / n_seeds))
            .otherwise(F.lit(0.0))
            .alias("tele"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes.count()
    srcs = norm.select("src").distinct().persist(StorageLevel.MEMORY_AND_DISK)

    jsc = spark.sparkContext._jsc

    def _rdd_ids() -> set[int]:
        return {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}

    def _free(ids: set[int]) -> None:
        it = jsc.getPersistentRDDs().entrySet().iterator()
        while it.hasNext():
            e = it.next()
            if int(e.getKey()) in ids:
                e.getValue().unpersist(False)

    pre = _rdd_ids()
    ranks = nodes.select("node", F.col("tele").alias("r")).localCheckpoint(
        eager=False
    )
    for it in range(iters):
        dang = ranks.join(srcs, ranks["node"] == srcs["src"], "left_anti").agg(
            F.coalesce(F.sum("r"), F.lit(0.0)).alias("dang")
        )
        contribs = (
            norm.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("r") * F.col("frac")).alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) * F.col("tele")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dang") * F.col("tele")
                    )
                ).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
        # batched invariant probe — same argument as pagerank: fixed
        # rounds, mass conserved analytically, lineage still truncated
        # per round; a skipped probe removes a job + full rank-frame
        # pass + driver barrier per round
        if (it + 1) % probe_every == 0 or it == iters - 1:
            total = ranks.agg(F.sum("r")).collect()[0][0]
            # ValueError, not assert: must hold under -O too
            if abs(total - 1.0) >= 1e-6:
                raise ValueError(f"PPR mass drifted: {total}")
    mid = _rdd_ids()
    out = ranks.select("node", F.round(F.col("r"), prec).alias("rank")).localCheckpoint()
    _free(mid - pre)
    norm.unpersist()
    nodes.unpersist()
    srcs.unpersist()
    return out


def modularity_terms(
    pairs: DataFrame,
    labels: DataFrame,
    id_a: str = "doc_id_a",
    id_b: str = "doc_id_b",
    node_col: str = "node",
    label_col: str = "label",
    prec: int = 6,
) -> DataFrame:
    """Newman modularity decomposition of a community partition over an
    undirected edge list: per community c,
    ``term_c = L_c/m − (d_c/(2m))²`` where ``L_c`` is the intra-community
    edge count, ``d_c`` the degree mass, ``m`` the total edge count —
    Q = Σ_c term_c. The quality readout for a dedup/community pass:
    near-zero or negative terms flag label groups that are NOT denser
    than chance (over-merged components, oscillating LP labels) before
    anything is collapsed.

    All sufficient statistics are exact integers (edge counts, degree
    sums); each output row does one ``L_c/m`` division and one squared
    ratio — deterministic under any partitioning. Plan: two broadcast-
    sized label joins onto the (bounded, verified) pair list + keyed
    integer aggregations; nothing corpus-sized shuffles. Nodes missing
    from ``labels`` keep their own id as a singleton label (same
    convention as the LP/components reports).

    Output: one row per community that owns ≥1 graph node —
    ``(community, n_nodes, intra_edges, degree_sum, modularity_term)``.
    """
    # The output schema declares ``community long``; with string node
    # ids the singleton fallback ``coalesce(label, node)`` would produce
    # strings whose long-cast is NULL, silently collapsing every
    # unlabeled community into one NULL row. Validate up front instead
    # (the sibling pair operators that DO support string ids keep the
    # id's own type end-to-end; this one is contract-typed to long).
    _integral = ("tinyint", "smallint", "int", "bigint", "long")
    for frame, col, what in (
        (pairs, id_a, "pair id"),
        (pairs, id_b, "pair id"),
        (labels, node_col, "label node id"),
        (labels, label_col, "community label"),
    ):
        t = frame.schema[col].dataType.simpleString()
        if t not in _integral:
            raise ValueError(
                f"modularity_terms needs integral ids/labels; {what} "
                f"column {col!r} is {t}"
            )
    e = (
        pairs.select(
            F.least(F.col(id_a), F.col(id_b)).alias("a"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()  # referenced 3x; bounded survivor set
    )
    lab = labels.select(
        F.col(node_col).alias("n"), F.col(label_col).alias("c")
    )
    la = lab.select(F.col("n").alias("a"), F.col("c").alias("ca"))
    lb = lab.select(F.col("n").alias("b"), F.col("c").alias("cb"))
    tagged = (
        e.join(la, "a", "left")
        .join(lb, "b", "left")
        .select(
            F.coalesce("ca", F.col("a")).alias("ca"),
            F.coalesce("cb", F.col("b")).alias("cb"),
        )
    )
    m = e.count()  # bounded scalar: graph size, not corpus size
    if m == 0:
        return pairs.sparkSession.createDataFrame(
            [],
            schema="community long, n_nodes long, intra_edges long, "
            "degree_sum long, modularity_term double",
        )
    intra = (
        tagged.where(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count(F.lit(1)).alias("intra_edges"))
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionByName(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    per_comm = (
        deg.join(lab, "n", "left")
        .select(F.coalesce("c", F.col("n")).alias("community"), "deg")
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("deg").alias("degree_sum"),
        )
    )
    term = (
        F.coalesce("intra_edges", F.lit(0)).cast("double") / F.lit(float(m))
        - (F.col("degree_sum").cast("double") / F.lit(2.0 * m))
        * (F.col("degree_sum").cast("double") / F.lit(2.0 * m))
    )
    return (
        per_comm.join(intra, "community", "left")
        .select(
            F.col("community").cast("long").alias("community"),
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.coalesce("intra_edges", F.lit(0)).cast("long").alias("intra_edges"),
            F.col("degree_sum").cast("long").alias("degree_sum"),
            F.round(term, prec).alias("modularity_term"),
        )
    )


def degree_assortativity(
    pairs: DataFrame,
    id_a: str = "doc_id_a",
    id_b: str = "doc_id_b",
    prec: int = 6,
) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of endpoint degrees over the symmetric edge list. For a
    near-dup graph it separates clique-shaped duplication (templates:
    high-degree nodes attach to high-degree nodes, r > 0) from hub-and-
    spoke contamination (one canonical page quoted by many one-off
    docs, r < 0) — two regimes that need different collapse policies.

    Sufficient statistics are exact BIGINT sums over the symmetric
    list (Σx, Σx², Σxy with integer degrees); the coefficient is one
    closed-form double expression — deterministic under any
    partitioning. Output: a single row
    ``(n_nodes, n_edges, assortativity)``; NULL coefficient when the
    degree variance is zero (regular graph).
    """
    e = (
        pairs.select(
            F.least(F.col(id_a), F.col(id_b)).alias("a"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        # lazy (r8): the distinct's shuffle output serves all four plan
        # references (degree union ×2, sym union ×2) inside one action;
        # no blocking pre-job. See bfs_hops.
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionByName(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    sym = e.select(F.col("a").alias("s"), F.col("b").alias("t")).unionByName(
        e.select(F.col("b").alias("s"), F.col("a").alias("t"))
    )
    ds = deg.select(F.col("n").alias("s"), F.col("deg").alias("x"))
    dt = deg.select(F.col("n").alias("t"), F.col("deg").alias("y"))
    stats = (
        sym.join(ds, "s")
        .join(dt, "t")
        .agg(
            F.count(F.lit(1)).alias("mm"),
            F.sum("x").alias("sx"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
    )
    n_nodes = deg.select(F.count(F.lit(1)).alias("n_nodes"))
    num = F.col("mm") * F.col("sxy") - F.col("sx") * F.col("sx")
    den = F.col("mm") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        stats.crossJoin(F.broadcast(n_nodes))
        .select(
            F.col("n_nodes").cast("long").alias("n_nodes"),
            (F.col("mm") / 2).cast("long").alias("n_edges"),
            F.when(
                den > 0,
                F.round(num.cast("double") / den.cast("double"), prec) + 0.0,
            ).alias("assortativity"),
        )
    )


def triangle_counts(
    pairs: DataFrame, id_a: str = "src", id_b: str = "dst", prec: int = 6
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over an
    undirected edge list — the clique-ness diagnostic for a near-dup
    pair graph: coefficients near 1 mean the candidate clusters are
    tight cliques (safe to collapse to one representative); low
    coefficients flag chain-shaped components where transitive merging
    over-removes.

    Standard distributed shape: edges canonicalized to (lo, hi) and
    deduplicated, then triangles enumerated by the two-join wedge
    closure — e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c) with a < b < c, so each
    triangle is produced exactly once. Joins are equi-joins on node
    ids; the edge list is the dedup funnel's bounded survivor set.

    Output: (node, degree, triangles, clustering_coeff) for every node
    in the edge list; coeff = 2T / (d(d-1)), NULL when degree < 2.
    """
    e = (
        pairs.select(
            F.least(F.col(id_a), F.col(id_b)).alias("lo"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("hi"),
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint()  # referenced 5x below; bounded survivor set
    )
    e1 = e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    e2 = e.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    e3 = e.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])  # one row per triangle a<b<c
    per_node = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    deg = (
        e.select(F.col("lo").alias("node"))
        .unionByName(e.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.join(per_node, "node", "left").select(
        "node",
        F.col("degree").cast("long").alias("degree"),
        F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
        F.when(
            F.col("degree") >= 2,
            F.round(
                2.0
                * F.coalesce("triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1)),
                prec,
            )
            + F.lit(0.0),
        ).alias("clustering_coeff"),
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """Multi-source BFS: minimum hop distance from any seed node,
    bounded at ``max_hops``. Returns ``(node, hops)`` for every node
    reached (seeds at 0); unreached nodes are absent.

    Fixed-round frontier expansion — the round count is a literal, so
    no convergence probe is needed (unlike the PageRank/components
    loops): each round joins the CURRENT frontier to the symmetric
    edge list and anti-joins nodes already assigned a (necessarily
    smaller) distance. Shuffles carry (node, hops) pairs and the edge
    list only; per-round cost is |frontier-adjacent edges|, the
    textbook distributed BFS bound.

    Lineage discipline (same reasoning as ``cluster.
    connected_components``): the edge list is ``localCheckpoint``ed
    ONCE so an expensive upstream pair-generation plan executes once,
    not once per round (measured 19 s → ~4 s at sf0.1 over MinHash
    pairs); each round's frontier is checkpointed too, because round h
    references round h-1 TWICE (anti-join + union) — left lazy, the
    frontier plan re-expands 2^h times.

    The checkpoints are LAZY (r8, guide §2.4 "remove shuffles/barriers
    outright"): ``localCheckpoint(eager=False)`` truncates the LOGICAL
    plan immediately (so the 2^h re-expansion still cannot happen — all
    references share one RDD), but stops forcing a blocking job per
    round; the whole expansion runs as one scheduled action whose
    stages reuse each round's shuffle output. Every checkpointed frame
    here sits directly above a shuffle (distinct / the verified pair
    join), so a second stage reading the same RDD re-reads shuffle
    files, never recomputes the upstream plan. Measured at sf0.1 over
    MinHash pairs: 4.3 s → 3.1 s median, identical rows.
    """
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .unionByName(edges.select(F.col(dst).alias("s"), F.col(src).alias("t")))
        .localCheckpoint(eager=False)
    )
    dist = (
        seeds.select(F.col(node_col).alias("node"))
        .distinct()
        .select("node", F.lit(0).alias("hops"))
        .localCheckpoint(eager=False)
    )
    frontier = dist
    for h in range(1, int(max_hops) + 1):
        nxt = (
            frontier.join(sym, frontier["node"] == sym["s"])
            .select(F.col("t").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .select("node", F.lit(h).alias("hops"))
            .localCheckpoint(eager=False)
        )
        dist = dist.unionByName(nxt)
        frontier = nxt
    return dist.select("node", F.col("hops").cast("long").alias("hops"))


def kcore_peel(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-round k-core peeling: repeatedly remove nodes with degree
    < ``k`` (degrees recomputed over the SURVIVING subgraph each
    round). After enough rounds the survivors are exactly the k-core —
    the densest near-dup neighborhoods, i.e. boilerplate/template
    families a degree threshold alone overcounts (a hub's neighbors
    inflate its degree even when they are not mutually dense).

    The round count is a LITERAL (not run-to-fixpoint) so the
    differential oracle can unroll it — ``rounds`` is an upper bound;
    real near-dup graphs converge in a few rounds because each round
    strips a whole fringe layer. Same lineage discipline as
    :func:`bfs_hops`: the edge list checkpoints once, survivors
    checkpoint per round; per-round cost is one degree aggregation +
    two semi-joins — (node, degree) shuffles only.

    OUTPUT CONTRACT: ``in_kcore`` means "survived ``rounds`` peels",
    which equals true k-core membership only once the peeling has
    converged (a round removes nothing). ``tests/test_round5_ops.py``
    asserts convergence at every shipped SF by checking rounds and
    rounds+1 produce identical output; callers on deeper graphs should
    do the same or raise ``rounds``. Self-loops are dropped and
    duplicate edges collapsed here (degree = COUNT(*) over the distinct
    symmetric edge list), so multigraph input cannot inflate degrees.

    Output: (node, core_degree, in_kcore) over ALL nodes of the input
    edge list; ``core_degree`` is the node's degree inside the
    surviving subgraph after the final round (0 for peeled nodes).
    """
    # lazy checkpoints (r8): truncate the per-round logical plan (the
    # round-h frame is referenced by the degree pass AND both semi-join
    # probes) without forcing a blocking job per round — every
    # checkpointed frame sits above a shuffle (dropDuplicates /
    # distinct / the semi-join exchanges), so stage-level shuffle reuse
    # serves repeat readers. Same move as bfs_hops; see its docstring.
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .unionByName(edges.select(F.col(dst).alias("s"), F.col(src).alias("t")))
        .where(F.col("s") != F.col("t"))
        .dropDuplicates(["s", "t"])
        .localCheckpoint(eager=False)
    )
    all_nodes = (
        sym.select(F.col("s").alias("node")).distinct().localCheckpoint(eager=False)
    )
    live = sym
    for _ in range(int(rounds)):
        keep = (
            live.groupBy("s")
            .agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") >= k)
            .select(F.col("s").alias("kn"))
        )
        live = (
            live.join(keep.withColumnRenamed("kn", "s"), "s", "left_semi")
            .join(keep.select(F.col("kn").alias("t")), "t", "left_semi")
            .localCheckpoint(eager=False)
        )
    final_deg = live.groupBy("s").agg(F.count(F.lit(1)).alias("fdeg"))
    return (
        all_nodes.join(
            final_deg.select(F.col("s").alias("node"), F.col("fdeg")), "node", "left"
        )
        .select(
            "node",
            F.coalesce("fdeg", F.lit(0)).cast("long").alias("core_degree"),
            (F.coalesce("fdeg", F.lit(0)) >= k).alias("in_kcore"),
        )
    )


def _hits_driver(spark: SparkSession, arc_rows, iters: int, prec: int) -> DataFrame:
    """Small-graph fast path for :func:`hits_scores`: the identical
    recurrence over the collected arc list, sorted node and arc orders
    (run-to-run identical float accumulation — the
    :func:`_pagerank_driver` rationale)."""
    arcs = sorted(arc_rows, key=lambda r: (r.src, r.dst))
    nodes = sorted({r.src for r in arcs} | {r.dst for r in arcs})
    n = len(nodes)
    hub = {v: 1.0 / n for v in nodes}
    auth = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        na = {v: 0.0 for v in nodes}
        for r in arcs:
            na[r.dst] += hub[r.src] * r.w
        sa = sum(na[v] for v in nodes)
        auth = {v: (na[v] / sa if sa > 0 else 0.0) for v in nodes}
        nh = {v: 0.0 for v in nodes}
        for r in arcs:
            nh[r.src] += auth[r.dst] * r.w
        sh = sum(nh[v] for v in nodes)
        hub = {v: (nh[v] / sh if sh > 0 else 0.0) for v in nodes}
    out = [(v, round(hub[v], prec) + 0.0, round(auth[v], prec) + 0.0) for v in nodes]
    schema = "node string, hub double, authority double"
    if nodes and not isinstance(nodes[0], str):
        schema = "node long, hub double, authority double"
    return spark.createDataFrame(out, schema=schema)


def hits_scores(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    iters: int = 10,
    prec: int = 6,
    driver_threshold: int = 1_000_000,
    probe_every: int = 5,
) -> DataFrame:
    """Kleinberg HITS over a weighted arc list: mutually-recursive hub
    and authority scores (``auth ← Σ_in hub·w``, then ``hub ← Σ_out
    auth·w``), L1-normalized after each half-step so both vectors stay
    probability-shaped for the differential gate. A DIFFERENT ranking
    kernel from PageRank — no teleport, no dangling mass, and the two
    scores separate "states that feed important states" (hubs) from
    "states important flows land on" (authorities), which one PageRank
    score conflates.

    Same size-adaptive strategy as :func:`pagerank`: ≤
    ``driver_threshold`` arcs run the fixed recurrence as a sorted
    driver loop; above it, each half-step is one hash join + keyed
    aggregation over ``(node, score)`` pairs against the once-placed
    arc list, the L1 norm is a 1-row broadcast scalar, and
    ``localCheckpoint`` truncates lineage per round. Multi-edges are
    collapsed by summing weights; fixed ``iters`` keeps both the job
    count and the oracle unroll bounded.
    """
    from pyspark import StorageLevel

    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    arcs = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_arcs = arcs.count()
    spark = edges.sparkSession
    if n_arcs == 0:
        arcs.unpersist()
        t = edges.schema[src].dataType.simpleString()
        return spark.createDataFrame(
            [], schema=f"node {t}, hub double, authority double"
        )
    if n_arcs <= driver_threshold:
        rows = arcs.collect()
        arcs.unpersist()
        return _hits_driver(spark, rows, iters, prec)

    nodes = (
        arcs.select(F.col("src").alias("node"))
        .unionByName(arcs.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_nodes = nodes.count()

    # same checkpoint-block bookkeeping as pagerank: per-round
    # localCheckpoints otherwise accumulate for the session's lifetime
    jsc = spark.sparkContext._jsc

    def _rdd_ids() -> set[int]:
        return {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}

    def _free(ids: set[int]) -> None:
        it = jsc.getPersistentRDDs().entrySet().iterator()
        while it.hasNext():
            e = it.next()
            if int(e.getKey()) in ids:
                e.getValue().unpersist(False)

    pre = _rdd_ids()
    hub = nodes.select("node", F.lit(1.0 / n_nodes).alias("s")).localCheckpoint(
        eager=False
    )
    auth = hub

    def _half_step(scores: DataFrame, key_in: str, key_out: str) -> DataFrame:
        """One HITS half-step: push `scores` across arcs from key_in to
        key_out, L1-normalize, return the new (node, s) frame."""
        agg = (
            arcs.join(scores.withColumnRenamed("node", key_in), key_in)
            .groupBy(F.col(key_out).alias("node"))
            .agg(F.sum(F.col("s") * F.col("w")).alias("m"))
        )
        total = agg.agg(F.coalesce(F.sum("m"), F.lit(0.0)).alias("t"))
        return (
            nodes.join(agg, "node", "left")
            .crossJoin(F.broadcast(total))
            .select(
                "node",
                F.when(
                    F.col("t") > 0,
                    F.coalesce(F.col("m"), F.lit(0.0)) / F.col("t"),
                )
                .otherwise(F.lit(0.0))
                .alias("s"),
            )
            .localCheckpoint(eager=False)
        )

    for it in range(iters):
        auth = _half_step(hub, "src", "dst")
        hub = _half_step(auth, "dst", "src")
        # Batched invariant probe (every probe_every rounds + final):
        # the vector stays L1-normalized — OR collapses to exactly zero
        # (all-zero weights), which the driver fast path also yields
        # (``sa > 0 else 0.0``). The L1 normalization itself is a
        # broadcast scalar INSIDE each half-step's plan, not this
        # probe, so skipping the probe changes no arithmetic; it only
        # drops a per-round job + full score-frame pass + driver
        # barrier (same argument as pagerank). ValueError, not assert,
        # so the check survives ``python -O`` and degenerate graphs
        # behave identically on both sides of the size split.
        if (it + 1) % probe_every == 0 or it == iters - 1:
            s = hub.agg(F.sum("s")).collect()[0][0]
            if s != 0.0 and abs(s - 1.0) >= 1e-6:
                raise ValueError(f"hub mass drifted: {s}")
    mid = _rdd_ids()
    out = (
        hub.withColumnRenamed("s", "h")
        .join(auth.withColumnRenamed("s", "a"), "node")
        .select(
            "node",
            F.round(F.col("h"), prec).alias("hub"),
            F.round(F.col("a"), prec).alias("authority"),
        )
        .localCheckpoint()
    )
    _free(mid - pre)
    arcs.unpersist()
    nodes.unpersist()
    return out
