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
    for _ in range(iters):
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
        # materialize the lazy checkpoint with a scalar probe that is
        # also the invariant: total rank mass must stay 1 (fp-noise)
        total = ranks.agg(F.sum("r")).collect()[0][0]
        assert abs(total - 1.0) < 1e-6, f"rank mass drifted: {total}"
    mid = _rdd_ids()
    out = ranks.select("node", F.round(F.col("r"), prec).alias("rank")).localCheckpoint()
    _free(mid - pre)
    norm.unpersist()
    nodes.unpersist()
    srcs.unpersist()
    return out


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
    """
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .unionByName(edges.select(F.col(dst).alias("s"), F.col(src).alias("t")))
        .localCheckpoint()
    )
    dist = (
        seeds.select(F.col(node_col).alias("node"))
        .distinct()
        .select("node", F.lit(0).alias("hops"))
        .localCheckpoint()
    )
    frontier = dist
    for h in range(1, int(max_hops) + 1):
        nxt = (
            frontier.join(sym, frontier["node"] == sym["s"])
            .select(F.col("t").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .select("node", F.lit(h).alias("hops"))
            .localCheckpoint()
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
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .unionByName(edges.select(F.col(dst).alias("s"), F.col(src).alias("t")))
        .where(F.col("s") != F.col("t"))
        .dropDuplicates(["s", "t"])
        .localCheckpoint()
    )
    all_nodes = sym.select(F.col("s").alias("node")).distinct().localCheckpoint()
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
            .localCheckpoint()
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
