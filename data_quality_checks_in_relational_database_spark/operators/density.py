"""Density clustering over embedding columns: DBSCAN.

No counterpart in the reference; extension on the embedding-curation
side — DBSCAN separates dense semantic regions (topic cores) from
noise without fixing k, which is how near-dup islands and outlier
content get mapped before sampling decisions.

Built ENTIRELY from the engine's existing scale-shaped primitives:

- ε-neighborhood pairs: :func:`..operators.similarity.
  cosine_allpairs_blockjoin` — the exact blocked all-pairs self-join
  (B·n·dim shuffle, bounded task memory, nothing on the driver); at
  production thresholds swap in ``hyperplane_lsh_neardup`` candidates
  exactly as the semantic-dedup pipeline documents;
- degrees / core flags: one keyed aggregation over the pair list;
- clusters: :func:`..operators.cluster.connected_components` over the
  core-core subgraph (size-adaptive union-find / distributed min-label);
- border assignment: one join from non-core points to their core
  neighbors' clusters, MIN-cluster rule pinned for determinism (vanilla
  DBSCAN leaves the choice arbitrary; a differential gate cannot).

Output roles follow the textbook definitions: core = |N_ε(p)| ≥
min_pts (the neighborhood INCLUDES p itself), border = non-core with a
core ε-neighbor, noise = the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.operators.cluster import connected_components
from data_quality_checks_in_relational_database_spark.operators.similarity import (
    cosine_allpairs_blockjoin,
)


def dbscan(
    df: DataFrame,
    eps_cosine: float = 0.4,
    min_pts: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_blocks: int = 8,
    neighbor_pairs: DataFrame | None = None,
) -> DataFrame:
    """DBSCAN where "within ε" means cosine ≥ ``eps_cosine``. Returns
    one row per input vector: ``(id, n_neighbors, role, cluster_id)``
    with ``cluster_id`` = the component's minimum core id (NULL for
    noise). A core point whose ε-neighbors are all non-core still
    anchors its own cluster (its component is the singleton {p}).

    ``neighbor_pairs`` swaps the ε-pair source: pass the output of a
    candidate-generating path (e.g. ``similarity.srp_banded_neardup``
    at the SAME threshold) instead of the exact blocked all-pairs join
    — everything downstream (degrees, roles, components, borders) is
    identical, so when the candidate path's recall is 1.0 the result
    hash-matches the exact form's oracle."""
    pairs = (
        (
            neighbor_pairs
            if neighbor_pairs is not None
            else cosine_allpairs_blockjoin(
                df,
                threshold=eps_cosine,
                num_blocks=num_blocks,
                vec_col=vec_col,
                id_col=id_col,
            )
        )
        .select(F.col("vec_id_a").alias("a"), F.col("vec_id_b").alias("b"))
        # the ε-pair list is referenced ~4× below (degrees, core-core
        # subgraph, components, border join); it is the THRESHOLD
        # SURVIVORS — bounded by near-dup density, not the corpus — so
        # one eager localCheckpoint runs the blocked all-pairs join
        # exactly once and cuts the lineage for every consumer
        .localCheckpoint()
    )
    sym = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("n_neighbors"))
    ids = df.select(F.col(id_col).alias("a"))
    all_deg = (
        ids.join(deg, "a", "left")
        .select("a", F.coalesce("n_neighbors", F.lit(0)).cast("long").alias("n_neighbors"))
    )
    core = all_deg.where(F.col("n_neighbors") + 1 >= min_pts).select(
        F.col("a").alias("core_id")
    )
    core_edges = (
        pairs.join(core.withColumnRenamed("core_id", "a"), "a")
        .join(core.withColumnRenamed("core_id", "b"), "b")
        .select("a", "b")
    )
    comp = connected_components(core_edges, "a", "b")  # (node, cluster_id)
    core_clusters = core.join(
        comp, core["core_id"] == comp["node"], "left"
    ).select(
        "core_id", F.coalesce("cluster_id", F.col("core_id")).alias("cluster_id")
    )
    # border: non-core point adjacent to ≥1 core; MIN cluster id wins
    border = (
        sym.join(core_clusters, sym["b"] == core_clusters["core_id"])
        .join(core.withColumnRenamed("core_id", "a"), "a", "left_anti")
        .groupBy("a")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    labeled = core_clusters.select(
        F.col("core_id").alias("a"), F.lit("core").alias("role"), "cluster_id"
    ).unionByName(border.select("a", F.lit("border").alias("role"), "cluster_id"))
    out = all_deg.join(labeled, "a", "left").select(
        F.col("a").alias(id_col),
        "n_neighbors",
        F.coalesce("role", F.lit("noise")).alias("role"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )
    return out
