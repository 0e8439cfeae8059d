"""Duplicate-cluster resolution: near-dup PAIRS → connected components
→ one representative per cluster.

This is the last stage of the web-scale dedup recipe (exact → MinHash
candidates → verified pairs → **components** → keep-list): pairwise
output alone over-removes (A~B, B~C must collapse to ONE keeper even
when A~C wasn't emitted). No counterpart in the reference (pandas,
single table — ``data_consistency_checks.py`` has no dedup at all);
this is a BASELINE.json training-data-pipeline extension.

Scale design: iterative min-label propagation over the edge list —
each round is one keyed aggregation (min over neighbors' labels) and
one join, both shuffling (node, label) pairs only; rounds needed =
graph diameter. Duplicate clusters in real corpora are shallow (near
-clique — diameter ≤ 3-4), so this converges in a handful of rounds;
for adversarial chain-shaped graphs switch to the large-star/small-star
variant (Kiveris et al., "Connected Components in MapReduce", SoCC'14)
which converges in O(log² n) rounds with the same per-round shape.
Each round materializes (persist + count) so the driver sees the
converged flag and lineage stays bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "doc_id_a",
    id_b: str = "doc_id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node in the pair graph with its component's minimum
    id. Output: ``(node, cluster_id)`` — one row per node that appears
    in at least one pair.

    Min-label propagation: ``label(v) ← min(label(v), min over
    neighbors' labels)`` until a fixed point. Exact (no approximation);
    raises if ``max_iter`` rounds don't converge rather than returning
    a partial labeling.
    """
    from pyspark import StorageLevel

    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # Every round MUST truncate lineage (localCheckpoint), not merely
    # persist: each round's plan references the previous round's twice
    # (neighbor join + convergence diff), so the un-truncated logical
    # plan doubles per round and the DRIVER dies analyzing it long
    # before any executor runs out. On a real cluster with executor
    # churn, prefer reliable checkpoint() to HDFS/object storage —
    # localCheckpoint trades fault-tolerance for speed.
    labels = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("nbr_min"))
        .select(F.col("src").alias("node"), F.least("src", "nbr_min").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # min label among each node's neighbors, then keep-the-smaller
        nbr = (
            sym.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr.withColumnRenamed("src", "node"), "node", "left")
            .select(
                "node",
                F.least("label", F.coalesce("nbr_min", "label")).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            sym.unpersist()
            return labels.select(F.col("node"), F.col("label").alias("cluster_id"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "doc_id_a",
    id_b: str = "doc_id_b",
) -> DataFrame:
    """Cluster report over near-dup pairs: ``(doc_id, cluster_id,
    cluster_size, is_representative)``.

    ``cluster_id`` is the component's min doc id; the representative is
    that same doc (deterministic keep-first, matching
    :func:`~.dedup.dedup_exact`'s convention). Docs in no pair are not
    emitted — at the pipeline level they are trivially their own
    keepers and carrying them through the component join would shuffle
    the whole corpus for no information.
    """
    comp = connected_components(pairs, id_a, id_b)
    sizes = comp.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(sizes, "cluster_id")
        .select(
            F.col("node").alias("doc_id"),
            "cluster_id",
            "cluster_size",
            (F.col("node") == F.col("cluster_id")).alias("is_representative"),
        )
    )


def removal_list(clusters: DataFrame) -> DataFrame:
    """Doc ids to DROP: every cluster member except its representative.
    The complement ("keep-list") is the full corpus anti-joined with
    this — cheaper to materialize the small side."""
    return clusters.filter(~F.col("is_representative")).select("doc_id")
