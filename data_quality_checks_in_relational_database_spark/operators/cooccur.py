"""Co-occurrence / association mining over event streams — the
market-basket "lift" analysis (which behaviors travel together), used
for feature discovery and for DQ (an impossible pairing with high lift
flags instrumentation bugs). BASELINE.json event-analytics extension;
no counterpart in the reference.

Scale shape: events reduce to DISTINCT (entity, item) first (map-side
partial dedup), pair generation is a per-entity self-join bounded by
items-per-entity (small by domain: a user touches few event types),
and the lift arithmetic runs on the bounded (item a, item b) count
table with the item marginals broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cooccurrence_lift"]


def cooccurrence_lift(
    df: DataFrame,
    entity_col: str,
    item_col: str,
    min_pair_entities: int = 2,
) -> DataFrame:
    """Pairwise item lift over entities: for items a < b,
    ``lift = (n_ab · n_entities) / (n_a · n_b)`` with entity-level
    presence counts (an entity counts once per item no matter how many
    events). lift > 1 ⇒ the items co-occur more than independence
    predicts.

    Output: (item_a, item_b, n_a, n_b, n_ab, lift) — lift rounded to
    6dp; pairs seen in fewer than ``min_pair_entities`` entities are
    dropped (rare-pair lift is noise).
    """
    pres = df.select(
        F.col(entity_col).alias("e"), F.col(item_col).cast("string").alias("i")
    ).distinct()
    marg = pres.groupBy("i").agg(F.count(F.lit(1)).alias("n"))
    n_entities = pres.select("e").distinct().count()  # scalar: bounded driver value
    a, b = pres.alias("a"), pres.alias("b")
    pair = (
        a.join(b, (F.col("a.e") == F.col("b.e")) & (F.col("a.i") < F.col("b.i")))
        .groupBy(F.col("a.i").alias("item_a"), F.col("b.i").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_entities)
    )
    ma = marg.select(F.col("i").alias("item_a"), F.col("n").alias("n_a"))
    mb = marg.select(F.col("i").alias("item_b"), F.col("n").alias("n_b"))
    return (
        pair.join(F.broadcast(ma), "item_a")
        .join(F.broadcast(mb), "item_b")
        .select(
            "item_a",
            "item_b",
            F.col("n_a").cast("long"),
            F.col("n_b").cast("long"),
            F.col("n_ab").cast("long"),
            F.round(
                F.col("n_ab") * F.lit(float(n_entities)) / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )
