"""As-of (point-in-time) join — an operator Spark lacks natively,
composed from built-in DataFrame ops (SURVEY.md §2.3: "range/as-of
joins: built-in when needed").

Semantics: for each left row, attach the single right row with the
same key and — per ``direction`` —

- ``backward`` (default): greatest right-ts ≤ left-ts (the standard
  market-data/point-in-time lookup);
- ``forward``: smallest right-ts ≥ left-ts (next-scheduled-event
  lookup);
- ``nearest``: whichever of the two is closer in absolute time
  (ties resolve backward — the deterministic pandas ``merge_asof``
  convention).

``tolerance_seconds`` bounds the match distance: a candidate farther
than the tolerance yields NULLs instead (pandas ``merge_asof``
``tolerance=``).

Implementation is the merge-sort shape, not a range cross join: union
the two sides tagged, sort within key by (time, side), and carry the
most recent right payload forward with ``last(..., ignorenulls=True)``
over a running window; ``forward`` runs the same carry over the
reversed ordering, and ``nearest`` evaluates both carries over the
SAME keyed exchange (Catalyst reuses the shuffle; only the sort
differs). One shuffle on the key — the same cost as a regular join —
versus the quadratic blowup of a naive ``l.ts >= r.ts`` theta join.
Skewed keys are handled by AQE the same way any keyed shuffle is.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """As-of join; output = all left columns + ``right_payload`` columns
    (NULL when no right row qualifies).

    Ties (right_ts == left_ts) match in every direction, per standard
    ASOF semantics; among equal right timestamps the payload sorting
    last wins deterministically via the (ts, side, payload) ordering.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    lcols = left.columns
    # the right event time rides inside the payload struct (__rt) so
    # tolerance/nearest logic can see the matched row's timestamp
    r_struct = F.struct(
        *[F.col(c) for c in right_payload],
        F.col(right_ts).cast("timestamp").alias("__rt"),
    )
    r_schema = right.select(r_struct.alias("__payload")).schema[0].dataType
    l_tag = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).cast("timestamp").alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__left"),
        F.lit(None).cast(r_schema).alias("__payload"),
    )
    r_tag = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).cast("timestamp").alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(left.select(*lcols).schema).alias("__left"),
        r_struct.alias("__payload"),
    )
    merged = l_tag.unionByName(r_tag)

    def carry(descending: bool) -> Column:
        # right rows sort before left rows at equal timestamps in BOTH
        # orientations (side asc), so ties match in every direction
        order = F.col("__t").desc() if descending else F.col("__t").asc()
        w = (
            Window.partitionBy("__k")
            .orderBy(order, F.col("__side").asc(), F.col("__payload").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("__payload", ignorenulls=True).over(w)

    t_long = F.col("__t").cast("long")

    def within_tol(cand: Column, dist: Column) -> Column:
        if tolerance_seconds is None:
            return cand
        return F.when(dist <= F.lit(int(tolerance_seconds)), cand)

    if direction == "backward":
        cand = carry(descending=False)
        chosen = within_tol(cand, t_long - cand["__rt"].cast("long"))
        carried = merged.withColumn("__asof", chosen)
    elif direction == "forward":
        cand = carry(descending=True)
        chosen = within_tol(cand, cand["__rt"].cast("long") - t_long)
        carried = merged.withColumn("__asof", chosen)
    else:  # nearest
        staged = merged.withColumn("__b", carry(descending=False)).withColumn(
            "__f", carry(descending=True)
        )
        db = t_long - F.col("__b")["__rt"].cast("long")
        df_ = F.col("__f")["__rt"].cast("long") - t_long
        b = within_tol(F.col("__b"), db)
        f_ = within_tol(F.col("__f"), df_)
        # ties (db == df_) resolve backward: the < is strict
        chosen = (
            F.when(b.isNull(), f_)
            .when(f_.isNull(), b)
            .when(df_ < db, f_)
            .otherwise(b)
        )
        carried = staged.withColumn("__asof", chosen)
    return carried.filter(F.col("__side") == 1).select(
        *[F.col("__left")[c].alias(c) for c in lcols],
        *[F.col("__asof")[c].alias(c) for c in right_payload],
    )
