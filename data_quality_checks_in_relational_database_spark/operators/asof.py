"""As-of (point-in-time) join — an operator Spark lacks natively,
composed from built-in DataFrame ops (SURVEY.md §2.3: "range/as-of
joins: built-in when needed").

Semantics: for each left row, attach the single right row with the
same key and the greatest right-timestamp ≤ the left-timestamp
(backward as-of, the standard market-data/point-in-time lookup).

Implementation is the merge-sort shape, not a range cross join: union
the two sides tagged, sort within key by (time, side), and carry the
most recent right payload forward with ``last(..., ignorenulls=True)``
over a running window. One shuffle on the key — the same cost as a
regular join — versus the quadratic blowup of a naive
``l.ts >= r.ts`` theta join. Skewed keys are handled by AQE the same
way any keyed shuffle is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
) -> DataFrame:
    """Backward as-of join. Output = all left columns + ``right_payload``
    columns (NULL when no right row precedes the left row).

    Ties (right_ts == left_ts) match, per standard ASOF semantics; among
    equal right timestamps the one sorting last wins deterministically
    via the (ts, side, payload) ordering.
    """
    lcols = left.columns
    l_tag = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__left"),
        F.lit(None).cast(right.select(*right_payload).schema).alias("__payload"),
    )
    r_tag = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(left.select(*lcols).schema).alias("__left"),
        F.struct(*right_payload).alias("__payload"),
    )
    merged = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal timestamps so ties match
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__payload").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn("__asof", F.last("__payload", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col("__left")[c].alias(c) for c in lcols],
        *[F.col("__asof")[c].alias(c) for c in right_payload],
    )
    return out
