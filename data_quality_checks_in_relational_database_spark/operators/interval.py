"""Range / interval joins without the cartesian explosion.

The reference engine has no temporal-proximity operator at all (its
only join is the 2-key reconciliation full-outer,
data_consistency_checks.py:95-118); these are SURVEY §2.8 north-star
extensions for event-stream QA (burst detection, duplicate-submission
hunts, sensor-debounce checks).

A naive "pairs within delta" query is the theta self-join
``a.ts BETWEEN b.ts - delta AND b.ts + delta`` — O(n^2) probes that no
distributed engine survives at 100 TB. The scale-safe shape used here
buckets time by the window width so every qualifying pair shares a
bucket or lands in adjacent buckets; the join is then a plain EQUI-join
on (key, bucket) — shuffle-partitionable, AQE-skew-splittable — and
the exact |t_a - t_b| <= delta predicate only filters the bucket-local
candidates. Candidate volume is O(rows per 2*delta window), which is
the output's own order of magnitude.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def close_pairs(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    delta_seconds: int,
) -> DataFrame:
    """All same-key row pairs whose timestamps differ by <= delta.

    Output: (key, id_a, id_b, delta_us) with id_a < id_b, one row per
    unordered pair. Timestamps compare at MICROSECOND precision
    (``unix_micros`` — exact integer math, no double rounding).

    Plan shape: rows get bucket b = floor(us / delta_us); the left side
    is replicated to probe buckets {b, b+1} (a 2x flatmap, not a
    shuffle), the join is equi on (key, probe_bucket), and each
    unordered pair is matched EXACTLY once by construction:

    - same-bucket pairs: matched via the self-probe, taken only when
      ``probe.id < base.id``;
    - adjacent-bucket pairs: matched only via the lower row's b+1
      probe (the higher row's probes never reach a lower bucket).

    so no dropDuplicates pass is needed — the dedup is free.
    """
    # cast: parquet TIMESTAMP_NTZ is rejected by unix_micros; session tz
    # is pinned UTC (session.py) so NTZ->LTZ is numerically identity
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    delta_us = int(delta_seconds) * 1_000_000
    base = df.select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("rid"),
        us.alias("t"),
        F.floor(us / delta_us).alias("b"),
    )
    probe = base.select(
        "k",
        F.col("rid").alias("rid_p"),
        F.col("t").alias("t_p"),
        F.col("b").alias("b_p"),
        F.explode(F.array(F.col("b"), F.col("b") + 1)).alias("probe_b"),
    )
    same_bucket = (F.col("b_p") == F.col("b")) & (F.col("rid_p") < F.col("rid"))
    next_bucket = F.col("b_p") < F.col("b")
    joined = probe.join(
        base,
        (probe["k"] == base["k"])
        & (F.col("probe_b") == F.col("b"))
        & (same_bucket | next_bucket),
    )
    close = joined.filter(F.abs(F.col("t_p") - F.col("t")) <= delta_us)
    return close.select(
        probe["k"].alias(key_col),
        F.least("rid_p", "rid").alias("id_a"),
        F.greatest("rid_p", "rid").alias("id_b"),
        F.abs(F.col("t_p") - F.col("t")).alias("delta_us"),
    )


def overlap_pairs(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    id_col: str,
    bucket_width: int,
) -> DataFrame:
    """All same-key row pairs whose [start, end] intervals overlap
    (closed intervals: touching endpoints count).

    Output: (key, id_a, id_b, overlap_amount) with id_a < id_b, one row
    per unordered pair. ``start``/``end`` must be integer-valued columns
    (e.g. epoch days via ``datediff``); ``overlap_amount`` is
    ``min(e) - max(s)`` in the same units (0 = endpoint touch).

    Scale shape: the naive form is the theta self-join
    ``a.s <= b.e AND b.s <= a.e`` — O(n²) probes per key. Here every
    interval is exploded to the width-``bucket_width`` buckets it
    covers (``floor(s/W) .. floor(e/W)`` — bounded fan-out of
    ``len/W + 1`` rows per interval), the join is a plain EQUI-join on
    (key, bucket), and each qualifying pair is counted EXACTLY once
    with no dedup pass: only the bucket containing the overlap's start
    (``floor(max(s_a, s_b) / W)``) emits it — both intervals cover that
    bucket by construction, and it is unique per pair. Candidate volume
    is Σ per-bucket-cooccupancy², the data's actual temporal density,
    not n². Pick ``bucket_width`` ≈ the typical interval length: much
    smaller multiplies the explode fan-out, much larger multiplies
    bucket co-occupancy.
    """
    w = int(bucket_width)
    base = df.select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("rid"),
        F.col(start_col).cast("long").alias("s"),
        F.col(end_col).cast("long").alias("e"),
    )
    exploded = base.select(
        "k",
        "rid",
        "s",
        "e",
        F.explode(F.sequence(F.floor(F.col("s") / w), F.floor(F.col("e") / w))).alias(
            "bucket"
        ),
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    pairs = a.join(
        b,
        (F.col("a.k") == F.col("b.k"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.rid") < F.col("b.rid")),
    ).filter(
        (F.col("a.s") <= F.col("b.e"))
        & (F.col("b.s") <= F.col("a.e"))
        # emit only in the overlap-start bucket: free exactly-once dedup
        & (
            F.col("a.bucket")
            == F.floor(F.greatest(F.col("a.s"), F.col("b.s")) / w)
        )
    )
    return pairs.select(
        F.col("a.k").alias(key_col),
        F.col("a.rid").alias("id_a"),
        F.col("b.rid").alias("id_b"),
        (
            F.least(F.col("a.e"), F.col("b.e"))
            - F.greatest(F.col("a.s"), F.col("b.s"))
        ).alias("overlap_amount"),
    )


def overlap_pair_counts(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    id_col: str,
    bucket_width: int,
) -> DataFrame:
    """Per-key count of overlapping interval pairs plus total overlap
    mass — the concurrency / double-booking report. Keys with ≥ 1
    overlapping pair only."""
    return (
        overlap_pairs(df, key_col, start_col, end_col, id_col, bucket_width)
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_overlapping_pairs"),
            F.sum("overlap_amount").alias("total_overlap"),
        )
    )


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    bucket_width: int,
    left_cols: tuple[str, str, str] = ("id", "s", "e"),
    right_cols: tuple[str, str, str] = ("id", "s", "e"),
) -> DataFrame:
    """Two-table interval-overlap join: every (left, right) pair with
    the same key whose closed [start, end] intervals intersect —
    without the O(|L|·|R|) theta join (the shape Databricks range-join
    hints optimize; here expressed with portable primitives).

    ``left_cols`` / ``right_cols`` name each side's (id, start, end)
    columns; output is (key, left_id, right_id, overlap_amount).

    Same bucket construction as :func:`overlap_pairs`, same
    exactly-once rule: each side explodes to the buckets its interval
    covers, the join is equi on (key, bucket), and only the bucket
    containing ``max(s_l, s_r)`` — covered by both sides by
    construction — emits the pair, so no dedup pass is needed.
    """
    w = int(bucket_width)

    def _stage(df: DataFrame, cols: tuple[str, str, str], side: str) -> DataFrame:
        i, s, e = cols
        return df.select(
            F.col(key_col).alias(f"k_{side}"),
            F.col(i).alias(f"id_{side}"),
            F.col(s).cast("long").alias(f"s_{side}"),
            F.col(e).cast("long").alias(f"e_{side}"),
        ).select(
            "*",
            F.explode(
                F.sequence(
                    F.floor(F.col(f"s_{side}") / w), F.floor(F.col(f"e_{side}") / w)
                )
            ).alias(f"b_{side}"),
        )

    l = _stage(left, left_cols, "l")
    r = _stage(right, right_cols, "r")
    joined = l.join(
        r, (F.col("k_l") == F.col("k_r")) & (F.col("b_l") == F.col("b_r"))
    ).filter(
        (F.col("s_l") <= F.col("e_r"))
        & (F.col("s_r") <= F.col("e_l"))
        & (F.col("b_l") == F.floor(F.greatest("s_l", "s_r") / w))
    )
    return joined.select(
        F.col("k_l").alias(key_col),
        F.col("id_l").alias("left_id"),
        F.col("id_r").alias("right_id"),
        (F.least("e_l", "e_r") - F.greatest("s_l", "s_r")).alias("overlap_amount"),
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key_col: str,
    bucket_width: int,
    point_cols: tuple[str, str] = ("id", "t"),
    interval_cols: tuple[str, str, str] = ("id", "s", "e"),
) -> DataFrame:
    """Point-in-interval join (event-in-window enrichment): each point
    matched to every same-key closed interval containing it. Points
    probe exactly ONE bucket (their own), intervals explode to the
    buckets they cover — the containing bucket is shared by
    construction, so each match is found exactly once with no dedup.

    Output: (key, point_id, interval_id, offset) where ``offset`` is
    ``t - start`` (position inside the window).
    """
    w = int(bucket_width)
    p = points.select(
        F.col(key_col).alias("k_p"),
        F.col(point_cols[0]).alias("point_id"),
        F.col(point_cols[1]).cast("long").alias("t"),
    ).withColumn("b_p", F.floor(F.col("t") / w))
    i, s, e = interval_cols
    iv = intervals.select(
        F.col(key_col).alias("k_i"),
        F.col(i).alias("interval_id"),
        F.col(s).cast("long").alias("s"),
        F.col(e).cast("long").alias("e"),
    ).select(
        "*",
        F.explode(
            F.sequence(F.floor(F.col("s") / w), F.floor(F.col("e") / w))
        ).alias("b_i"),
    )
    joined = p.join(
        iv, (F.col("k_p") == F.col("k_i")) & (F.col("b_p") == F.col("b_i"))
    ).filter((F.col("s") <= F.col("t")) & (F.col("t") <= F.col("e")))
    return joined.select(
        F.col("k_p").alias(key_col),
        "point_id",
        "interval_id",
        (F.col("t") - F.col("s")).alias("offset"),
    )


def overlap_stats(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per-key overlapping-pair count and total overlap mass WITHOUT
    materializing pairs — the sweep-line form of
    :func:`overlap_pair_counts` (identical output contract: keys with
    ≥ 1 overlapping pair, ``(key, n_overlapping_pairs,
    total_overlap)``).

    The pair join's output is inherently quadratic in per-key temporal
    density (k intervals covering one point → k²/2 pair rows before the
    aggregate). These aggregates don't need the pairs:

    - ``n_pairs = C(n,2) − #{(j,i): e_j < s_i}``: a pair FAILS to
      overlap exactly when one interval ends strictly before the other
      starts, and each failing pair is counted once at its later
      member. The subtrahend is a merge-sort sweep: union start/end
      events, order by (value, start-before-end), running end count
      read at each start.
    - ``total_overlap = Σ_p C(active(p),2) − n_pairs``: every
      overlapping pair shares ``overlap_amount + 1`` integer points,
      and summing C(active,2) over points counts exactly the shared
      points of all pairs. Computed segment-wise (boundary events
      ±1 at s and e+1, running active count × segment length), never
      per point.

    Cost: two keyed event-sweep window passes over 2n rows — O(n log n)
    per key, output-independent. Caveat: each key's sweep sorts in one
    task (the same bound as any keyed window); for a single pathological
    key hotter than a task, fall back to :func:`overlap_pair_counts`,
    whose bucket dimension spreads one key over many partitions.
    """
    from pyspark.storagelevel import StorageLevel

    base = (
        df.select(
            F.col(key_col).alias("k"),
            F.col(start_col).cast("long").alias("s"),
            F.col(end_col).cast("long").alias("e"),
        )
        .filter(F.col("s").isNotNull() & F.col("e").isNotNull())
        # both sweeps consume base through TWO union branches each (start
        # + end events) = four plan references, and exchange reuse can't
        # merge them (column pruning pushes a different projection into
        # each branch), so an unpinned base would scan the input four
        # times. Pin the 24-byte-per-row projection instead — the same
        # materialize-the-narrow-intermediate move the dedup pipeline
        # makes for shingle sets.
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Eager cache fill (the minhash_lsh_pairs move): four branches
    # hitting a cold cache concurrently serialize on block locks under
    # a deep DAG — the intermittent multi-second outliers the bench's
    # spread column exposed.
    base.count()
    # --- sweep 1: non-overlapping ordered pairs (e_j < s_i) ---------
    # events ordered by (val, typ): starts (typ 0) precede ends (typ 1)
    # at equal value, so the running end count at a start row counts
    # ends with val STRICTLY below — e_j = s_i is an overlap (touch).
    starts = base.select("k", F.col("s").alias("val"), F.lit(0).alias("typ"))
    ends = base.select("k", F.col("e").alias("val"), F.lit(1).alias("typ"))
    ev = starts.unionByName(ends)
    w_sweep = (
        Window.partitionBy("k")
        .orderBy("val", "typ")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ended_before = F.sum(F.col("typ")).over(w_sweep)
    miss = (
        ev.withColumn("ended_before", ended_before)
        .filter(F.col("typ") == 0)
        .groupBy("k")
        .agg(
            F.sum("ended_before").alias("n_miss"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    pairs_per_key = miss.select(
        "k",
        (F.col("n") * (F.col("n") - 1) / 2 - F.col("n_miss"))
        .cast("long")
        .alias("n_overlapping_pairs"),
    )
    # --- sweep 2: Σ over integer points of C(active, 2) -------------
    deltas = (
        base.select("k", F.col("s").alias("val"), F.lit(1).alias("delta"))
        .unionByName(
            base.select("k", (F.col("e") + 1).alias("val"), F.lit(-1).alias("delta"))
        )
        .groupBy("k", "val")
        .agg(F.sum("delta").alias("delta"))
    )
    w_run = (
        Window.partitionBy("k")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    active = F.sum("delta").over(w_run)
    nxt = F.lead("val").over(Window.partitionBy("k").orderBy("val"))
    shared_points = (
        deltas.select(
            "k",
            ((nxt - F.col("val")) * active * (active - 1) / 2).alias("seg"),
        )
        .groupBy("k")
        .agg(F.sum("seg").cast("long").alias("shared_points"))
    )
    return (
        pairs_per_key.join(shared_points, "k")
        .filter(F.col("n_overlapping_pairs") > 0)
        .select(
            F.col("k").alias(key_col),
            "n_overlapping_pairs",
            (F.col("shared_points") - F.col("n_overlapping_pairs")).alias(
                "total_overlap"
            ),
        )
    )


def close_pair_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    delta_seconds: int,
) -> DataFrame:
    """Per-key count of timestamp pairs within delta — the burst /
    duplicate-submission report. (key, n_close_pairs), keys with >= 1
    pair only."""
    return (
        close_pairs(df, key_col, ts_col, id_col, delta_seconds)
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_close_pairs"))
    )
