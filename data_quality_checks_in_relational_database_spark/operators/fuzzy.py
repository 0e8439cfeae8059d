"""Blocked fuzzy matching (edit-distance record linkage).

The reference reconciles rows by EXACT 2-key equality
(data_consistency_checks.py:95-118); real catalogs also need the fuzzy
variant — "these two part names are one typo apart" — which is a
classic entity-resolution primitive for training-data curation
(merging near-identical product/entity strings before dedup).

All-pairs Levenshtein is O(n^2 * L^2) and non-negotiably dead at
100 TB. The standard scale shape is BLOCKING: pairs are only compared
inside a cheap equi-join block (brand + first name token here), which
Spark executes as an ordinary shuffled/broadcast hash join; the
quadratic cost is confined to each block. Blocking is a documented
recall tradeoff (a typo in the BLOCKING key hides the pair) — pick
block keys from fields the upstream system controls (brand codes),
not free text, and add a second pass with a different block key if
recall matters more than cost (multi-pass blocking).

``levenshtein`` runs JVM-side (codegen'd) — no Python boundary.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_cols: Sequence[Column | str],
    max_dist: int,
) -> DataFrame:
    """All within-block pairs with levenshtein(text_a, text_b) <= max_dist.

    Output: (id_a, id_b, dist) with id_a < id_b. The equi-join on the
    block key is the only shuffle; ``a.id < b.id`` halves the candidate
    matrix and makes each unordered pair appear exactly once.
    """
    blocks = [
        (F.col(c) if isinstance(c, str) else c).alias(f"blk{i}")
        for i, c in enumerate(block_cols)
    ]
    side = df.select(
        F.col(id_col).alias("rid"),
        F.col(text_col).alias("txt"),
        F.length(text_col).alias("len"),
        *blocks,
    )
    a, b = side.alias("a"), side.alias("b")
    cond = F.col("a.rid") < F.col("b.rid")
    for i in range(len(block_cols)):
        cond = cond & (F.col(f"a.blk{i}") == F.col(f"b.blk{i}"))
    # length prefilter INSIDE the join condition: |len_a − len_b| is a
    # lower bound on edit distance, so over-length pairs are discarded
    # in the hash-join probe before any O(L²) levenshtein runs
    cond = cond & (
        F.abs(F.col("a.len") - F.col("b.len")) <= F.lit(max_dist)
    )
    # bounded levenshtein (Spark 3.5+): the DP early-terminates once the
    # distance provably exceeds the threshold — O(L·max_dist) per pair
    # instead of O(L²); returns −1 above the bound
    dist = F.levenshtein(F.col("a.txt"), F.col("b.txt"), int(max_dist))
    return (
        a.join(b, cond)
        .select(
            F.col("a.rid").alias("id_a"),
            F.col("b.rid").alias("id_b"),
            dist.alias("dist"),
        )
        .filter(F.col("dist") >= 0)
    )


def multi_pass_fuzzy_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_passes: Sequence[Sequence[Column | str]],
    max_dist: int,
) -> DataFrame:
    """Union of several blocking passes, deduplicated — the documented
    recall fix for single-key blocking (a typo in one blocking key
    hides a pair only if it breaks EVERY pass's key). Each pass is an
    independent equi-join; cost is additive, recall is the union.

    Output contract matches :func:`blocked_fuzzy_pairs`.
    """
    out = None
    for cols in block_passes:
        p = blocked_fuzzy_pairs(df, text_col, id_col, cols, max_dist)
        out = p if out is None else out.unionByName(p)
    return out.dropDuplicates(["id_a", "id_b"])
