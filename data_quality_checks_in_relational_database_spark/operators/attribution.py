"""Data-driven multi-touch attribution: Markov removal effects.

No counterpart in the reference; extension on the event-analytics side
— the standard upgrade from positional (first/last-touch) attribution:
model journeys as a first-order Markov chain over channels with
absorbing CONV / NULL states, and credit each channel by how much the
chain's conversion probability drops when the channel is removed
(Anderl et al., "Mapping the customer journey", Int. J. Research in
Marketing 2016 — the public "removal effect" formulation).

Scale split (the same contract as PCA's eigh): the CORPUS-sized work —
ordering each user's events, truncating at first conversion, counting
(state -> state) transitions — is one window pass plus one keyed
aggregation, fully distributed. What reaches the driver is the
transition-count MATRIX, bounded by (#channels + 3)², never by users
or events; the absorption math runs there as a fixed-step value
iteration (deterministic, replayable by the differential oracle's
unrolled SQL — a convergence test would not be).

Removal semantics: deleting channel c re-routes every transition INTO
c to NULL (journeys needing c fail) and drops c's outgoing row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

START = "START"
CONV = "CONV"
NULL = "NULL"


def journey_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    conv_type: str = "purchase",
) -> DataFrame:
    """First-order transition counts over per-user journeys truncated
    at the FIRST conversion event: START -> e1 -> ... -> CONV (if the
    user converted) or -> NULL (journey ended unconverted). One window
    pass + one keyed aggregation; output is (src, dst, n), bounded by
    the channel vocabulary."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    seq = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("s"),
        F.row_number().over(w).alias("rn"),
        F.min(F.when(F.col(type_col) == conv_type, F.row_number().over(w)))
        .over(Window.partitionBy(user_col))
        .alias("conv_rn"),
    )
    # keep pre-conversion steps; the conversion event itself becomes CONV
    kept = seq.where(F.col("conv_rn").isNull() | (F.col("rn") <= F.col("conv_rn")))
    state = F.when(F.col("s") == conv_type, F.lit(CONV)).otherwise(F.col("s"))
    w2 = Window.partitionBy("u").orderBy("rn")
    hops = kept.select(
        F.coalesce(F.lag(state).over(w2), F.lit(START)).alias("src"),
        state.alias("dst"),
        "u",
        "rn",
    )
    # terminal hop for unconverted journeys: last state -> NULL
    last_rn = Window.partitionBy("u")
    tails = (
        kept.withColumn("max_rn", F.max("rn").over(last_rn))
        .where(F.col("conv_rn").isNull() & (F.col("rn") == F.col("max_rn")))
        .select(state.alias("src"), F.lit(NULL).alias("dst"))
    )
    return (
        hops.select("src", "dst")
        .unionByName(tails)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _absorption(prob: dict, channels: list, iters: int) -> float:
    """T-step value iteration for P(reach CONV | START) on the chain
    given by ``prob[(src, dst)]``. Deterministic: fixed steps, states
    iterated in sorted order."""
    states = [START] + sorted(channels)
    adj: dict = {s: [] for s in states}
    for (src, t), p in sorted(prob.items()):
        if src in adj:
            adj[src].append((t, p))
    v = {s: 0.0 for s in states}
    v[CONV] = 1.0
    v[NULL] = 0.0
    for _ in range(iters):
        nv = {s: sum(p * v[t] for t, p in adj[s]) for s in states}
        for s in states:
            v[s] = nv[s]
    return v[START]


def markov_removal_effects(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    conv_type: str = "purchase",
    iters: int = 20,
    prec: int = 6,
) -> DataFrame:
    """Removal-effect attribution report: one row per channel with the
    T-step conversion probability when the channel is removed, the
    removal effect 1 - p_removed/p_base, and the normalized
    attribution share. The collected transition matrix is bounded by
    (#channels + 3)² — a sketch-sized driver pull, documented here."""
    tc = journey_transitions(
        events, user_col, ts_col, type_col, tiebreak_col, conv_type
    )
    rows = tc.collect()  # bounded: channel-vocabulary², not data volume
    counts = {(r["src"], r["dst"]): r["n"] for r in rows}
    channels = sorted(
        ({s for s, _ in counts} | {t for _, t in counts}) - {START, CONV, NULL}
    )
    out_tot = {}
    for (s, _), n in counts.items():
        out_tot[s] = out_tot.get(s, 0) + n
    prob = {(s, t): n / out_tot[s] for (s, t), n in counts.items()}
    p_base = _absorption(prob, channels, iters)
    out = []
    for c in channels:
        # re-route transitions into c to NULL; drop c's outgoing row
        varp = {}
        for (s, t), p in prob.items():
            if s == c:
                continue
            key = (s, NULL) if t == c else (s, t)
            varp[key] = varp.get(key, 0.0) + p
        p_rm = _absorption(varp, [x for x in channels if x != c], iters)
        effect = 1.0 - (p_rm / p_base) if p_base > 0 else 0.0
        out.append((c, p_rm, effect))
    tot_eff = sum(e for _, _, e in out)
    spark = events.sparkSession
    return spark.createDataFrame(
        [
            (
                c,
                round(p_base, prec) + 0.0,
                round(p_rm, prec) + 0.0,
                round(e, prec) + 0.0,
                round(e / tot_eff, prec) + 0.0 if tot_eff > 0 else None,
            )
            for c, p_rm, e in out
        ],
        schema="channel string, p_base double, p_removed double, "
        "removal_effect double, share double",
    )
