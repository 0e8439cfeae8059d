"""Markov removal-effect attribution over the events stream, with a
fully-unrolled DuckDB oracle: journey transitions in SQL windows, then
the SAME fixed-step value iteration as chained MATERIALIZED CTEs — one
chain for the base graph and one per removed channel.

The oracle hard-codes the channel vocabulary of the driver testdata
(click / error / signup / view, conversion = purchase); the Spark side
discovers channels dynamically, so a vocabulary change surfaces as a
loud parity failure rather than a silent skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_quality_checks_in_relational_database_spark.operators.attribution import (
    markov_removal_effects,
)
from data_quality_checks_in_relational_database_spark.session import load_tables

_ITERS = 20
_CHANNELS = ("click", "error", "signup", "view")
_CONV = "purchase"


def q_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Removal-effect credit per channel. The distributed part is the
    journey-transition aggregation (one window pass over events); the
    absorption math runs on the bounded transition matrix."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return markov_removal_effects(ev, conv_type=_CONV, iters=_ITERS)


def _chain(tag: str, probs_cte: str, iters: int) -> str:
    """CTE chain v{tag}0..v{tag}{iters} of the value iteration over
    ``probs_cte``."""
    out = [
        f""",
v{tag}0 AS MATERIALIZED (
    SELECT state, CASE WHEN state = 'CONV' THEN 1.0 ELSE 0.0 END AS v
    FROM nodes
)"""
    ]
    for i in range(1, iters + 1):
        out.append(
            f""",
v{tag}{i} AS MATERIALIZED (
    SELECT n.state,
           CASE WHEN n.state = 'CONV' THEN 1.0
                WHEN n.state = 'NULL' THEN 0.0
                ELSE COALESCE((SELECT SUM(p.prob * v.v)
                               FROM {probs_cte} p JOIN v{tag}{i - 1} v
                                 ON v.state = p.dst
                               WHERE p.src = n.state), 0.0)
           END AS v
    FROM nodes n
)"""
        )
    return "".join(out)


def _attribution_oracle(iters: int) -> str:
    nodes = ", ".join(
        f"('{s}')" for s in ("START", "CONV", "NULL") + _CHANNELS
    )
    head = f"""
WITH seq1 AS (
    SELECT user_id AS u, event_type AS s,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY epoch_us(ts), event_id) AS rn
    FROM events
),
seq2 AS (
    SELECT u, s, rn,
           MIN(CASE WHEN s = '{_CONV}' THEN rn END)
               OVER (PARTITION BY u) AS conv_rn
    FROM seq1
),
kept AS (
    SELECT u, rn,
           CASE WHEN s = '{_CONV}' THEN 'CONV' ELSE s END AS state,
           conv_rn
    FROM seq2
    WHERE conv_rn IS NULL OR rn <= conv_rn
),
hops AS (
    SELECT COALESCE(LAG(state) OVER (PARTITION BY u ORDER BY rn), 'START')
             AS src,
           state AS dst
    FROM kept
),
tails AS (
    SELECT state AS src, 'NULL' AS dst
    FROM (SELECT u, state, rn, conv_rn,
                 MAX(rn) OVER (PARTITION BY u) AS max_rn
          FROM kept)
    WHERE conv_rn IS NULL AND rn = max_rn
),
counts AS (
    SELECT src, dst, COUNT(*) AS n
    FROM (SELECT src, dst FROM hops UNION ALL SELECT src, dst FROM tails)
    GROUP BY src, dst
),
probs AS MATERIALIZED (
    SELECT src, dst,
           CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY src) AS prob
    FROM counts
),
nodes(state) AS (VALUES {nodes})"""
    chains = [_chain("b", "probs", iters)]
    for c in _CHANNELS:
        chains.append(
            f""",
probs_{c} AS MATERIALIZED (
    SELECT src, dst2 AS dst, SUM(prob) AS prob FROM (
        SELECT src,
               CASE WHEN dst = '{c}' THEN 'NULL' ELSE dst END AS dst2,
               prob
        FROM probs WHERE src != '{c}'
    ) GROUP BY src, dst2
)"""
        )
        chains.append(_chain(c, f"probs_{c}", iters))
    variant_rows = "\n    UNION ALL\n".join(
        f"""    SELECT '{c}' AS channel,
           (SELECT v FROM vb{iters} WHERE state = 'START') AS p_base,
           (SELECT v FROM v{c}{iters} WHERE state = 'START') AS p_removed"""
        for c in _CHANNELS
    )
    tail = f""",
results AS (
{variant_rows}
),
eff AS (
    SELECT channel, p_base, p_removed,
           CASE WHEN p_base > 0 THEN 1.0 - p_removed / p_base ELSE 0.0 END
             AS effect
    FROM results
)
SELECT channel,
       ROUND(p_base, 6) + 0.0 AS p_base,
       ROUND(p_removed, 6) + 0.0 AS p_removed,
       ROUND(effect, 6) + 0.0 AS removal_effect,
       ROUND(effect / NULLIF(SUM(effect) OVER (), 0), 6) + 0.0 AS share
FROM eff
"""
    return head + "".join(chains) + tail


ORACLE_MARKOV_ATTRIBUTION = _attribution_oracle(_ITERS)
