#!/usr/bin/env python3
"""8-vs-32-core scaling rung at the synthetic sf0.3 (r9, verdict #7).

At sf0.1 the 8-vs-32 ratios are floor-plus-noise (the r8 audit read
ten queries FASTER at 8 cores, which is physically impossible for a
parallelism measurement): nearly every query sits on the ~0.2-0.5 s
per-query job/JVM floor. This rung times a selected query set at the
3×-sf0.1 synthetic (structure-preserving scale-up from
scripts/scaling_audit.py — generated on demand, gitignored) on
local[32] and then local[8] in one process (two sessions, minutes
apart), so the t8/t32 ratio finally reflects parallelism: a
trivially-parallel scan should approach the 4× core ratio as data
grows past the floor, and a genuinely serial query stays near 1×.

Run SOLO. Output: one JSON line per core count + a ratio table;
committed artifact: plans/r09/core_scaling_rung.json.

Usage: python scripts/core_scaling_rung.py [name ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scaling_audit import SCRATCH, generate_scaleup  # noqa: E402  (sibling script)

from data_quality_checks_in_relational_database_spark.plans.registry import (  # noqa: E402
    REGISTRY,
)
from data_quality_checks_in_relational_database_spark.session import get_spark  # noqa: E402

# selection: the slowest headline paths + the two core-sensitive names
# from the r8 scaling block + two trivially-parallel scan-aggregates as
# the "should scale" controls
RUNG_QUERIES = [
    "volume_audit",          # trivial scan-aggregate control
    "freshness_audit",       # trivial scan-aggregate control
    "corpus_clean",
    "w1_drift",
    "exact_global_quantiles",
    "transit_overlaps",
    "tfidf_cosine_pairs_capped",
    "incremental_dedup",
    "dedup_clusters",
    "minhash_dedup",
    "cms_heavy_hitters",
    "hybrid_rrf",            # r8 ratio 2.69 — the real core-sensitive one
    "fanout_volume",         # r8 ratio 2.22
    "market_share",
    "sole_return_suppliers",
]


def main() -> None:
    names = sys.argv[1:] or RUNG_QUERIES
    if not os.path.exists(os.path.join(SCRATCH, "lineitem.parquet")):
        generate_scaleup()

    results: dict[str, dict[str, float]] = {n: {} for n in names}
    for cores in (32, 8):
        spark = get_spark(
            app_name=f"core-rung-{cores}",
            master=f"local[{cores}]",
            shuffle_partitions=cores,
        )
        spark.sparkContext.setLogLevel("ERROR")

        def clear_state() -> None:
            spark.catalog.clearCache()
            for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                jrdd.unpersist(True)

        for name in names:
            fn = REGISTRY[name].fn
            spark.sparkContext.setJobDescription(f"{name}@c{cores}: warm")
            fn(spark, SCRATCH).count()
            clear_state()
            runs = []
            for i in range(3):
                spark.sparkContext.setJobDescription(f"{name}@c{cores}: run {i}")
                t0 = time.perf_counter()
                fn(spark, SCRATCH).count()
                runs.append(time.perf_counter() - t0)
                clear_state()
            results[name][f"c{cores}"] = round(statistics.median(runs), 4)
            results[name][f"c{cores}_best"] = round(min(runs), 4)
            print(json.dumps({name: results[name]}))
        spark.stop()

    for name in names:
        r = results[name]
        if r.get("c32"):
            r["ratio_8_over_32"] = round(r["c8"] / r["c32"], 3)
    print(json.dumps({"rung": "sf0.3synth", "queries": results}))


if __name__ == "__main__":
    main()
