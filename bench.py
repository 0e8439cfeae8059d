#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan build + execution to a driver-side
count/collect of its bounded report output). A warm-up pass of the
first query absorbs one-time JVM/codegen startup so the numbers reflect
steady-state engine throughput, matching how the reference's cron jobs
amortize startup across tables.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_quality_checks_in_relational_database_spark.plans.registry import headline_queries
from data_quality_checks_in_relational_database_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_spark(
        app_name="spark-dq-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = headline_queries()
    # Cold probe: the FIRST query, timed before any warm-up, captures
    # JVM JIT + whole-stage-codegen compile cost so codegen-heavy
    # operators (e.g. SimHash's 64-term fold) can't regress invisibly
    # behind the warm numbers below.
    first_name, first_fn = next(iter(qs.items()))
    t0 = time.perf_counter()
    first_fn(spark, sf_dir).count()
    cold_first = round(time.perf_counter() - t0, 4)
    spark.catalog.clearCache()
    # Warm-up pass over every query (not timed): amortizes JVM JIT +
    # whole-stage-codegen compilation, exactly as the reference's
    # cron-style deployment amortizes startup across runs. The timed
    # pass below measures steady-state engine throughput.
    for fn in qs.values():
        fn(spark, sf_dir).count()
        spark.catalog.clearCache()  # drop operator-internal persists

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        assert n >= 0
        spark.catalog.clearCache()
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "cold_first_query_sec": cold_first,
                "cold_first_query": first_name,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
