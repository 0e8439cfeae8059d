#!/usr/bin/env python3
"""Time individual registry queries in isolation with the noop sink
(guide §1.4): computes every column of every row, discards the result,
and shows in the SQL tab as a normal write. Median of 3 after one
warm-up, cache/persist swept between runs — the bench.py methodology,
but noop-sink-actioned and single-query so a plan change can be
isolated without running the whole headline set.

Usage: python scripts/time_query.py name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from data_quality_checks_in_relational_database_spark.plans.registry import REGISTRY
from data_quality_checks_in_relational_database_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="time-query", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    def clear_state() -> None:
        spark.catalog.clearCache()
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.unpersist(True)

    out = {}
    for name in names:
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"{name}: warm-up")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        clear_state()
        runs = []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"{name}: timed run {i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            clear_state()
        runs.sort()
        out[name] = {
            "median": round(runs[1], 4),
            "best": round(runs[0], 4),
            "spread": round(runs[-1] - runs[0], 4),
        }
        print(json.dumps({name: out[name]}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
