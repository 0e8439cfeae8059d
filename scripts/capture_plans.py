#!/usr/bin/env python3
"""Capture .explain("formatted") for registry queries into plans/<round>/
(round from $SPARK_DQ_PLANS_ROUND, default r09).

Usage:
    python scripts/capture_plans.py before [name ...]
    python scripts/capture_plans.py after  [name ...]

With no names, captures every HEADLINE query. Plan capture is
driver-side only (no jobs run) except where a query function itself
runs pre-flight actions (budget probes, checkpoints) while building
its DataFrame — those run as they would in the bench.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from data_quality_checks_in_relational_database_spark.plans.registry import (
    REGISTRY,
    headline_queries,
)
from data_quality_checks_in_relational_database_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    assert tag in ("before", "after"), "tag must be 'before' or 'after'"
    names = sys.argv[2:] or list(headline_queries())
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="plan-capture", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..",
        "plans",
        os.environ.get("SPARK_DQ_PLANS_ROUND", "r09"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = REGISTRY[name].fn
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # budget refusals etc. — record the refusal
            plan = f"(refused during construction: {exc})\n"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"captured {name}_{tag}.txt ({len(plan)} chars)")


if __name__ == "__main__":
    main()
