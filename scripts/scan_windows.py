"""One-shot scan: which registered queries plan an UNPARTITIONED window
(windowspecdefinition whose first argument is a sort item)? Used to
populate tests/test_plans.py::GLOBAL_WINDOW_ALLOWED with reviewed,
bounded-frame-only entries. Plan construction only — nothing executes.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_quality_checks_in_relational_database_spark.plans.registry import REGISTRY
from data_quality_checks_in_relational_database_spark.session import get_spark

PAT = re.compile(r"windowspecdefinition\([^,)]*? (ASC|DESC)")


def main() -> None:
    spark = get_spark(app_name="winscan", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.001"
    offenders = []
    for name, spec in REGISTRY.items():
        try:
            df = spec.fn(spark, sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {e}", flush=True)
            continue
        hits = PAT.findall(plan)
        if hits:
            offenders.append(name)
            print(f"{name}: {len(hits)} unpartitioned windowspec(s)", flush=True)
    print("OFFENDERS " + repr(sorted(set(offenders))), flush=True)


if __name__ == "__main__":
    main()
