"""Partitioning/AQE invariance gate.

The engine's 100 TB claim rests on every registered query emitting
VALUES that do not depend on physical execution: shuffle partition
count, adaptive re-planning, task scheduling order. The DuckDB
differential proves value equality under ONE Spark configuration; this
gate re-executes the driver's current correctness window under a
deliberately hostile second session — 3 shuffle partitions (forcing
different merge/combine orders) with AQE disabled (no runtime
coalescing, different stage shapes) — and asserts the normalized row
multiset is IDENTICAL to the tuned session's.

Anything that would flunk here is exactly what breaks silently on a
real cluster when an executor count changes: partition-order FP sums,
ties broken by arrival order, limit-without-order, spark_partition_id
leaking into values. The repo's conventions (integer/exact-decimal
folds, md5 tie-breakers, token-sorted FP sums) exist to make this gate
pass — now it is asserted rather than asserted-by-convention.
"""

from __future__ import annotations

import pytest

from data_quality_checks_in_relational_database_spark.plans.registry import (
    CORRECTNESS_WINDOW,
    REGISTRY,
)
from tests.conftest import SF_SMOKE, normalized_rows


@pytest.fixture(scope="module")
def spark_hostile(spark):
    """Second session on the shared SparkContext: few-partition,
    non-adaptive — different physical plans, same required values."""
    s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "3")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    # strict codegen, matching the driver gate (drive_driver.py): a
    # janino compile failure must FAIL here in CI, not silently fall
    # back to interpreted execution and pass
    s.conf.set("spark.sql.codegen.fallback", "false")
    # keep the tuned session's timezone/session semantics otherwise
    s.conf.set("spark.sql.session.timeZone", spark.conf.get("spark.sql.session.timeZone"))
    yield s


def _rows(session, name):
    df = REGISTRY[name].fn(session, SF_SMOKE)
    return normalized_rows(df.columns, df.collect())


@pytest.mark.parametrize("name", CORRECTNESS_WINDOW)
def test_values_invariant_under_partitioning_and_aqe(spark, spark_hostile, name):
    a = _rows(spark, name)
    b = _rows(spark_hostile, name)
    assert a == b, (
        f"{name}: values depend on physical execution "
        f"(tuned {len(a)} rows vs hostile {len(b)} rows)"
    )
