"""Differential tests mirroring the driver's correctness gate: every
registered query with an oracle must match DuckDB exactly (columns,
row count, order-insensitive normalized values) on the smoke-scale
testdata. This is the same comparison the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from data_quality_checks_in_relational_database_spark.plans.registry import REGISTRY
from tests.conftest import SF_SMOKE, assert_matches_oracle

ORACLE_CASES = sorted(name for name, spec in REGISTRY.items() if spec.oracle is not None)
ROWS_ONLY_CASES = sorted(name for name, spec in REGISTRY.items() if spec.oracle is None)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_SMOKE)
    assert_matches_oracle(df, duck, spec.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_query_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_contract_shape():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert q, "queries() must not be empty"
    assert set(o) <= set(q), "every oracle key must have a queries() entry"
