"""Degenerate-input robustness: every registered query must run to
completion on EMPTY (zero-row, schema-preserving) versions of all ten
tables — a new fleet source, a fresh partition, or a filtered-to-zero
slice must produce empty reports, not ANSI divide-by-zero errors or
numpy axis crashes in the Arrow paths."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from data_quality_checks_in_relational_database_spark.plans.registry import REGISTRY
from data_quality_checks_in_relational_database_spark.session import TABLES
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def empty_sf_dir(spark):
    d = tempfile.mkdtemp(prefix="empty_sf_")
    for t in TABLES:
        (
            spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
            .limit(0)
            .write.mode("overwrite")
            .parquet(f"{d}/{t}.parquet")
        )
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    rows = REGISTRY[name].fn(spark, empty_sf_dir).collect()
    # most queries are empty-in/empty-out; global-aggregate reports may
    # legitimately emit summary rows (counts of zero) — only completion
    # and a sane row count are asserted here
    assert isinstance(rows, list) and len(rows) < 10_000
