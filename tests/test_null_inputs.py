"""Degenerate-input robustness, part 2: NULLs in every nullable hot
column (document text/lang, event props/user, order totals, embedding
labels). Real fleets ship NULLs; a quality pipeline must classify or
skip them, never crash (the pack scan's int(NaN) was a live example)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.plans.registry import REGISTRY
from data_quality_checks_in_relational_database_spark.session import TABLES
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def null_sf_dir(spark):
    nullers = {
        "documents": {
            "text": F.when(F.col("doc_id") % 7 == 0, F.lit(None))
            .when(F.col("doc_id") % 11 == 0, F.lit(""))
            .otherwise(F.col("text")),
            "lang": F.when(F.col("doc_id") % 5 == 0, F.lit(None)).otherwise(F.col("lang")),
        },
        "events": {
            "props": F.when(F.col("event_id") % 3 == 0, F.lit(None)).otherwise(F.col("props")),
            "user_id": F.when(F.col("event_id") % 13 == 0, F.lit(None)).otherwise(
                F.col("user_id")
            ),
        },
        "orders": {
            "o_totalprice": F.when(F.col("o_orderkey") % 17 == 0, F.lit(None)).otherwise(
                F.col("o_totalprice")
            )
        },
        "embeddings": {
            "label": F.when(F.col("vec_id") % 9 == 0, F.lit(None)).otherwise(F.col("label"))
        },
    }
    d = tempfile.mkdtemp(prefix="null_sf_")
    for t in TABLES:
        df = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        for c, expr in nullers.get(t, {}).items():
            df = df.withColumn(c, expr)
        df.write.mode("overwrite").parquet(f"{d}/{t}.parquet")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_survives_null_values(spark, null_sf_dir, name):
    rows = REGISTRY[name].fn(spark, null_sf_dir).collect()
    assert isinstance(rows, list)
