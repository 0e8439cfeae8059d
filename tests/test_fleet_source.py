"""Custom Python Data Source (Spark 4 API): the synthetic per-site
fleet relation — determinism, one-partition-per-site parallelism, and
site_id pushdown pruning."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_quality_checks_in_relational_database_spark.sources.fleet_source import (
    register,
    site_rows,
)


def _fleet(spark, **opts):
    register(spark)
    r = spark.read.format("fleet")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_fleet_rows_deterministic(spark):
    df = _fleet(spark, sites=4, rowsPerSite=50)
    got = sorted(tuple(r) for r in df.filter(F.col("site_id") == 2).collect())
    assert got == sorted(site_rows(2, 50, 7))
    # two reads produce identical data (seeded generator, no state)
    again = sorted(tuple(r) for r in _fleet(spark, sites=4, rowsPerSite=50)
                   .filter(F.col("site_id") == 2).collect())
    assert got == again


def test_fleet_partition_per_site(spark):
    df = _fleet(spark, sites=6, rowsPerSite=10)
    assert df.rdd.getNumPartitions() == 6
    assert df.count() == 60


def test_fleet_site_filter_prunes_partitions(spark):
    """site_id = k must reach pushFilters and prune to ONE partition —
    the Python-source analogue of partition pruning."""
    df = _fleet(spark, sites=8, rowsPerSite=10).filter(F.col("site_id") == 3)
    assert df.count() == 10
    assert df.rdd.getNumPartitions() == 1


def test_fleet_feeds_dq_checks(spark):
    """The custom source is a first-class DQ input: per-site volume +
    status mix straight off the scan."""
    df = _fleet(spark, sites=4, rowsPerSite=100)
    rep = (
        df.groupBy("site_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("status").alias("n_statuses"),
        )
        .collect()
    )
    assert len(rep) == 4
    assert all(r.n == 100 for r in rep)
    assert all(r.n_statuses == 3 for r in rep)
