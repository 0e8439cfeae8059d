"""Verbatim re-expressions of the reference's two DQA pipelines over an
OpenMRS-shaped source fleet (FIXTURES.md Family B).

These compose the generic check primitives into the exact report shapes
the reference emits:

- :func:`loading_status_check` ⇔ ``data_consistency_checks.py`` (DC):
  per-facility record counts + max event dates for obs/encounter/orders,
  pivoted wide, cross-table divergence scored as rounded stddev of date
  ordinals (DC:43-144).
- :func:`etl_reconciliation_check` ⇔ ``pre_and_post_etl_checks.py``
  (PP): per-site per-table counts from N source schemas vs the
  consolidated warehouse, full-outer join, signed variance (PP:45-243).

Reference quirks preserved deliberately (each pinned in
tests/test_openmrs_pipelines.py):
- facility_id is the RAW ``global_property.property_value`` string in
  DC (DC:45) but the ``*1``-coerced number in PP (PP:47, garbage → 0);
- ``voided = 0`` filters everywhere EXCEPT ``patient_state`` (its
  filter is commented out at PP:106);
- the destination ``patient_state`` branch is hardcoded to
  ``site_id = 20`` (PP:219);
- ``QUARTER(NOW())-1`` yields 0 in Q1 (DC:50);
- future-dated rows are excluded by ``ts < NOW()`` (DC:52).

The scalar-subquery "config join" (DC:45-46) becomes a 1-row config
DataFrame cross-joined with ``broadcast()`` — the Spark-native shape of
an uncorrelated scalar subquery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.functions.scalars import mysql_num
from data_quality_checks_in_relational_database_spark.operators.checks import (
    FreshnessSpec,
    consistency_score,
    freshness_audit,
    reconcile,
    volume_audit,
)
from data_quality_checks_in_relational_database_spark.operators.fanout import FanoutReport, run_fanout
from data_quality_checks_in_relational_database_spark.sources.catalog import FleetCatalog

#: tables each DC source must have (DC:43-77)
DC_TABLES = ["global_property", "location", "obs", "encounter", "orders"]
#: tables each PP source must have (PP:45-110)
PP_TABLES = DC_TABLES + ["person", "patient", "patient_state"]
#: (table, voided-filtered) per PP:50-107 — patient_state unfiltered
PP_COUNTED = [
    ("obs", True),
    ("encounter", True),
    ("orders", True),
    ("person", True),
    ("patient", True),
    ("patient_state", False),
]


def facility_config(global_property: DataFrame, location: DataFrame) -> DataFrame:
    """1-row config frame: (facility_id_str, site_id, facility_name).

    Re-expresses the reference's uncorrelated scalar subqueries
    (DC:45-46 / PP:47-48): property_value of
    'current_health_center_id', its ``*1`` numeric coercion, and the
    DISTINCT location name it points at.
    """
    prop = (
        global_property.filter(F.col("property") == "current_health_center_id")
        .select(
            F.col("property_value").alias("facility_id_str"),
            mysql_num("property_value").alias("site_id"),
        )
        # a well-formed OpenMRS config has exactly one row; the
        # reference's scalar subquery (DC:45) would ERROR on more. We
        # instead pick the smallest value deterministically — a bare
        # limit(1) would be partition-order-dependent.
        .orderBy("facility_id_str")
        .limit(1)
    )
    named = prop.join(
        F.broadcast(
            location.select(
                F.col("location_id").cast("long").alias("site_id"),
                F.col("name").alias("facility_name"),
            ).distinct()
        ),
        "site_id",
        "left",
    )
    return named.select("facility_id_str", "site_id", "facility_name")


def loading_status_check(catalog: FleetCatalog, prefix: str = "openmrs_") -> FanoutReport:
    """DC per-source phase: the 3-branch freshness/volume union
    (DC:43-77) fanned out over the fleet with missing-table skip."""

    def check(source: str, t: dict[str, DataFrame]) -> DataFrame:
        cfg = facility_config(t["global_property"], t["location"])
        specs = [
            FreshnessSpec("obs", t["obs"], "obs_datetime"),
            FreshnessSpec("encounter", t["encounter"], "encounter_datetime"),
            FreshnessSpec("orders", t["orders"], "start_date"),
        ]
        audit = freshness_audit(specs)
        # broadcast 1-row config to every audit row (scalar-subquery shape)
        return audit.crossJoin(F.broadcast(cfg)).select(
            F.col("facility_id_str").alias("facility_id"),
            "facility_name",
            "table_name",
            "record_count",
            "max_date",
            "reporting_quarter",
        )

    return run_fanout(catalog, check, required_tables=DC_TABLES, prefix=prefix)


def schema_consistency_report(loading_status: DataFrame) -> DataFrame:
    """DC driver phase (DC:124-149): pivot per-table max dates wide per
    facility, score with rounded sample stddev of date ordinals, stamp
    date_created. Output columns exactly DC:144 + DC:149."""
    long_df = loading_status.select("facility_id", "facility_name", "table_name", "max_date")
    wide = consistency_score(
        long_df,
        keys=["facility_id", "facility_name"],
        pivot_col="table_name",
        date_col="max_date",
        pivot_values=["encounter", "obs", "orders"],
    )
    return wide.select(
        "facility_id",
        "facility_name",
        "encounter_max_date",
        "obs_max_date",
        "orders_max_date",
        "std_dev",
    ).withColumn("date_created", F.current_date())


def etl_reconciliation_check(
    catalog: FleetCatalog,
    warehouse: dict[str, DataFrame],
    prefix: str = "openmrs_",
) -> tuple[DataFrame, FanoutReport]:
    """PP end-to-end: source fleet counts vs consolidated warehouse
    counts, full-outer reconciliation with signed variance (PP:45-243).

    Returns (report, fanout_audit). Report columns exactly PP:242:
    site_id, site_name, table_name, record_count_source,
    record_count_ohdl, variance, date_created.
    """

    def check(source: str, t: dict[str, DataFrame]) -> DataFrame:
        cfg = facility_config(t["global_property"], t["location"])
        tables = {
            name: (t[name].filter(F.col("voided") == 0) if voided else t[name])
            for name, voided in PP_COUNTED
        }
        counts = volume_audit(tables)
        return counts.crossJoin(F.broadcast(cfg)).select(
            "site_id",
            F.col("facility_name").alias("site_name"),
            "table_name",
            "record_count",
        )

    fan = run_fanout(catalog, check, required_tables=PP_TABLES, prefix=prefix)

    # Destination: consolidated warehouse keyed by site_id (PP:159-221).
    dest_parts = []
    for name, voided in PP_COUNTED:
        df = warehouse[name]
        if voided:
            df = df.filter(F.col("voided") == 0)
        if name == "patient_state":
            df = df.filter(F.col("site_id") == 20)  # PP:219 quirk, verbatim
        dest_parts.append(
            df.groupBy(F.col("site_id").cast("long").alias("site_id"))
            .agg(F.count(F.lit(1)).alias("record_count"))
            .select("site_id", F.lit(name).alias("table_name"), "record_count")
        )
    dest = dest_parts[0]
    for p in dest_parts[1:]:
        dest = dest.unionByName(p)

    report = reconcile(
        fan.report,
        dest,
        keys=["site_id", "table_name"],
        suffixes=("_source", "_ohdl"),
        carry_source_cols=["site_name"],
        stamp_date=True,
    ).select(
        "site_id",
        "site_name",
        "table_name",
        "record_count_source",
        "record_count_ohdl",
        "variance",
        "date_created",
    )
    return report, fan
