from data_quality_checks_in_relational_database_spark.sources.catalog import (
    FleetCatalog,
    ParquetDirCatalog,
    SparkCatalog,
)
from data_quality_checks_in_relational_database_spark.sources.files import (
    malformed_scan_report,
    quarantine_split,
    read_files,
)
from data_quality_checks_in_relational_database_spark.sources.sinks import WriteAudit, write_report

__all__ = [
    "FleetCatalog",
    "ParquetDirCatalog",
    "SparkCatalog",
    "WriteAudit",
    "write_report",
    "read_files",
    "malformed_scan_report",
    "quarantine_split",
]
