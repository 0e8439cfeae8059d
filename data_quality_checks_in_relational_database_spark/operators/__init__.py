from data_quality_checks_in_relational_database_spark.operators.checks import (
    FreshnessSpec,
    consistency_score,
    freshness_audit,
    reconcile,
    volume_audit,
)
from data_quality_checks_in_relational_database_spark.operators.fanout import FanoutReport, run_fanout

__all__ = [
    "FreshnessSpec",
    "consistency_score",
    "freshness_audit",
    "reconcile",
    "volume_audit",
    "FanoutReport",
    "run_fanout",
]
