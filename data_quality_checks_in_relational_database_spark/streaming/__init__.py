from data_quality_checks_in_relational_database_spark.streaming.cdc import (
    read_state,
    streaming_cdc_apply,
)
from data_quality_checks_in_relational_database_spark.streaming.freshness import (
    read_events_stream,
    windowed_volume,
)
from data_quality_checks_in_relational_database_spark.streaming.quality import (
    streaming_rule_monitor,
)
from data_quality_checks_in_relational_database_spark.streaming.stateful import (
    dedup_ledger,
)

__all__ = [
    "read_events_stream",
    "windowed_volume",
    "streaming_rule_monitor",
    "dedup_ledger",
    "streaming_cdc_apply",
    "read_state",
]
