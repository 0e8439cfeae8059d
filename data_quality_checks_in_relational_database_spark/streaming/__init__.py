from data_quality_checks_in_relational_database_spark.streaming.freshness import (
    read_events_stream,
    windowed_volume,
)

__all__ = ["read_events_stream", "windowed_volume"]
