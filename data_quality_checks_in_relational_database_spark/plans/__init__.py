from data_quality_checks_in_relational_database_spark.plans.registry import (
    REGISTRY,
    QuerySpec,
    oracle_sql,
    queries,
)

__all__ = ["REGISTRY", "QuerySpec", "oracle_sql", "queries"]
