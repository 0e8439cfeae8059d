"""spark-dq-engine: a PySpark-native data-quality / reconciliation engine.

Re-expresses the capability surface of
``wizaphiri/data-quality-checks-in-relational-database`` (surveyed in
SURVEY.md) as idiomatic Spark: declarative DataFrame plans that Catalyst
optimizes (pushdown, pruning, broadcast), instead of the reference's
hand-written MySQL pushdown + serial pandas loop
(``data_consistency_checks.py:85-116``, ``pre_and_post_etl_checks.py:115-136``).

Public API: the five check primitives (SURVEY.md §2.8) live in
``operators``; fleet sources in ``sources``; scalar parity helpers in
``functions``; the query registry consumed by ``__spark_entry__.py`` in
``plans.registry``; streaming variants in ``streaming``.
"""

from data_quality_checks_in_relational_database_spark.session import get_spark, load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views"]
