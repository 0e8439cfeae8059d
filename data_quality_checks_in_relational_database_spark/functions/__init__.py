from data_quality_checks_in_relational_database_spark.functions.scalars import (
    date_ordinal,
    money_sum,
    mysql_num,
    rebalance,
    round_half_even,
    rowwise_stddev_samp,
    token_count,
)

__all__ = [
    "date_ordinal",
    "money_sum",
    "mysql_num",
    "rebalance",
    "round_half_even",
    "rowwise_stddev_samp",
    "token_count",
]
