"""Pin tests for the semantic edges catalogued in SURVEY.md §5.3:
half-even rounding, MySQL *1 coercion, NaN-skipping row-wise sample
stddev, date ordinals, token counting."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from data_quality_checks_in_relational_database_spark.functions.scalars import (
    date_ordinal,
    money_sum,
    mysql_num,
    round_half_even,
    rowwise_stddev_samp,
    token_count,
)


def test_round_half_even(spark):
    df = spark.createDataFrame([(0.5,), (1.5,), (2.5,), (-0.5,), (3.7,)], ["x"])
    got = [r[0] for r in df.select(round_half_even("x")).collect()]
    # pandas Series.round parity: ties to even
    assert got == [0.0, 2.0, 2.0, -0.0, 4.0]


def test_mysql_num_coercion(spark):
    df = spark.createDataFrame([("42",), ("3.9",), ("garbage",), (None,)], ["v"])
    got = [r[0] for r in df.select(mysql_num("v")).collect()]
    # MySQL `*1`: numeric strings parse (truncating), garbage → 0
    assert got == [42, 3, 0, 0]


def test_rowwise_stddev_samp(spark):
    df = spark.createDataFrame(
        [(1.0, 3.0, 8.0), (2.0, 2.0, 2.0), (1.0, None, 3.0), (1.0, None, None)],
        ["a", "b", "c"],
    )
    got = df.select(rowwise_stddev_samp("a", "b", "c").alias("s")).collect()
    # pandas std(axis=1) of {1,3,8} = 3.605551...; skipna: {1,3} → 1.4142;
    # single value → NULL
    assert abs(got[0][0] - 3.605551275463989) < 1e-12
    assert got[1][0] == 0.0
    assert abs(got[2][0] - 1.4142135623730951) < 1e-12
    assert got[3][0] is None


def test_date_ordinal_epoch(spark):
    df = spark.createDataFrame([("1970-01-01",), ("0001-01-01",)], ["d"])
    got = [r[0] for r in df.select(date_ordinal(F.col("d").cast("date"))).collect()]
    # pandas Timestamp.toordinal parity
    assert got[0] == 719163
    assert got[1] == 1


def test_token_count_empty(spark):
    df = spark.createDataFrame([("a b  c",), ("",), ("   ",), (None,)], ["t"])
    got = [r[0] for r in df.select(token_count("t")).collect()]
    assert got == [3, 0, 0, None]


def test_bpe_token_count(spark):
    from data_quality_checks_in_relational_database_spark.operators.text import bpe_token_count

    df = spark.createDataFrame(
        [("don't stop",), ("3.14 is pi",), ("",), ("hello",)], ["t"]
    )
    got = [r[0] for r in df.select(bpe_token_count("t")).collect()]
    # don|'|t|stop = 4; 3|.|14|is|pi = 5; '' = 0; hello = 1
    assert got == [4, 5, 0, 1]


def test_money_sum_partition_independent(spark):
    rows = [(float(f"{i}.{i % 100:02d}"),) for i in range(1, 2000)]
    df1 = spark.createDataFrame(rows, ["x"]).repartition(1)
    df32 = spark.createDataFrame(rows, ["x"]).repartition(32)
    v1 = df1.agg(money_sum("x").alias("s")).collect()[0][0]
    v32 = df32.agg(money_sum("x").alias("s")).collect()[0][0]
    assert v1 == v32  # bit-identical regardless of partitioning

def test_repetition_report_crafted(spark):
    from data_quality_checks_in_relational_database_spark.operators.text import (
        repetition_report,
        repetition_stats,
    )

    rows = [
        (1, "en", "spam spam spam spam spam"),   # 3 grams, 1 distinct
        (2, "en", "all words are different here"),  # 3 grams, 3 distinct
        (3, "fr", "ab"),                          # < 3 tokens -> 0 grams
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    per = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert per[1]["n_grams"] == 3 and per[1]["n_distinct_grams"] == 1
    assert per[2]["n_grams"] == 3 and per[2]["n_distinct_grams"] == 3
    assert per[3]["n_grams"] == 0 and per[3]["n_distinct_grams"] == 0
    rep = {r["lang"]: r for r in repetition_report(df).collect()}
    assert rep["en"]["total_grams"] == 6 and rep["en"]["total_distinct"] == 4
    assert rep["en"]["dup_ratio"] == pytest.approx(1 - 4 / 6, abs=1e-6)
    assert rep["fr"]["dup_ratio"] is None  # 0/0 -> NULL, not fabricated


def test_md5_u60_parity_with_duckdb(spark):
    """The portable 60-bit hash must be bit-identical to DuckDB's
    CAST('0x'||substr(md5(x),1,15) AS BIGINT) — this parity is what
    lets the SimHash/winnowing oracles recompute Spark's sketches."""
    import duckdb

    from data_quality_checks_in_relational_database_spark.functions.scalars import md5_u60

    words = ["the", "spark graft", "", "Ünïcode-Ω", "x" * 500]
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    got = [r[0] for r in df.select(md5_u60("w")).collect()]
    want = [
        duckdb.sql(
            "SELECT CAST('0x' || substr(md5(?), 1, 15) AS BIGINT)", params=[w]
        ).fetchone()[0]
        for w in words
    ]
    assert got == want
    assert all(0 <= v < 1 << 60 for v in got)


def test_pattern_scan_and_redact(spark):
    from data_quality_checks_in_relational_database_spark.operators.text import (
        pattern_scan,
        redact_patterns,
    )

    rows = [
        (1, "s1", "contact bob@example.com or visit https://x.io today"),
        (2, "s1", "server at 10.0.0.1 called +1 (555) 123-4567 twice"),
        (3, "s2", "no sensitive content here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    got = {r["source"]: r for r in pattern_scan(df).collect()}
    assert got["s1"]["email_hits"] == 1
    assert got["s1"]["url_hits"] == 1
    assert got["s1"]["ipv4_hits"] == 1
    assert got["s1"]["phone_hits"] == 1
    assert got["s2"]["email_hits"] == 0 and got["s2"]["n_docs"] == 1

    red = {r["doc_id"]: r["text"] for r in redact_patterns(df).collect()}
    assert "[EMAIL]" in red[1] and "bob@" not in red[1]
    assert "[URL]" in red[1] and "https://" not in red[1]
    assert "[IPV4]" in red[2] and "10.0.0.1" not in red[2]
    assert "[PHONE]" in red[2] and "555" not in red[2]
    assert red[3] == "no sensitive content here"
