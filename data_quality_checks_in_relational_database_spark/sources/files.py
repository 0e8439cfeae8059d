"""File-format sources with malformed-record accounting.

The reference ingests only via JDBC (``data_consistency_checks.py:20-27``,
``pre_and_post_etl_checks.py:20-27``); a general engine must also scan
file drops — and in a DQ engine, rows the parser cannot decode are not
an exception to swallow but a metric to report. Spark's PERMISSIVE
parse mode gives this for free: malformed CSV/JSON rows land in a
``columnNameOfCorruptRecord`` column with every data field null, so
"how much of this feed is garbage" is one aggregate over the same scan
(no second read, no driver-side sniffing).

Scale notes: the corrupt-record column rides the normal vectorized
scan; the report is a single partial-aggregated count. Schema must be
EXPLICIT (inference is a full extra pass over 100 TB and can mistype
on dirty data — we refuse rather than infer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

CORRUPT_COL = "_corrupt_record"

_FORMATS = ("parquet", "orc", "csv", "json")


def read_files(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options,
) -> DataFrame:
    """Read ``path`` in ``fmt``; for text formats (csv/json) a schema
    is required and malformed rows are captured in ``_corrupt_record``
    instead of being dropped (MALFORMED) or failing the job (FAILFAST).
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    if fmt in ("parquet", "orc"):
        reader = spark.read.format(fmt)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.options(**options).load(path)
    if schema is None:
        raise ValueError(f"{fmt} ingest requires an explicit schema (no inference pass)")
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if CORRUPT_COL not in schema.fieldNames():
        schema = schema.add(CORRUPT_COL, StringType())
    reader = (
        spark.read.format(fmt)
        .schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", "true"))
    return reader.options(**options).load(path)


def malformed_scan_report(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType | str,
    source_name: str | None = None,
    **options,
) -> DataFrame:
    """One-row DQ report for a text-format feed: total rows, malformed
    rows, malformed fraction. The parse and the audit share one scan.
    """
    df = read_files(spark, path, fmt, schema, **options)
    bad = F.col(CORRUPT_COL).isNotNull()
    # Spark refuses queries whose referenced columns are ONLY the
    # corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN); the
    # first data field's non-null count both lifts that and is a
    # useful per-feed completeness figure.
    probe = next(c for c in df.columns if c != CORRUPT_COL)
    return df.agg(
        F.lit(source_name or path).alias("source"),
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.col(probe)).alias(f"n_{probe}_nonnull"),
        F.sum(bad.cast("long")).alias("n_malformed"),
        F.round(F.avg(bad.cast("double")), 6).alias("malformed_frac"),
    )


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE-parsed frame into (clean, quarantine): clean
    rows with the corrupt column dropped, and the raw text of the rows
    that failed parsing — the standard ingest-pipeline contract (good
    rows flow on; bad rows land in a quarantine sink for replay).
    """
    if CORRUPT_COL not in df.columns:
        raise ValueError(f"frame has no {CORRUPT_COL} column (not a PERMISSIVE text scan)")
    # two consumers of one parse → persist the parsed frame (also
    # lifts Spark's corrupt-column-only query restriction for the
    # quarantine side); at warehouse scale, land the parsed frame to
    # parquet first and split from there instead
    df = df.persist()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_record")
    )
    return clean, quarantine
