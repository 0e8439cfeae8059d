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


#: file-extension → (media_type, canonical format) for binary lakes.
MEDIA_EXTENSIONS: dict[str, tuple[str, str]] = {
    "png": ("image", "png"),
    "jpg": ("image", "jpeg"),
    "jpeg": ("image", "jpeg"),
    "gif": ("image", "gif"),
    "webp": ("image", "webp"),
    "wav": ("audio", "wav"),
    "mp3": ("audio", "mp3"),
    "flac": ("audio", "flac"),
    "mp4": ("video", "mp4"),
    "mkv": ("video", "mkv"),
    "webm": ("video", "webm"),
}


def read_media_dir(
    spark: SparkSession,
    path: str,
    glob: str = "*",
    recursive: bool = True,
) -> DataFrame:
    """Ingest a directory of raw media files via Spark's native
    ``binaryFile`` source into the canonical media-table shape
    (``operators.multimodal.MEDIA_SCHEMA`` columns + ``path``).

    Scale notes: ``binaryFile`` does NOT split files — one file is one
    task's read, so partition count tracks file count and executor
    memory must hold the largest single file (Spark caps content at
    2 GB); for larger assets store pointers and open them inside the
    Arrow batch stage instead. ``pathGlobFilter`` prunes non-media
    files at listing time (no read), and listing parallelizes across
    the cluster for large directory trees.

    ``media_id`` is ``xxhash64(path)``: deterministic across runs (a
    re-ingest of the same lake produces the same ids — joins against
    prior feature tables stay valid), no driver-side id assignment.
    Width/height/duration stay NULL here — they are decode-stage
    outputs (``operators.multimodal.extract_features``).
    """
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", str(recursive).lower())
        .load(path)
    )
    ext = F.lower(F.regexp_extract("path", r"\.([A-Za-z0-9]+)$", 1))
    media_type = F.lit(None).cast("string")
    fmt = F.lit(None).cast("string")
    # when-chains compile to one codegen'd CASE over the extension
    for e, (mt, f_) in MEDIA_EXTENSIONS.items():
        media_type = F.when(ext == e, F.lit(mt)).otherwise(media_type)
        fmt = F.when(ext == e, F.lit(f_)).otherwise(fmt)
    return df.select(
        F.xxhash64("path").alias("media_id"),
        F.col("content").alias("payload"),
        media_type.alias("media_type"),
        fmt.alias("format"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.col("path"),
        F.col("length").alias("n_bytes_listed"),
    )
