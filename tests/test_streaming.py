"""Structured Streaming tests: the windowed volume check must produce
identical results in streaming (availableNow microbatches) and batch
mode — one code path, two execution modes — and watermarking must drop
late rows beyond the threshold."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.session import load_tables
from data_quality_checks_in_relational_database_spark.streaming.freshness import (
    read_events_stream,
    windowed_volume,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_dir(spark):
    """Stream-source directory: events re-written µs-precision (the
    file-stream source can't read the NANOS original), split into
    several files to get multiple microbatches."""
    d = tempfile.mkdtemp(prefix="events_stream_")
    ev = load_tables(spark, SF_SMOKE, ("events",))["events"]
    ev.repartition(4).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_equals_batch(spark, events_dir):
    batch = windowed_volume(spark.read.parquet(events_dir), window="1 hour")
    expected = {tuple(r) for r in batch.collect()}

    stream = read_events_stream(spark, events_dir, max_files=1)
    out = windowed_volume(stream, window="1 hour", watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM win_counts").collect()}
    assert got == expected


def test_watermark_bounds_state(spark, events_dir):
    """With update mode + watermark, windows older than the watermark
    stop receiving updates; this pins that the watermark clause is
    actually applied (plan contains EventTimeWatermark)."""
    stream = read_events_stream(spark, events_dir)
    out = windowed_volume(stream, window="1 hour", watermark="30 minutes")
    assert "eventTimeWatermark" in out._jdf.queryExecution().analyzed().toString() or (
        "EventTimeWatermark" in out._jdf.queryExecution().analyzed().toString()
    )