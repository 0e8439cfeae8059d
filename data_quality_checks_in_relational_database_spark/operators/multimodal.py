"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed in Arrow-batched Pandas stages.

Per the north-star contract: the decode step itself is STUBBED (the
image/audio codec libraries are not in this container) behind
``NotImplementedError`` or a deterministic fake — but the Spark-side
plumbing is real and tested: schema, partition sizing, ``mapInPandas``
batch shape, and the metadata/feature extraction path.

Scale design: media bytes never leave the executor that read them —
every stage below is map-only over Arrow record batches (zero
shuffles); the only shuffled artifacts are small per-item feature rows.
``spark.sql.files.maxPartitionBytes`` (and for real media lakes, a
target of ~100-500 media items per partition) bounds executor memory;
for blob columns larger than ~100 MB, store pointers (paths) and load
inside the batch function instead.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical media-table schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("media_type", StringType(), True),  # image|audio|video
        StructField("format", StringType(), True),  # png|jpeg|wav|mp4|...
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("sha256", StringType(), True),
        StructField("fake_brightness", LongType(), True),
    ]
)


def decode_image(payload: bytes, fmt: str) -> "object":
    """Real codec decode — NOT AVAILABLE in this container.

    Production: swap in Pillow/torchvision/ffmpeg here; the batch
    plumbing in :func:`extract_features` is unchanged.
    """
    raise NotImplementedError("image codecs are not installed; use fake_decode in tests")


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a decoder: derives stable pseudo
    'pixel stats' from the bytes themselves so tests can assert
    end-to-end values without codec libraries."""
    if payload is None:
        return {"n_bytes": None, "sha256": None, "fake_brightness": None}
    digest = hashlib.sha256(payload).hexdigest()
    # mean byte value plays the role of decoded-image brightness
    brightness = int(sum(payload) / len(payload)) if len(payload) else 0
    return {"n_bytes": len(payload), "sha256": digest, "fake_brightness": brightness}


def extract_features(media: DataFrame, batch_decoder=None) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas``: each Arrow batch arrives as a pandas DataFrame;
    the decoder runs per item; only the small feature rows are
    returned. This is the designated slot for real decode / resize /
    frame-sample logic.

    Worker-pickling constraint: the default decoder is defined INSIDE
    this function so cloudpickle serializes it by value — Spark Python
    workers do not share the driver's ``sys.path``, so module-level
    references to this package would fail to unpickle when the engine
    is driven from outside the repo. Custom ``batch_decoder`` callables
    must likewise be self-contained (stdlib/installed-libs only).
    """
    if batch_decoder is None:

        def batch_decoder(payload):  # by-value twin of fake_decode
            import hashlib as _hashlib

            if payload is None:
                return {"n_bytes": None, "sha256": None, "fake_brightness": None}
            digest = _hashlib.sha256(payload).hexdigest()
            brightness = int(sum(payload) / len(payload)) if len(payload) else 0
            return {"n_bytes": len(payload), "sha256": digest, "fake_brightness": brightness}

    decoder = batch_decoder
    from data_quality_checks_in_relational_database_spark.functions.scalars import rebalance

    media = rebalance(media)  # decode is CPU-bound; spread one-file inputs

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_no", LongType(), False),
        StructField("frame_payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Video frame sampling plumbing: one payload row fans out to
    ≤ max_frames frame rows via ``mapInPandas``.

    The real decoder (ffmpeg/pyav keyframe extraction) is NOT in this
    container; the deterministic stand-in slices the byte stream every
    ``every_n_bytes`` so batch shape, fan-out ratio, and schema are
    real and testable. Frames stay on the executor that decoded them;
    only downstream feature rows shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                for i in range(0, min(max_frames, max(1, len(payload) // every_n_bytes))):
                    chunk = bytes(payload[i * every_n_bytes : (i + 1) * every_n_bytes])
                    out.append((mid, i, chunk, len(chunk)))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_no", "frame_payload", "n_bytes"]
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize slot: passes payloads through a mapInPandas stage
    that would call the codec's resize; stubbed to annotate the target
    dimensions (the decode itself raises in this container, see
    :func:`decode_image`)."""
    return media.withColumn("width", F.lit(width).cast("long")).withColumn(
        "height", F.lit(height).cast("long")
    )


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter for the driver testdata: treat each document's UTF-8
    bytes as an opaque payload so the multimodal plumbing is exercised
    on real tables (TESTDATA.md has no binary column)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("image").alias("media_type"),
        F.lit("fake").alias("format"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
