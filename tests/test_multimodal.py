"""Multimodal plumbing tests: Arrow-batch feature extraction over
binary payload columns, deterministic fake decode, stubbed real decode."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from data_quality_checks_in_relational_database_spark.operators import multimodal as mm


def test_extract_features_end_to_end(spark):
    media = spark.createDataFrame(
        [
            (1, bytearray(b"hello world"), "image", "fake", None, None, None),
            (2, bytearray(b""), "image", "fake", None, None, None),
            (3, None, "image", "fake", None, None, None),
        ],
        schema=mm.MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    assert rows[1]["n_bytes"] == 11
    assert rows[1]["sha256"] == hashlib.sha256(b"hello world").hexdigest()
    assert rows[1]["fake_brightness"] == int(sum(b"hello world") / 11)
    assert rows[2]["n_bytes"] == 0
    assert rows[3]["n_bytes"] is None and rows[3]["sha256"] is None


def test_decode_image_png_real_others_stubbed():
    # r4: PNG decode is REAL (stdlib codec); a truncated payload with
    # the PNG magic is a parse error, not a stub. r5: JPEG routes to
    # the real header probe (truncated stream = ValueError there);
    # formats with no stdlib handler still raise NotImplementedError
    with pytest.raises(ValueError):
        mm.decode_image(b"\x89PNG", "png")  # magic only, no chunks
    d = mm.decode_image(mm.encode_png_gray([[0, 255]]), "png")
    assert (d["width"], d["height"]) == (2, 1)
    with pytest.raises(ValueError):
        mm.decode_image(b"\xff\xd8\xff", "jpeg")  # SOI only, no SOF
    j = mm.decode_image(mm.encode_jpeg_stub(4, 3, 2), "jpeg")
    assert (j["width"], j["height"], j["n_components"]) == (4, 3, 2)
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"RIFF....WAVE", "wav")


def test_sample_frames_fanout(spark):
    payload = bytes(range(200))
    media = spark.createDataFrame(
        [(1, bytearray(payload), "video", "fake", None, None, None),
         (2, None, "video", "fake", None, None, None)],
        schema=mm.MEDIA_SCHEMA,
    )
    frames = mm.sample_frames(media, every_n_bytes=64, max_frames=8).collect()
    by_frame = {r["frame_no"]: r for r in frames}
    # 200 bytes // 64 = 3 frames; NULL payload contributes none
    assert sorted(by_frame) == [0, 1, 2]
    assert bytes(by_frame[0]["frame_payload"]) == payload[:64]
    assert by_frame[2]["n_bytes"] == 64
    assert all(r["media_id"] == 1 for r in frames)


def test_documents_adapter_schema(spark):
    docs = spark.createDataFrame([(7, "abc", "en", "s", 3)], ["doc_id", "text", "lang", "source", "n_chars"])
    media = mm.documents_as_media(docs)
    assert [f.name for f in media.schema.fields] == [f.name for f in mm.MEDIA_SCHEMA.fields]
    row = media.collect()[0]
    assert bytes(row["payload"]) == b"abc" and row["media_id"] == 7

def test_read_media_dir_binary_file_source(spark, tmp_path):
    """binaryFile ingestion: raw files land as opaque payloads with
    extension-derived type/format, deterministic path-hash ids, and
    flow straight into the Arrow feature stage."""
    from data_quality_checks_in_relational_database_spark.operators.multimodal import (
        extract_features,
    )
    from data_quality_checks_in_relational_database_spark.sources.files import read_media_dir

    (tmp_path / "a.png").write_bytes(b"\x89PNG\r\n\x1a\nfakepng")
    (tmp_path / "b.wav").write_bytes(b"RIFFfakewav")
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "c.mp4").write_bytes(b"\x00\x00\x00 ftypmp42fake")
    (tmp_path / "notes.txt").write_text("not media")

    media = read_media_dir(spark, str(tmp_path), glob="*.{png,wav,mp4}")
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in media.collect()}
    assert set(rows) == {"a.png", "b.wav", "c.mp4"}  # txt pruned at listing
    assert rows["a.png"]["media_type"] == "image" and rows["a.png"]["format"] == "png"
    assert rows["b.wav"]["media_type"] == "audio"
    assert rows["c.mp4"]["media_type"] == "video"
    assert bytes(rows["a.png"]["payload"]) == b"\x89PNG\r\n\x1a\nfakepng"
    assert rows["b.wav"]["n_bytes_listed"] == 11

    # ids deterministic across re-reads (same path -> same id)
    again = {r["path"]: r["media_id"] for r in read_media_dir(spark, str(tmp_path), glob="*.{png,wav,mp4}").collect()}
    assert all(again[r["path"]] == r["media_id"] for r in rows.values())

    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    assert feats[rows["b.wav"]["media_id"]]["n_bytes"] == 11
