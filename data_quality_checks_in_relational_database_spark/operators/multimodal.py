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


def _build_png_codec():
    """Factory for the stdlib-only PNG encode/decode pair.

    Defined as CLOSURES (not module-level defs) on purpose: cloudpickle
    serializes closures by VALUE, so Arrow-batch stages can ship them
    to Python workers that do not have this package on their
    ``sys.path`` — the same worker-pickling constraint documented on
    :func:`extract_features`.

    Decoder coverage: 8-bit, color types 0/2/6 (gray/RGB/RGBA),
    non-interlaced, all five scanline filters (None/Sub/Up/Average/
    Paeth) with chunk-CRC verification. Anything else raises — no
    silent wrong answers. Encoder: 8-bit grayscale with a selectable
    per-image filter type so tests exercise every reconstruction path.
    """
    import struct
    import zlib

    def _paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        if pb <= pc:
            return b
        return c

    def encode_png_gray(pixels, filter_type: int = 0) -> bytes:
        """8-bit grayscale PNG from a list of pixel rows (0..255)."""
        h = len(pixels)
        w = len(pixels[0])
        raw = bytearray()
        prior = bytes(w)
        for row_vals in pixels:
            row = bytes(row_vals)
            raw.append(filter_type)
            if filter_type == 0:
                raw += row
            elif filter_type == 1:
                raw += bytes(
                    (row[x] - (row[x - 1] if x else 0)) & 0xFF for x in range(w)
                )
            elif filter_type == 2:
                raw += bytes((row[x] - prior[x]) & 0xFF for x in range(w))
            elif filter_type == 3:
                raw += bytes(
                    (row[x] - (((row[x - 1] if x else 0) + prior[x]) >> 1)) & 0xFF
                    for x in range(w)
                )
            elif filter_type == 4:
                raw += bytes(
                    (
                        row[x]
                        - _paeth(
                            row[x - 1] if x else 0,
                            prior[x],
                            prior[x - 1] if x else 0,
                        )
                    )
                    & 0xFF
                    for x in range(w)
                )
            else:
                raise ValueError(f"bad filter type {filter_type}")
            prior = row

        def chunk(tag: bytes, data: bytes) -> bytes:
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )

    def decode_png(payload: bytes) -> dict:
        """Parse + fully decode a PNG: header fields, defiltered pixel
        samples, and the exact integer mean brightness
        (``sum(samples)*1000 // n`` — engine-portable milli-units)."""
        if payload[:8] != b"\x89PNG\r\n\x1a\n":
            raise ValueError("not a PNG (bad signature)")
        pos = 8
        idat = bytearray()
        w = h = bit_depth = color_type = None
        interlace = 0
        while pos + 12 <= len(payload):
            (ln,) = struct.unpack(">I", payload[pos : pos + 4])
            if pos + 12 + ln > len(payload):
                # a declared chunk length past the payload end would
                # silently truncate the data slice and hand the CRC
                # unpack <4 bytes (struct.error) — keep corruption
                # inside the documented ValueError contract instead
                raise ValueError("truncated PNG chunk")
            tag = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + ln]
            (crc,) = struct.unpack(">I", payload[pos + 8 + ln : pos + 12 + ln])
            if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
                raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
            if tag == b"IHDR":
                w, h, bit_depth, color_type, _c, _f, interlace = struct.unpack(
                    ">IIBBBBB", data
                )
            elif tag == b"IDAT":
                idat += data
            elif tag == b"IEND":
                break
            pos += 12 + ln
        if w is None:
            raise ValueError("PNG without IHDR")
        if bit_depth != 8 or color_type not in (0, 2, 6) or interlace != 0:
            raise NotImplementedError(
                f"unsupported PNG variant: depth={bit_depth} "
                f"color_type={color_type} interlace={interlace}"
            )
        ch = {0: 1, 2: 3, 6: 4}[color_type]
        stride = w * ch
        raw = zlib.decompress(bytes(idat))
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG pixel data length mismatch")
        out = bytearray()
        prior = bytes(stride)
        for y in range(h):
            off = y * (stride + 1)
            ft = raw[off]
            line = bytearray(raw[off + 1 : off + 1 + stride])
            if ft == 1:
                for x in range(ch, stride):
                    line[x] = (line[x] + line[x - ch]) & 0xFF
            elif ft == 2:
                for x in range(stride):
                    line[x] = (line[x] + prior[x]) & 0xFF
            elif ft == 3:
                for x in range(stride):
                    left = line[x - ch] if x >= ch else 0
                    line[x] = (line[x] + ((left + prior[x]) >> 1)) & 0xFF
            elif ft == 4:
                for x in range(stride):
                    left = line[x - ch] if x >= ch else 0
                    ul = prior[x - ch] if x >= ch else 0
                    line[x] = (line[x] + _paeth(left, prior[x], ul)) & 0xFF
            elif ft != 0:
                raise ValueError(f"bad scanline filter {ft}")
            prior = bytes(line)
            out += line
        n = len(out)
        return {
            "width": w,
            "height": h,
            "bit_depth": bit_depth,
            "color_type": color_type,
            "n_samples": n,
            "brightness_milli": (sum(out) * 1000) // n if n else None,
            # defiltered raw samples (row-major, `ch` samples per px) —
            # downstream perceptual hashing consumes these
            "pixels": bytes(out),
        }

    return encode_png_gray, decode_png


encode_png_gray, decode_png = _build_png_codec()


def decode_image(payload: bytes, fmt: str) -> dict:
    """Image decode. PNG is REAL (stdlib ``struct``+``zlib`` parse:
    header fields, chunk CRCs, full scanline defilter, exact mean
    brightness — :func:`decode_png`); other formats still raise, since
    their codec libraries are not in this container (production: swap
    in Pillow/torchvision/ffmpeg here; the batch plumbing in
    :func:`extract_features` is unchanged)."""
    if fmt == "png" or (payload is not None and payload[:8] == b"\x89PNG\r\n\x1a\n"):
        return decode_png(payload)
    if fmt in ("jpeg", "jpg") or (
        payload is not None and payload[:2] == b"\xff\xd8"
    ):
        # header PROBE, not a pixel decode: dimensions / components /
        # progressive flag from the SOF marker (see probe_jpeg)
        return probe_jpeg(payload)
    if fmt == "bmp" or (payload is not None and payload[:2] == b"BM"):
        return decode_bmp(payload)
    raise NotImplementedError(
        f"no codec for format {fmt!r}; PNG/BMP (full decode) and JPEG "
        "(header probe) are the stdlib-handled formats "
        "(use fake_decode for opaque payloads in tests)"
    )


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


def png_roundtrip_features(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PNG encode→decode round trip per id — the gate
    that proves :func:`decode_png` extracts REAL dimensions and pixel
    statistics (TESTDATA.md ships no binary media column, so the
    payloads are generated from each id's arithmetic and the
    differential oracle replays that arithmetic instead of parsing
    PNG bytes: any decoder bug — header parse, filter reconstruction,
    brightness fold — hash-mismatches).

    Per id: an (id%13+1) × (id%7+1) grayscale image with
    pixel(y, x) = (id·37 + 11·y + x) mod 256, encoded with scanline
    filter id%5 — all five PNG filter types occur in the corpus — then
    decoded back. Map-only Arrow stage; payload bytes never shuffle.
    """
    enc, dec = encode_png_gray, decode_png  # closure-factory products: pickled by value

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw_id in pdf[id_col]:
                i = int(raw_id)
                w, h = i % 13 + 1, i % 7 + 1
                px = [
                    [(i * 37 + 11 * y + x) % 256 for x in range(w)]
                    for y in range(h)
                ]
                d = dec(enc(px, filter_type=i % 5))
                rows.append(
                    (i, d["width"], d["height"], d["n_samples"], d["brightness_milli"])
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "width", "height", "n_samples", "brightness_milli"],
            )

    from data_quality_checks_in_relational_database_spark.functions.scalars import rebalance

    return rebalance(ids.select(id_col)).mapInPandas(
        run,
        schema=f"{id_col} long, width long, height long, "
        "n_samples long, brightness_milli long",
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


def _build_jpeg_codec():
    """Closure factory for the stdlib JPEG HEADER codec (r4 verdict #7:
    PNG decode is real; JPEG is the other ubiquitous format and its
    dimensions live in a plain marker segment — no entropy decode
    needed). Same pickling rationale as :func:`_build_png_codec`: the
    returned functions are self-contained, so Arrow stages serialize
    them BY VALUE and never import this module on workers.

    ``encode_jpeg_stub`` emits a structurally valid JFIF stream — SOI,
    APP0, a COM segment carrying a DECOY ``FF C0`` byte pair (a naive
    byte-scan "parser" reads garbage dimensions from it; the real
    segment walker skips COM by length), DQT, SOF0 or SOF2, DHT, SOS,
    byte-stuffed entropy filler, EOI. ``probe_jpeg`` walks marker
    segments (skipping 0xFF fill bytes) up to SOS and returns the
    frame header fields. Truncation/corruption raise ValueError, like
    the PNG codec.
    """
    import struct

    def encode_jpeg_stub(
        width: int,
        height: int,
        n_components: int = 3,
        progressive: bool = False,
        filler_seed: int = 0,
    ) -> bytes:
        if not (1 <= width <= 65535 and 1 <= height <= 65535):
            raise ValueError("JPEG dimensions must fit 16 bits")
        if not (1 <= n_components <= 4):
            raise ValueError("1..4 components")

        def seg(marker: int, payload: bytes) -> bytes:
            return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

        app0 = seg(0xE0, b"JFIF\x00\x01\x02\x00" + struct.pack(">HHBB", 1, 1, 0, 0))
        # decoy: a COM segment whose BODY looks like an SOF0 marker with
        # bogus 0xFAKE dimensions — only a length-respecting walker
        # survives it
        com = seg(0xFE, b"\xff\xc0\x00\x11\x08\xfa\x11\xfa\x22\x01")
        dqt = seg(0xDB, bytes([0]) + bytes((i * 3 + 1) % 255 + 1 for i in range(64)))
        sof_payload = struct.pack(">BHHB", 8, height, width, n_components) + b"".join(
            struct.pack(">BBB", i + 1, 0x11, 0) for i in range(n_components)
        )
        sof = seg(0xC2 if progressive else 0xC0, sof_payload)
        dht = seg(0xC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([0x05]))
        sos = seg(0xDA, bytes([n_components]) + b"".join(
            struct.pack(">BB", i + 1, 0) for i in range(n_components)
        ) + bytes([0, 63, 0]))
        ent = bytearray()
        for j in range(filler_seed % 29 + 1):
            byte = (filler_seed * 7 + j * 13) % 256
            ent.append(byte)
            if byte == 0xFF:
                ent.append(0x00)  # byte stuffing keeps it marker-free
        return (
            b"\xff\xd8" + app0 + com + dqt + sof + dht + sos + bytes(ent) + b"\xff\xd9"
        )

    def probe_jpeg(payload: bytes) -> dict:
        """Marker-segment walk to the frame header (SOF0/SOF1/SOF2):
        returns width/height/n_components/precision/progressive without
        decoding entropy data — the 100 TB shape for media TRIAGE
        (route / filter / bucket by dimensions before any real decode)."""
        if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG (bad SOI)")
        pos = 2
        while True:
            if pos + 2 > len(payload):
                raise ValueError("truncated JPEG (no frame header)")
            if payload[pos] != 0xFF:
                raise ValueError(f"bad marker byte at {pos}")
            # 0xFF fill bytes before a marker are legal padding
            while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
                pos += 1
            marker = payload[pos + 1]
            pos += 2
            if marker == 0xD9:  # EOI before any SOF
                raise ValueError("no SOF marker before EOI")
            if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # standalone
                continue
            if pos + 2 > len(payload):
                raise ValueError("truncated JPEG segment length")
            (ln,) = struct.unpack(">H", payload[pos : pos + 2])
            if ln < 2 or pos + ln > len(payload):
                raise ValueError("truncated JPEG segment")
            body = payload[pos + 2 : pos + ln]
            if marker in (0xC0, 0xC1, 0xC2):
                if len(body) < 6:
                    raise ValueError("short SOF segment")
                precision, height, width, ncomp = struct.unpack(">BHHB", body[:6])
                if len(body) != 6 + 3 * ncomp:
                    raise ValueError("SOF component table size mismatch")
                return {
                    "width": width,
                    "height": height,
                    "n_components": ncomp,
                    "precision": precision,
                    "progressive": marker == 0xC2,
                }
            if marker == 0xDA:  # scan starts: frame header must precede
                raise ValueError("SOS before SOF")
            pos += ln

    return encode_jpeg_stub, probe_jpeg


encode_jpeg_stub, probe_jpeg = _build_jpeg_codec()


def _build_wav_codec():
    """Closure factory for the stdlib WAV/PCM16 codec — the AUDIO leg
    of the multimodal contract, and like the PNG codec a REAL decode
    (not a stub): RIFF chunk walk, fmt parse, int16 sample extraction,
    and exact integer signal statistics. Same by-value pickling
    rationale as :func:`_build_png_codec`.

    Encoder hardening mirrors the JPEG decoy: the stream carries a
    LIST chunk whose BODY contains the ASCII bytes ``data`` followed by
    a bogus ~4 GB length (a byte-scan "parser" that searches for the
    data tag reads garbage), plus a ``note`` chunk of odd body length
    (RIFF pads odd chunks with one byte — a walker that forgets the
    pad desynchronizes). Decoder contract: ValueError on structural
    corruption/truncation, NotImplementedError on non-PCM16 encodings
    (production swaps in soundfile/ffmpeg; the Arrow plumbing is
    unchanged).
    """
    import struct

    def encode_wav_pcm16(
        channels: list[list[int]], sample_rate: int, note_len: int = 3
    ) -> bytes:
        """Interleave per-channel int16 sample lists into a WAV stream
        (decoy LIST + odd-padded note + fmt + data chunks)."""
        if not channels:
            raise ValueError("at least one channel required")
        nc = len(channels)
        nf = len(channels[0])
        if any(len(ch) != nf for ch in channels):
            raise ValueError("ragged channels")
        # explicit contract error instead of a struct.error leak (the
        # r4 PNG truncated-chunk lesson: keep failures inside the
        # documented ValueError surface)
        if any(not (-32768 <= v <= 32767) for ch in channels for v in ch):
            raise ValueError("sample out of int16 range")
        block = 2 * nc

        def chunk(tag: bytes, body: bytes) -> bytes:
            pad = b"\x00" if len(body) % 2 else b""
            return tag + struct.pack("<I", len(body)) + body + pad

        fmt = struct.pack(
            "<HHIIHH", 1, nc, sample_rate, sample_rate * block, block, 16
        )
        data = b"".join(
            struct.pack("<h", channels[c][t])
            for t in range(nf)
            for c in range(nc)
        )
        decoy = chunk(b"LIST", b"INFOdata\xf0\xff\xff\xff")
        note = chunk(b"note", bytes((i * 7 + 1) % 256 for i in range(note_len)))
        body = b"WAVE" + decoy + chunk(b"fmt ", fmt) + note + chunk(b"data", data)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def decode_wav(payload: bytes) -> dict:
        """RIFF walk + PCM16 decode + exact integer signal stats:
        peak amplitude, energy (sum of squares), channel-0 zero
        crossings, clipped-sample count, duration in ms."""
        if payload is None or len(payload) < 12 or payload[:4] != b"RIFF":
            raise ValueError("not a WAV (bad RIFF magic)")
        (riff_len,) = struct.unpack("<I", payload[4:8])
        if riff_len != len(payload) - 8:
            raise ValueError("RIFF size field mismatch")
        if payload[8:12] != b"WAVE":
            raise ValueError("not a WAV (bad WAVE form type)")
        pos = 12
        fmt = None
        data = None
        while pos + 8 <= len(payload):
            tag = payload[pos : pos + 4]
            (ln,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            if pos + 8 + ln > len(payload):
                raise ValueError("truncated WAV chunk")
            body = payload[pos + 8 : pos + 8 + ln]
            if tag == b"fmt ":
                if ln < 16:
                    raise ValueError("short fmt chunk")
                fmt = struct.unpack("<HHIIHH", body[:16])
            elif tag == b"data":
                if fmt is None:
                    raise ValueError("data chunk before fmt")
                data = body
                break
            pos += 8 + ln + (ln % 2)  # odd chunks are padded to even
        if fmt is None or data is None:
            raise ValueError("WAV without fmt/data chunks")
        audio_format, nc, sr, byte_rate, block, bits = fmt
        if audio_format != 1 or bits != 16:
            raise NotImplementedError(
                f"unsupported WAV encoding: format={audio_format} bits={bits}"
                " (only PCM16 is stdlib-decodable here)"
            )
        if nc < 1 or block != 2 * nc or byte_rate != sr * block:
            raise ValueError("inconsistent fmt fields")
        if len(data) % block:
            raise ValueError("data chunk not a whole number of frames")
        n_frames = len(data) // block
        samples = struct.unpack(f"<{n_frames * nc}h", data)
        peak = 0
        sum_sq = 0
        n_clipped = 0
        zero_cross = 0
        prev0 = None
        for idx, v in enumerate(samples):
            a = -v if v < 0 else v
            if a > peak:
                peak = a
            sum_sq += v * v
            if v >= 32767 or v <= -32768:
                n_clipped += 1
            if idx % nc == 0:  # channel 0
                if prev0 is not None and (prev0 < 0) != (v < 0):
                    zero_cross += 1
                prev0 = v
        return {
            "n_channels": nc,
            "sample_rate": sr,
            "bits_per_sample": bits,
            "n_frames": n_frames,
            "duration_ms": n_frames * 1000 // sr,
            "peak_abs": peak,
            "sum_sq": sum_sq,
            "zero_cross": zero_cross,
            "n_clipped": n_clipped,
        }

    return encode_wav_pcm16, decode_wav


encode_wav_pcm16, decode_wav = _build_wav_codec()


def wav_roundtrip_features(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic WAV encode→decode round trip per id (the
    ``media_wav_decode`` gate, audio twin of
    :func:`png_roundtrip_features`): per id an
    (id%2+1)-channel, (id%40+12)-frame PCM16 wave at sample rate
    8000 + (id%3)·4000 with sample(c, t) =
    ((id·2654435761 + t·9973 + c·31) mod 65536) − 32768 — the oracle
    replays that arithmetic per sample (a lateral range join), so any
    decoder bug (chunk walk, decoy LIST handling, odd-chunk padding,
    little-endian int16 unpack, stat folds) hash-mismatches. Map-only
    Arrow stage; payload bytes never shuffle.
    """
    enc, dec = encode_wav_pcm16, decode_wav  # pickled by value

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw_id in pdf[id_col]:
                i = int(raw_id)
                nf, sr, nc = i % 40 + 12, 8000 + (i % 3) * 4000, i % 2 + 1
                chans = [
                    [
                        ((i * 2654435761 + t * 9973 + c * 31) % 65536) - 32768
                        for t in range(nf)
                    ]
                    for c in range(nc)
                ]
                d = dec(enc(chans, sr, note_len=i % 5 + 3))
                rows.append(
                    (
                        i,
                        d["n_channels"],
                        d["sample_rate"],
                        d["n_frames"],
                        d["duration_ms"],
                        d["peak_abs"],
                        d["sum_sq"],
                        d["zero_cross"],
                        d["n_clipped"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "n_channels",
                    "sample_rate",
                    "n_frames",
                    "duration_ms",
                    "peak_abs",
                    "sum_sq",
                    "zero_cross",
                    "n_clipped",
                ],
            )

    from data_quality_checks_in_relational_database_spark.functions.scalars import rebalance

    return rebalance(ids.select(id_col)).mapInPandas(
        run,
        schema=f"{id_col} long, n_channels long, sample_rate long, "
        "n_frames long, duration_ms long, peak_abs long, sum_sq long, "
        "zero_cross long, n_clipped long",
    )


def jpeg_probe_features(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic JPEG encode→probe round trip per id (the
    ``media_jpeg_probe`` gate, twin of :func:`png_roundtrip_features`):
    an (id%317+1) × (id%211+1) frame with id%3+1 components,
    progressive iff id is odd, plus the decoy-COM and byte-stuffed
    filler — the oracle replays the arithmetic, so any probe bug
    (segment walk, decoy handling, big-endian field order)
    hash-mismatches. Map-only Arrow stage."""
    enc, probe = encode_jpeg_stub, probe_jpeg  # pickled by value

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw_id in pdf[id_col]:
                i = int(raw_id)
                w, h, nc, prog = i % 317 + 1, i % 211 + 1, i % 3 + 1, i % 2 == 1
                d = probe(enc(w, h, nc, progressive=prog, filler_seed=i))
                rows.append(
                    (i, d["width"], d["height"], d["n_components"], d["progressive"])
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "width", "height", "n_components", "progressive"],
            )

    from data_quality_checks_in_relational_database_spark.functions.scalars import rebalance

    return rebalance(ids.select(id_col)).mapInPandas(
        run,
        schema=f"{id_col} long, width long, height long, "
        "n_components long, progressive boolean",
    )


def _build_mp4_codec():
    """Closure factory for the stdlib MP4 (ISO BMFF) HEADER codec — the
    video leg of the image/audio/video probe triangle (r5 verdict #4;
    PNG/BMP/JPEG and WAV are real, this populates ``MEDIA_SCHEMA``'s
    so-far-dead ``duration_ms`` for video). Same pickling rationale as
    :func:`_build_png_codec`: self-contained returned functions, Arrow
    stages serialize them BY VALUE.

    ISO BMFF is a box tree: each box is ``size:u32 tag:4s payload``,
    with ``size == 1`` meaning a 64-bit largesize follows the tag and
    ``size == 0`` meaning to-end-of-enclosure. ``encode_mp4_stub``
    emits ftyp + free + moov(mvhd + trak(tkhd + mdia(mdhd +
    minf(stbl(stsd))))...) + mdat + skip, with three parser traps: the
    mdat payload carries a DECOY fake-moov/mvhd byte string (a naive
    whole-buffer scan reads bogus timescale/duration from it; a
    size-respecting walker never enters mdat), the mdat box uses the
    64-bit largesize form, and the audio track (when present, and
    sometimes FIRST) has tkhd width/height 0 so "first trak" is the
    wrong video heuristic. ``probe_mp4`` walks the tree: mvhd (v0 or
    v1) → timescale/duration → ``duration_ms = duration·1000 //
    timescale``; first trak with nonzero tkhd width is THE video track
    → 16.16-fixed width/height and its stsd sample-entry format tag as
    the codec. Truncation/overrun/missing boxes raise ValueError (the
    PNG/JPEG/WAV contract).
    """
    import struct

    def _box(tag: bytes, payload: bytes, large: bool = False) -> bytes:
        if large:
            return (
                struct.pack(">I", 1)
                + tag
                + struct.pack(">Q", len(payload) + 16)
                + payload
            )
        return struct.pack(">I", len(payload) + 8) + tag + payload

    _MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)

    def encode_mp4_stub(
        duration: int,
        timescale: int,
        tracks,
        mvhd_version: int = 0,
        filler_seed: int = 0,
    ) -> bytes:
        """``tracks``: sequence of (width, height, codec_tag:bytes) —
        width/height 0 marks an audio track. Emits a structurally valid
        ISO BMFF stream; no sample data beyond deterministic mdat
        filler."""
        if timescale <= 0:
            raise ValueError("timescale must be positive")
        if duration < 0:
            raise ValueError("negative duration")
        if mvhd_version not in (0, 1):
            raise ValueError("mvhd version must be 0 or 1")
        if not tracks:
            raise ValueError("at least one track")
        ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"iso2avc1mp41")
        free = _box(b"free", b"\x00" * (filler_seed % 13))
        if mvhd_version:
            mvhd_body = (
                b"\x01\x00\x00\x00"
                + struct.pack(">QQIQ", 0, 0, timescale, duration)
            )
        else:
            mvhd_body = (
                b"\x00\x00\x00\x00"
                + struct.pack(">IIII", 0, 0, timescale, duration)
            )
        mvhd_body += (
            struct.pack(">i", 0x10000)  # rate 1.0
            + struct.pack(">h", 0x0100)  # volume 1.0
            + b"\x00" * 10
            + _MATRIX
            + b"\x00" * 24
            + struct.pack(">I", len(tracks) + 1)
        )
        mvhd = _box(b"mvhd", mvhd_body)
        traks = b""
        for tid, (w, h, codec) in enumerate(tracks, start=1):
            if not (0 <= w <= 0x7FFF and 0 <= h <= 0x7FFF):
                raise ValueError("track dims must fit 16.16 fixed point")
            if len(codec) != 4:
                raise ValueError("codec tag must be 4 bytes")
            tkhd = _box(
                b"tkhd",
                b"\x00\x00\x00\x07"
                + struct.pack(">IIII", 0, 0, tid, 0)
                + struct.pack(">I", duration)
                + b"\x00" * 8
                + struct.pack(">hhhh", 0, 0, 0 if w else 0x0100, 0)
                + _MATRIX
                + struct.pack(">II", w << 16, h << 16),
            )
            mdhd = _box(
                b"mdhd",
                b"\x00\x00\x00\x00"
                + struct.pack(">IIII", 0, 0, timescale, duration)
                + struct.pack(">HH", 0x55C4, 0),  # language 'und'
            )
            entry = _box(codec, b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 8)
            stsd = _box(b"stsd", b"\x00\x00\x00\x00" + struct.pack(">I", 1) + entry)
            stbl = _box(b"stbl", stsd)
            minf = _box(b"minf", stbl)
            mdia = _box(b"mdia", mdhd + minf)
            traks += _box(b"trak", tkhd + mdia)
        udta = _box(b"udta", _box(b"meta", b"\x00" * 4))
        moov = _box(b"moov", mvhd + traks + udta)
        # DECOY: fake moov+mvhd inside mdat with bogus timescale 0xFA11
        # and duration 0xFA22 — only a size-respecting walker survives
        decoy = (
            struct.pack(">I", 0x20)
            + b"moov"
            + struct.pack(">I", 0x18)
            + b"mvhd"
            + b"\x00\x00\x00\x00"
            + struct.pack(">IIII", 0, 0, 0xFA11, 0xFA22)
        )
        filler = bytes((filler_seed * 7 + j * 13) % 256 for j in range(filler_seed % 29))
        mdat = _box(b"mdat", decoy + filler, large=True)
        skip = _box(b"skip", b"\x00" * (filler_seed % 5))
        return ftyp + free + moov + mdat + skip

    def _walk(buf: bytes, start: int, end: int):
        pos = start
        while pos < end:
            if pos + 8 > end:
                raise ValueError("truncated MP4 box header")
            (sz,) = struct.unpack(">I", buf[pos : pos + 4])
            tag = buf[pos + 4 : pos + 8]
            hdr = 8
            if sz == 1:
                if pos + 16 > end:
                    raise ValueError("truncated MP4 largesize header")
                (sz,) = struct.unpack(">Q", buf[pos + 8 : pos + 16])
                hdr = 16
            elif sz == 0:
                sz = end - pos
            if sz < hdr or pos + sz > end:
                raise ValueError(f"bad MP4 box size {sz} for {tag!r}")
            yield tag, pos + hdr, pos + sz
            pos += sz

    def _find(buf: bytes, start: int, end: int, want: bytes):
        for tag, a, b in _walk(buf, start, end):
            if tag == want:
                return a, b
        return None

    def encode_mp4_samples_stub(
        timescale: int,
        sample_sizes,
        sample_delta: int,
        samples_per_chunk: int,
        video=(64, 48, b"avc1"),
        decoy_len: int = 24,
    ) -> bytes:
        """Single-video-track MP4 WITH full sample tables (stts/stsz/
        stsc/stco) and REAL payload bytes in mdat at the stco-declared
        offsets — the input for :func:`probe_mp4_samples`. Sample j's
        payload is ``sample_sizes[j]`` bytes; a ``decoy_len``-byte
        garbage prefix inside mdat shifts every chunk offset so a
        parser that assumes "mdat body starts at sample 0" reads the
        decoy. Two-pass assembly: stco depends on the moov length,
        which is independent of the offset VALUES (fixed-width u32),
        so the tree is built once with zeros and once with real
        offsets."""
        n = len(sample_sizes)
        if n == 0:
            raise ValueError("at least one sample")
        if sample_delta <= 0 or samples_per_chunk <= 0:
            raise ValueError("positive sample_delta/samples_per_chunk")
        if any(szj < 0 or szj > 0xFFFFFFFF for szj in sample_sizes):
            raise ValueError("sample sizes must fit u32")
        w, h, codec = video
        duration = n * sample_delta
        n_chunks = (n + samples_per_chunk - 1) // samples_per_chunk
        # per-chunk payload start, relative to the first sample byte
        rel = []
        pos = 0
        for j, szj in enumerate(sample_sizes):
            if j % samples_per_chunk == 0:
                rel.append(pos)
            pos += szj

        def build(chunk_offsets) -> bytes:
            ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"iso2avc1mp41")
            mvhd = _box(
                b"mvhd",
                b"\x00\x00\x00\x00"
                + struct.pack(">IIII", 0, 0, timescale, duration)
                + struct.pack(">i", 0x10000)
                + struct.pack(">h", 0x0100)
                + b"\x00" * 10
                + _MATRIX
                + b"\x00" * 24
                + struct.pack(">I", 2),
            )
            tkhd = _box(
                b"tkhd",
                b"\x00\x00\x00\x07"
                + struct.pack(">IIII", 0, 0, 1, 0)
                + struct.pack(">I", duration)
                + b"\x00" * 8
                + struct.pack(">hhhh", 0, 0, 0, 0)
                + _MATRIX
                + struct.pack(">II", w << 16, h << 16),
            )
            mdhd = _box(
                b"mdhd",
                b"\x00\x00\x00\x00"
                + struct.pack(">IIII", 0, 0, timescale, duration)
                + struct.pack(">HH", 0x55C4, 0),
            )
            entry = _box(codec, b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 8)
            stsd = _box(b"stsd", b"\x00\x00\x00\x00" + struct.pack(">I", 1) + entry)
            stts = _box(
                b"stts",
                b"\x00\x00\x00\x00"
                + struct.pack(">I", 1)
                + struct.pack(">II", n, sample_delta),
            )
            stsz = _box(
                b"stsz",
                b"\x00\x00\x00\x00"
                + struct.pack(">II", 0, n)
                + b"".join(struct.pack(">I", s) for s in sample_sizes),
            )
            stsc = _box(
                b"stsc",
                b"\x00\x00\x00\x00"
                + struct.pack(">I", 1)
                + struct.pack(">III", 1, samples_per_chunk, 1),
            )
            stco = _box(
                b"stco",
                b"\x00\x00\x00\x00"
                + struct.pack(">I", n_chunks)
                + b"".join(struct.pack(">I", o) for o in chunk_offsets),
            )
            stbl = _box(b"stbl", stsd + stts + stsz + stsc + stco)
            minf = _box(b"minf", stbl)
            mdia = _box(b"mdia", mdhd + minf)
            trak = _box(b"trak", tkhd + mdia)
            return ftyp + _box(b"moov", mvhd + trak)

        head_len = len(build([0] * n_chunks))
        decoy = bytes((0xA5 + i * 37) % 256 for i in range(decoy_len))
        base = head_len + 8 + decoy_len  # mdat 32-bit header + decoy
        payload = b"".join(
            bytes((j * 7 + bi * 13) % 256 for bi in range(szj))
            for j, szj in enumerate(sample_sizes)
        )
        out = build([base + r for r in rel]) + _box(b"mdat", decoy + payload)
        if len(out) != head_len + 8 + decoy_len + len(payload):
            raise ValueError("mp4 sample layout self-check failed")
        return out

    def probe_mp4_samples(payload: bytes) -> dict:
        """Expand the video track's sample tables into a per-sample
        index: ``samples = [(idx, chunk, offset, size, pts_units)]``
        plus the media timescale — exactly the information a ranged
        reader needs to fetch frame j without touching any other byte
        of a multi-GB file (the 100 TB frame-sampling shape: offsets
        come from a ~KB moov read, data from byte-range requests)."""
        base = probe_mp4(payload)
        if base["width"] is None:
            raise ValueError("no video track to index")
        top = list(_walk(payload, 0, len(payload)))
        moov = next(((a, b) for t, a, b in top if t == b"moov"), None)
        for tag, a, b in _walk(payload, moov[0], moov[1]):
            if tag != b"trak":
                continue
            tk = _find(payload, a, b, b"tkhd")
            if tk is None or tk[1] - tk[0] < 84:
                raise ValueError("trak without full tkhd")
            w16 = struct.unpack(">I", payload[tk[1] - 8 : tk[1] - 4])[0]
            if w16 == 0:
                continue
            mdia = _find(payload, a, b, b"mdia")
            if mdia is None:
                raise ValueError("video trak missing mdia")
            md = _find(payload, mdia[0], mdia[1], b"mdhd")
            if md is None or md[1] - md[0] < 20:
                raise ValueError("video trak missing full mdhd")
            media_ts = struct.unpack(">I", payload[md[0] + 12 : md[0] + 16])[0]
            if media_ts == 0:
                raise ValueError("mdhd timescale 0")
            minf = _find(payload, mdia[0], mdia[1], b"minf")
            if minf is None:
                raise ValueError("video trak missing minf")
            stbl = _find(payload, minf[0], minf[1], b"stbl")
            if stbl is None:
                raise ValueError("video trak missing stbl")
            boxes = {}
            for want in (b"stts", b"stsz", b"stsc", b"stco"):
                got = _find(payload, stbl[0], stbl[1], want)
                if got is None:
                    raise ValueError(f"video stbl missing {want!r}")
                boxes[want] = got

            def u32s(span, skip, count):
                a0 = span[0] + skip
                if a0 + 4 * count > span[1]:
                    raise ValueError("truncated sample table")
                return list(struct.unpack(f">{count}I", payload[a0 : a0 + 4 * count]))

            (n_stts,) = struct.unpack(
                ">I", payload[boxes[b"stts"][0] + 4 : boxes[b"stts"][0] + 8]
            )
            stts = u32s(boxes[b"stts"], 8, 2 * n_stts)
            sz_fixed, n_samples = struct.unpack(
                ">II", payload[boxes[b"stsz"][0] + 4 : boxes[b"stsz"][0] + 12]
            )
            sizes = (
                [sz_fixed] * n_samples
                if sz_fixed
                else u32s(boxes[b"stsz"], 12, n_samples)
            )
            (n_stsc,) = struct.unpack(
                ">I", payload[boxes[b"stsc"][0] + 4 : boxes[b"stsc"][0] + 8]
            )
            stsc = u32s(boxes[b"stsc"], 8, 3 * n_stsc)
            (n_chunks,) = struct.unpack(
                ">I", payload[boxes[b"stco"][0] + 4 : boxes[b"stco"][0] + 8]
            )
            stco = u32s(boxes[b"stco"], 8, n_chunks)
            # expand stts to per-sample pts
            pts, t = [], 0
            for e in range(n_stts):
                cnt, delta = stts[2 * e], stts[2 * e + 1]
                for _ in range(cnt):
                    pts.append(t)
                    t += delta
            if len(pts) != n_samples:
                raise ValueError("stts total != stsz sample count")
            # expand stsc runs to per-chunk sample counts
            spc = []
            for e in range(n_stsc):
                first = stsc[3 * e]
                count = stsc[3 * e + 1]
                last = stsc[3 * (e + 1)] if e + 1 < n_stsc else n_chunks + 1
                spc += [count] * (last - first)
            samples, j = [], 0
            for ci, coff in enumerate(stco):
                off = coff
                for _ in range(spc[ci] if ci < len(spc) else 0):
                    if j >= n_samples:
                        break
                    samples.append((j, ci, off, sizes[j], pts[j]))
                    off += sizes[j]
                    j += 1
            if j != n_samples:
                raise ValueError("chunk layout does not cover all samples")
            return {"media_timescale": media_ts, "samples": samples}
        raise ValueError("no video track to index")

    def probe_mp4(payload: bytes) -> dict:
        if payload is None or len(payload) < 8:
            raise ValueError("not an MP4 (too short)")
        top = list(_walk(payload, 0, len(payload)))
        if not top or top[0][0] != b"ftyp":
            raise ValueError("not an MP4 (no leading ftyp)")
        moov = next(((a, b) for t, a, b in top if t == b"moov"), None)
        if moov is None:
            raise ValueError("no moov box")
        mv = _find(payload, moov[0], moov[1], b"mvhd")
        if mv is None:
            raise ValueError("no mvhd box")
        ver = payload[mv[0]]
        if ver == 1:
            if mv[1] - mv[0] < 32:
                raise ValueError("short mvhd v1")
            _, _, timescale, duration = struct.unpack(
                ">QQIQ", payload[mv[0] + 4 : mv[0] + 32]
            )
        elif ver == 0:
            if mv[1] - mv[0] < 20:
                raise ValueError("short mvhd v0")
            _, _, timescale, duration = struct.unpack(
                ">IIII", payload[mv[0] + 4 : mv[0] + 20]
            )
        else:
            raise ValueError(f"unknown mvhd version {ver}")
        if timescale == 0:
            raise ValueError("mvhd timescale 0")
        n_tracks = 0
        width = height = None
        codec = None
        for tag, a, b in _walk(payload, moov[0], moov[1]):
            if tag != b"trak":
                continue
            n_tracks += 1
            if width is not None:
                continue  # video track already found
            tk = _find(payload, a, b, b"tkhd")
            if tk is None:
                raise ValueError("trak without tkhd")
            if tk[1] - tk[0] < 84:
                raise ValueError("short tkhd")
            w16, h16 = struct.unpack(">II", payload[tk[1] - 8 : tk[1]])
            if w16 == 0:
                continue  # audio track (width 0) — not the video trak
            width, height = w16 >> 16, h16 >> 16
            path = (a, b)
            for part in (b"mdia", b"minf", b"stbl", b"stsd"):
                path = _find(payload, path[0], path[1], part)
                if path is None:
                    raise ValueError(f"video trak missing {part!r}")
            (n_entries,) = struct.unpack(
                ">I", payload[path[0] + 4 : path[0] + 8]
            )
            if n_entries < 1:
                raise ValueError("empty stsd")
            entry = next(iter(_walk(payload, path[0] + 8, path[1])), None)
            if entry is None:
                raise ValueError("stsd entry truncated")
            codec = entry[0].decode("latin-1")
        return {
            "duration_ms": duration * 1000 // timescale,
            "timescale": timescale,
            "duration": duration,
            "n_tracks": n_tracks,
            "width": width,
            "height": height,
            "codec": codec,
        }

    return encode_mp4_stub, probe_mp4, encode_mp4_samples_stub, probe_mp4_samples


(
    encode_mp4_stub,
    probe_mp4,
    encode_mp4_samples_stub,
    probe_mp4_samples,
) = _build_mp4_codec()


_MP4_CODECS = ("avc1", "hvc1", "vp09", "av01")


def mp4_probe_features(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic MP4 encode→probe round trip per id (the
    ``media_mp4_probe`` gate, twin of :func:`jpeg_probe_features`):
    timescale (id%5+1)·600, duration id%99991+1 movie units, a video
    track of (id%1920+16) × (id%1080+16) with codec tag cycling
    avc1/hvc1/vp09/av01, an EXTRA audio track when id%3==0 — placed
    FIRST when id%6==0, so the probe's nonzero-width track selection is
    exercised, not just "first trak" — mvhd v1 for odd ids, the decoy
    fake-moov inside a largesize mdat always. The oracle replays the
    arithmetic; any box-walk bug (largesize, decoy, 16.16 unpack, v0/v1
    field widths, audio-first ordering) hash-mismatches. Map-only
    Arrow stage."""
    enc, probe = encode_mp4_stub, probe_mp4  # pickled by value

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw_id in pdf[id_col]:
                i = int(raw_id)
                video = (i % 1920 + 16, i % 1080 + 16, _MP4_CODECS[i % 4].encode())
                tracks = [video]
                if i % 3 == 0:
                    audio = (0, 0, b"mp4a")
                    tracks = [audio, video] if i % 6 == 0 else [video, audio]
                d = probe(
                    enc(
                        i % 99991 + 1,
                        (i % 5 + 1) * 600,
                        tracks,
                        mvhd_version=i % 2,
                        filler_seed=i,
                    )
                )
                rows.append(
                    (
                        i,
                        d["duration_ms"],
                        d["timescale"],
                        d["n_tracks"],
                        d["width"],
                        d["height"],
                        d["codec"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "duration_ms", "timescale", "n_tracks",
                    "width", "height", "codec",
                ],
            )

    from data_quality_checks_in_relational_database_spark.functions.scalars import rebalance

    return rebalance(ids.select(id_col)).mapInPandas(
        run,
        schema=f"{id_col} long, duration_ms long, timescale long, "
        "n_tracks long, width long, height long, codec string",
    )


def mp4_frame_index_features(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic MP4 sample-table round trip per id, EXPLODED to
    one row per video sample (the ``media_mp4_frames`` gate): encode a
    single-video-track MP4 with full stts/stsz/stsc/stco tables —
    id%9+1 samples of (id+j)%17+4 bytes, id%3+1 samples per chunk, a
    (24+id%7)-byte decoy prefix inside mdat shifting every chunk
    offset — then expand the tables back to (sample_idx, chunk_idx,
    offset, size, pts) and CHECKSUM the payload bytes AT the
    stco-derived absolute offset. The checksum is the teeth: the
    oracle replays it from the (id, j) arithmetic, so a probe that
    mis-expands stsc runs, forgets the decoy shift, or slips one byte
    on any chunk boundary reads wrong bytes and hash-mismatches —
    absolute offsets are verified through CONTENT, with no header-size
    arithmetic in SQL. This is the ranged-read frame-sampling shape at
    100 TB: a ~KB moov read yields (offset, size) pairs; frames arrive
    by byte-range request. Map-only Arrow stage."""
    enc, probe = encode_mp4_samples_stub, probe_mp4_samples  # by value

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw_id in pdf[id_col]:
                i = int(raw_id)
                n = i % 9 + 1
                sizes = [(i + j) % 17 + 4 for j in range(n)]
                ts, delta, spc = (i % 5 + 1) * 600, (i % 5 + 1) * 100, i % 3 + 1
                blob = enc(ts, sizes, delta, spc, decoy_len=24 + i % 7)
                d = probe(blob)
                for j, ci, off, sz, pts in d["samples"]:
                    rows.append(
                        (
                            i,
                            j,
                            ci,
                            sz,
                            pts * 1000 // d["media_timescale"],
                            sum(blob[off : off + sz]) % 65536,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "sample_idx", "chunk_idx", "size", "pts_ms", "checksum",
                ],
            )

    from data_quality_checks_in_relational_database_spark.functions.scalars import rebalance

    return rebalance(ids.select(id_col)).mapInPandas(
        run,
        schema=f"{id_col} long, sample_idx long, chunk_idx long, "
        "size long, pts_ms long, checksum long",
    )


#: dHash geometry: 9 columns × 8 rows ⇒ 8 comparisons per row, 64 bits,
#: carried as FOUR 16-bit band integers (the SimHash-style banding unit:
#: hamming ≤ 3 ⇒ pigeonhole guarantees one band is IDENTICAL, so a
#: 4-way band equi-join is a LOSSLESS candidate generator at that radius)
_DHASH_W, _DHASH_H = 9, 8
_DHASH_GROUPS = 17
_DHASH_MAX_HAMMING = 3


def _build_dhash():
    """Closure factory (the :func:`_build_png_codec` pickling rationale:
    Arrow stages must serialize the hash fold BY VALUE — a module-level
    def pickles by reference and breaks on workers without this package
    on ``sys.path``)."""

    def dhash_bands(pixels: bytes, w: int = _DHASH_W, h: int = _DHASH_H) -> tuple:
        """Difference-hash of a row-major grayscale pixel buffer: bit
        (y, x) = p[y][x] > p[y][x+1], packed little-endian into ⌈64/16⌉
        16-bit bands. Pure integer function of the pixels — the oracle
        replays it with SUM(CASE)·2^k arithmetic."""
        bands = [0, 0, 0, 0]
        for y in range(h):
            for x in range(w - 1):
                if pixels[y * w + x] > pixels[y * w + x + 1]:
                    pos = y * (w - 1) + x
                    bands[pos // 16] |= 1 << (pos % 16)
        return tuple(bands)

    return dhash_bands


_dhash_bands = _build_dhash()


def png_dhash_features(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PNG encode → REAL decode → dHash per id: the
    perceptual-hash leg of the media-dedup family (exact byte dedup is
    ``media_dedup``; this catches re-encoded/slightly-retouched copies
    whose bytes differ but whose pixel STRUCTURE matches). Payloads are
    generated from each id's arithmetic (TESTDATA.md ships no binary
    column): group ``id % 17`` fixes the base image — a pseudo-random
    9×8 grayscale ``(g·2654435761 + y·9973 + x·31) mod 256`` so the 64
    dHash bits are dense and bands are selective — and ids with
    ``id % 4 == 1`` perturb ONE pixel (+64 mod 256), flipping ≤ 2 dHash
    bits: within-group pairs land at hamming ≤ 2·2, across-group pairs
    at ~32. The image rides a full PNG roundtrip (scanline filter
    ``id % 5`` — all five types occur), so the hash gates the REAL
    decoder's pixel recovery, not just its stats fold. Map-only Arrow
    stage; 4 × 16-bit band ints per id is all that ever shuffles."""
    enc, dec = encode_png_gray, decode_png
    w, h, groups = _DHASH_W, _DHASH_H, _DHASH_GROUPS
    dhash = _dhash_bands

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw_id in pdf[id_col]:
                i = int(raw_id)
                g = i % groups
                px = [
                    [(g * 2654435761 + y * 9973 + x * 31) % 256 for x in range(w)]
                    for y in range(h)
                ]
                if i % 4 == 1:
                    y0, x0 = i % h, i % w
                    px[y0][x0] = (px[y0][x0] + 64) % 256
                d = dec(enc(px, filter_type=i % 5))
                assert d["width"] == w and d["height"] == h
                b0, b1, b2, b3 = dhash(d["pixels"])
                rows.append((i, b0, b1, b2, b3))
            yield pd.DataFrame(rows, columns=[id_col, "b0", "b1", "b2", "b3"])

    from data_quality_checks_in_relational_database_spark.functions.scalars import (
        rebalance,
    )

    return rebalance(ids.select(id_col)).mapInPandas(
        run, schema=f"{id_col} long, b0 long, b1 long, b2 long, b3 long"
    )


def dhash_near_pairs(
    hashed: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = _DHASH_MAX_HAMMING,
    max_bucket_size: int | None = None,
    max_candidates_per_record: int | None = None,
) -> DataFrame:
    """All id pairs whose 64-bit dHash differs in ≤ ``max_hamming``
    bits, via LOSSLESS band blocking: with 4 bands and ``max_hamming``
    ≤ 3, every qualifying pair shares at least one identical band
    (pigeonhole), so candidates come from four 16-bit equi-joins —
    never an all-pairs comparison — and the exact hamming verify only
    touches candidates. Raising ``max_hamming`` past 3 breaks the
    pigeonhole guarantee; the operator refuses rather than silently
    losing recall.

    ``max_bucket_size`` is the HOT-BUCKET GUARD (r5 verdict #6): a
    band value shared by more than this many images (the classic LSH
    degeneracy — e.g. every all-black thumbnail shares a dHash band of
    0x0000) contributes bucket² candidate rows; with the cap, that
    band's bucket is EXCLUDED from the equi-join on both sides. This
    is a documented recall trade, not silent loss: a pair whose ONLY
    identical band is a hot bucket is dropped, and
    :func:`..operators.dedup.band_bucket_audit` reports exactly how
    much pair mass each cap removes BEFORE you pick one. ``None``
    (default) keeps the lossless contract.

    Output: ``(doc_id_a, doc_id_b, hamming)`` with a < b.
    """
    if max_hamming > 3:
        raise ValueError(
            "4-band blocking is lossless only for max_hamming <= 3; "
            f"got {max_hamming} (add bands or use a direct join)"
        )
    # the hash frame is referenced 8× below (two sides × four band
    # joins); left lazy, an expensive upstream plan — the Arrow
    # encode→decode→hash stage — would re-execute per reference
    # (bfs_hops lineage discipline; measured ~3× on the clusters query)
    hashed = hashed.localCheckpoint()
    if max_candidates_per_record is not None:
        # ENFORCED candidate budget (r6 verdict #5): the four band
        # equi-joins materialize Σ_bands Σ C(bucket, 2) candidate rows
        # — a boilerplate-image lake (every near-black thumbnail shares
        # a band value) sends that quadratic in bucket size. Price the
        # whole 4-band bucket space with one aggregation over the
        # unpivoted (band, value) keys BEFORE any join; refuse loudly
        # past the budget and name the capped twin.
        from data_quality_checks_in_relational_database_spark.operators.fuzzy import (
            _enforce_candidate_budget,
        )

        unpiv = hashed.select(
            F.explode(
                F.array(*[
                    F.struct(F.lit(k).alias("band"), F.col(f"b{k}").alias("val"))
                    for k in range(4)
                ])
            ).alias("bv")
        ).select(F.col("bv.band").alias("blk0"), F.col("bv.val").alias("blk1"))
        _enforce_candidate_budget(
            unpiv,
            n_block_cols=2,
            max_pairs_per_record=max_candidates_per_record,
            op_name="dhash_near_pairs",
            alternative=(
                "pass max_bucket_size to excise the hot buckets (the "
                "media_dhash_pairs_capped contract — band_bucket_audit "
                "prices the recall loss per cap), or add bands."
            ),
        )
    a = hashed.select(
        F.col(id_col).alias("ida"),
        *[F.col(f"b{k}").alias(f"a{k}") for k in range(4)],
    )
    b = hashed.select(
        F.col(id_col).alias("idb"),
        *[F.col(f"b{k}").alias(f"bb{k}") for k in range(4)],
    )
    cands = None
    for k in range(4):
        a_k, b_k = a, b
        if max_bucket_size is not None:
            # hot buckets are TINY by definition (each holds > cap
            # rows, so there are < n/cap of them) — broadcast anti-join
            hot = (
                hashed.groupBy(F.col(f"b{k}").alias(f"a{k}"))
                .agg(F.count(F.lit(1)).alias("sz"))
                .where(F.col("sz") > int(max_bucket_size))
                .select(f"a{k}")
            )
            a_k = a.join(F.broadcast(hot), f"a{k}", "left_anti")
            b_k = b.join(
                F.broadcast(hot.select(F.col(f"a{k}").alias(f"bb{k}"))),
                f"bb{k}",
                "left_anti",
            )
        c = a_k.join(
            b_k,
            (F.col(f"a{k}") == F.col(f"bb{k}")) & (F.col("ida") < F.col("idb")),
        )
        cands = c if cands is None else cands.unionByName(c)
    cands = cands.dropDuplicates(["ida", "idb"])
    ham = sum(
        F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"bb{k}"))) for k in range(4)
    )
    return (
        cands.withColumn("hamming", ham.cast("long"))
        .where(F.col("hamming") <= max_hamming)
        .select(
            F.col("ida").alias("doc_id_a"),
            F.col("idb").alias("doc_id_b"),
            "hamming",
        )
    )


def _build_bmp_codec():
    """Closure factory for a REAL stdlib BMP codec (the
    :func:`_build_png_codec` pickling rationale): 24-bit uncompressed
    BI_RGB, both bottom-up (positive biHeight — the overwhelmingly
    common layout) and top-down (negative biHeight) row orders, with
    the 4-byte row padding the format mandates. BMP is the remaining
    "everywhere" raster format after PNG/JPEG — and its two row orders
    plus padding are exactly the details naive parsers silently get
    wrong, so the decoder emits a POSITION-WEIGHTED pixel checksum
    (Σ v·(idx+1) over row-major RGB order, mod 2³¹) that mismatches on
    any flipped row order, swapped BGR channels, or padding slip —
    bugs a plain brightness mean cannot see.
    """
    import struct

    def encode_bmp24(pixels, topdown: bool = False) -> bytes:
        """24-bit BI_RGB BMP from rows of (r, g, b) tuples (0..255)."""
        h = len(pixels)
        w = len(pixels[0])
        if h == 0 or w == 0:
            raise ValueError("empty BMP")
        pad = (-3 * w) % 4
        rows = pixels if topdown else list(reversed(pixels))
        body = bytearray()
        for row in rows:
            if len(row) != w:
                raise ValueError("ragged BMP rows")
            for r, g, b in row:
                if not (0 <= r <= 255 and 0 <= g <= 255 and 0 <= b <= 255):
                    raise ValueError("BMP sample out of range")
                body += bytes((b, g, r))  # BMP stores BGR
            body += bytes(pad)
        bi_height = -h if topdown else h
        info = struct.pack("<IiiHHIIiiII", 40, w, bi_height, 1, 24, 0,
                           len(body), 2835, 2835, 0, 0)
        off = 14 + 40
        head = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
        return bytes(head + info + body)

    def decode_bmp(payload: bytes) -> dict:
        """Parse + decode a 24-bit BI_RGB BMP: header fields, row-order
        normalization (bottom-up flipped to row-major), padding strip,
        BGR→RGB, exact integer brightness (``sum·1000 // n``) and the
        position-weighted checksum described above."""
        if payload[:2] != b"BM":
            raise ValueError("not a BMP (bad magic)")
        if len(payload) < 54:
            raise ValueError("truncated BMP header")
        (_, _fsz, _, _, off) = struct.unpack("<2sIHHI", payload[:14])
        (isz, w, bi_h, planes, bpp, comp) = struct.unpack(
            "<IiiHHI", payload[14:34]
        )
        if isz < 40 or planes != 1:
            raise ValueError("bad BMP info header")
        if bpp != 24 or comp != 0:
            raise NotImplementedError(
                f"unsupported BMP variant: bpp={bpp} compression={comp}"
            )
        topdown = bi_h < 0
        h = -bi_h if topdown else bi_h
        if w <= 0 or h <= 0:
            raise ValueError("bad BMP dimensions")
        pad = (-3 * w) % 4
        stride = 3 * w + pad
        if off + stride * h > len(payload):
            raise ValueError("truncated BMP pixel data")
        rows = []
        for y in range(h):
            line = payload[off + y * stride : off + y * stride + 3 * w]
            rows.append([
                (line[3 * x + 2], line[3 * x + 1], line[3 * x])  # BGR→RGB
                for x in range(w)
            ])
        if not topdown:
            rows.reverse()
        total = 0
        wsum = 0
        idx = 0
        for row in rows:
            for r, g, b in row:
                for v in (r, g, b):
                    total += v
                    idx += 1
                    wsum = (wsum + v * idx) % 2147483647
        n = 3 * w * h
        return {
            "width": w,
            "height": h,
            "bpp": bpp,
            "topdown": topdown,
            "n_samples": n,
            "brightness_milli": (total * 1000) // n,
            "weighted_checksum": wsum,
        }

    return encode_bmp24, decode_bmp


encode_bmp24, decode_bmp = _build_bmp_codec()


def bmp_roundtrip_features(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic BMP encode → REAL decode round trip per id — the
    BMP sibling of :func:`png_roundtrip_features`. Per id: an
    (id%11+1) × (id%6+1) RGB image with channel samples
    ``(id·31 + 11·y + 3·x + 7·c) mod 256``, stored TOP-DOWN for odd
    ids and bottom-up otherwise (both row orders occur in the corpus,
    so a decoder that skips the bottom-up flip fails the checksum
    gate). Map-only Arrow stage."""
    enc, dec = encode_bmp24, decode_bmp

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw_id in pdf[id_col]:
                i = int(raw_id)
                w, h = i % 11 + 1, i % 6 + 1
                px = [
                    [
                        tuple(
                            (i * 31 + 11 * y + 3 * x + 7 * c) % 256
                            for c in range(3)
                        )
                        for x in range(w)
                    ]
                    for y in range(h)
                ]
                d = dec(enc(px, topdown=i % 2 == 1))
                rows.append(
                    (
                        i,
                        d["width"],
                        d["height"],
                        d["topdown"],
                        d["n_samples"],
                        d["brightness_milli"],
                        d["weighted_checksum"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "width", "height", "topdown", "n_samples",
                    "brightness_milli", "weighted_checksum",
                ],
            )

    from data_quality_checks_in_relational_database_spark.functions.scalars import (
        rebalance,
    )

    return rebalance(ids.select(id_col)).mapInPandas(
        run,
        schema=f"{id_col} long, width long, height long, topdown boolean, "
        "n_samples long, brightness_milli long, weighted_checksum long",
    )


def _build_mp3_codec():
    """Closure factory for the stdlib MP3 frame-header codec — the
    COMPRESSED-audio leg next to WAV/PCM16 (raw audio) and MP4 (video
    container). Same by-value pickling rationale as
    :func:`_build_png_codec`.

    ``encode_mp3_stub`` emits an ID3v2-tagged stream of structurally
    valid MPEG-1 Layer III frames: the ID3 tag length is a SYNCSAFE
     28-bit integer and its body carries a DECOY ``FF FB`` sync pair —
    a byte-scan "parser" finds a bogus frame inside the tag; only a
    walker that skips the tag by its syncsafe length survives. Frame
    payload lengths follow the Layer III formula
    ``144000·kbps // sample_rate + padding`` so the walk lands exactly
    on each next header (and exactly at EOF — anything else raises).

    Decoder contract (like PNG/WAV): ValueError on structural
    corruption/truncation/invalid indices, NotImplementedError on
    non-MPEG-1 or non-Layer-III streams (production swaps in
    ffmpeg/mutagen; the Arrow plumbing is unchanged).
    """

    KBPS = [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
    SR = [44100, 48000, 32000]
    MODES = ["stereo", "joint_stereo", "dual_channel", "mono"]

    def encode_mp3_stub(
        bitrate_idx: int,
        sr_idx: int,
        n_frames: int,
        mode: int,
        id3_body_len: int = 16,
        pad_seed: int = 0,
    ) -> bytes:
        if not (1 <= bitrate_idx <= 14):
            raise ValueError("bitrate index must be 1..14")
        if not (0 <= sr_idx <= 2):
            raise ValueError("sample-rate index must be 0..2")
        if n_frames < 1:
            raise ValueError("need at least one frame")
        if id3_body_len < 4:
            raise ValueError("ID3 body too small for the decoy")
        # ID3v2.3 header: 'ID3', version, flags, syncsafe size
        size = id3_body_len
        syncsafe = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        )
        body = bytearray((pad_seed * 7 + j * 3) % 128 for j in range(id3_body_len))
        body[1:3] = b"\xff\xfb"  # the decoy sync pair INSIDE the tag
        out = bytearray(b"ID3\x03\x00\x00" + syncsafe + bytes(body))
        kbps = KBPS[bitrate_idx - 1]
        sr = SR[sr_idx]
        for f in range(n_frames):
            pad = (pad_seed + f) % 2
            flen = 144000 * kbps // sr + pad
            hdr = bytes(
                [
                    0xFF,
                    0xFB,  # sync + MPEG1 + Layer III + no CRC
                    (bitrate_idx << 4) | (sr_idx << 2) | (pad << 1),
                    mode << 6,
                ]
            )
            filler = bytes((f * 17 + j * 11) % 255 for j in range(flen - 4))
            out += hdr + filler
        return bytes(out)

    def probe_mp3(payload: bytes) -> dict:
        """ID3-aware frame walk: skips the tag by its syncsafe length,
        then parses consecutive Layer III headers, advancing by the
        computed frame length — never scanning for sync bytes (the tag
        decoy punishes scanners). Returns stream stats without touching
        any audio payload byte — the 100 TB triage shape."""
        if payload is None or len(payload) < 10:
            raise ValueError("not an MP3 (too short)")
        pos = 0
        id3_bytes = 0
        if payload[:3] == b"ID3":
            ss = payload[6:10]
            if any(b & 0x80 for b in ss):
                raise ValueError("corrupt syncsafe ID3 size")
            id3_bytes = 10 + ((ss[0] << 21) | (ss[1] << 14) | (ss[2] << 7) | ss[3])
            pos = id3_bytes
            if pos > len(payload):
                raise ValueError("ID3 tag longer than stream")
        n_frames = 0
        first = None
        while pos < len(payload):
            if pos + 4 > len(payload):
                raise ValueError("truncated MP3 frame header")
            b0, b1, b2, b3 = payload[pos : pos + 4]
            if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
                raise ValueError(f"lost sync at {pos}")
            version = (b1 >> 3) & 0x3
            layer = (b1 >> 1) & 0x3
            if version != 0x3:
                raise NotImplementedError("only MPEG-1 streams supported")
            if layer != 0x1:
                raise NotImplementedError("only Layer III streams supported")
            bidx = (b2 >> 4) & 0xF
            sidx = (b2 >> 2) & 0x3
            if not (1 <= bidx <= 14):
                raise ValueError("invalid bitrate index")
            if sidx > 2:
                raise ValueError("invalid sample-rate index")
            pad = (b2 >> 1) & 0x1
            mode = (b3 >> 6) & 0x3
            if first is None:
                first = (bidx, sidx, mode)
            flen = 144000 * KBPS[bidx - 1] // SR[sidx] + pad
            if pos + flen > len(payload):
                raise ValueError("truncated MP3 frame body")
            pos += flen
            n_frames += 1
        if first is None:
            raise ValueError("no MP3 frames after the tag")
        bidx, sidx, mode = first
        sr = SR[sidx]
        return {
            "n_frames": n_frames,
            "sample_rate": sr,
            "bitrate_kbps": KBPS[bidx - 1],
            "mode": MODES[mode],
            # 1152 samples per MPEG-1 Layer III frame
            "duration_ms": n_frames * 1152 * 1000 // sr,
            "id3_bytes": id3_bytes,
            "total_bytes": len(payload),
        }

    return encode_mp3_stub, probe_mp3


encode_mp3_stub, probe_mp3 = _build_mp3_codec()


def mp3_probe_features(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic MP3 encode → ID3-aware frame walk per id — the
    compressed-audio probe of the media family. Payload parameters come
    from each id's arithmetic (TESTDATA.md ships no binary column):
    bitrate index ``id % 14 + 1``, sample-rate index ``id % 3``,
    ``id % 7 + 2`` frames, channel mode ``id % 4``, ID3 body
    ``id % 50 + 10`` bytes (with the embedded decoy sync pair),
    per-frame padding bit ``(id + f) % 2``. Map-only Arrow stage; the
    oracle replays every field from the same arithmetic."""
    enc, probe = encode_mp3_stub, probe_mp3

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw_id in pdf[id_col]:
                i = int(raw_id)
                p = probe(
                    enc(
                        bitrate_idx=i % 14 + 1,
                        sr_idx=i % 3,
                        n_frames=i % 7 + 2,
                        mode=i % 4,
                        id3_body_len=i % 50 + 10,
                        pad_seed=i,
                    )
                )
                rows.append(
                    (
                        i,
                        p["n_frames"],
                        p["sample_rate"],
                        p["bitrate_kbps"],
                        p["mode"],
                        p["duration_ms"],
                        p["id3_bytes"],
                        p["total_bytes"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_frames", "sample_rate", "bitrate_kbps",
                    "mode", "duration_ms", "id3_bytes", "total_bytes",
                ],
            )

    from data_quality_checks_in_relational_database_spark.functions.scalars import (
        rebalance,
    )

    return rebalance(ids.select(id_col)).mapInPandas(
        run,
        schema=f"{id_col} long, n_frames long, sample_rate long, "
        "bitrate_kbps long, mode string, duration_ms long, "
        "id3_bytes long, total_bytes long",
    )
