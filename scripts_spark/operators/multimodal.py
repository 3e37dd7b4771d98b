"""Multimodal column operators: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas
signatures, partition sizing — is real and tested. Decoding:

- **PNG images decode for real**: PNG is zlib + struct, both stdlib,
  so `decode_png` parses IHDR/IDAT, inflates, reverses all five
  per-row filters, and `extract_features(fake=False)` computes actual
  per-channel statistics. `encode_png` (same file) builds valid PNGs
  for fixtures, so the roundtrip is pinned without any image library.
- **PCM WAV audio decodes for real** the same way (`decode_wav`:
  RIFF chunk walk, struct-unpacked samples, duration/rms/zero-crossing
  features; `encode_wav` builds fixtures).
- compressed formats (JPEG/MP3/…) remain STUBBED — entropy codecs are
  not reimplementable here: NotImplementedError, or pass ``fake=True``
  for the deterministic content-hash stand-in that exercises the
  distributed plumbing end-to-end with arbitrary bytes.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("sha256", StringType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)

FEATURE_DIM = 16


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real image/audio feature extractor:
    16 floats derived from the payload digest."""
    d = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in d[:FEATURE_DIM]]


# --------------------------------------------------- real PNG codec
PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal valid 8-bit RGB PNG (filter 0 rows) from raw pixel
    bytes — stdlib only; used to build REAL image fixtures."""
    assert len(rgb) == width * height * 3

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    stride = width * 3
    raw = b"".join(
        b"\x00" + rgb[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """Parse + inflate + de-filter an 8-bit RGB PNG (all five filter
    types). Returns (width, height, raw RGB bytes)."""
    if not payload.startswith(PNG_MAGIC):
        raise NotImplementedError("not a PNG payload")
    pos, width, height, idat = len(PNG_MAGIC), None, None, b""
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + tag + data + crc
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data[:13]
            )
            if depth != 8 or ctype != 2:
                raise NotImplementedError("only 8-bit RGB PNGs supported")
            # Adam7-interlaced (or nonstandard compression/filter
            # method) data would be silently de-filtered as garbage —
            # refuse loudly instead
            if comp != 0 or filt != 0 or interlace != 0:
                raise NotImplementedError(
                    "only non-interlaced deflate/adaptive-filter PNGs supported"
                )
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if width is None:
        raise NotImplementedError("no IHDR chunk")
    raw = zlib.decompress(idat)
    stride, bpp = width * 3, 3
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        row = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        for x in range(stride):
            a = row[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if f == 1:
                row[x] = (row[x] + a) & 0xFF
            elif f == 2:
                row[x] = (row[x] + b) & 0xFF
            elif f == 3:
                row[x] = (row[x] + (a + b) // 2) & 0xFF
            elif f == 4:
                row[x] = (row[x] + _paeth(a, b, c)) & 0xFF
        out += row
        prev = bytes(row)
    return width, height, bytes(out)


def png_features(payload: bytes) -> list[float]:
    """FEATURE_DIM real statistics from a decoded PNG: dimensions,
    per-channel mean/min/max, 5-bucket luma histogram."""
    w, h, rgb = decode_png(payload)
    n = w * h
    chans = [rgb[i::3] for i in range(3)]
    feats: list[float] = [float(w), float(h)]
    for ch in chans:
        feats.append(sum(ch) / (255.0 * n))
    for ch in chans:
        feats.append(min(ch) / 255.0)
    for ch in chans:
        feats.append(max(ch) / 255.0)
    hist = [0] * 5
    for i in range(n):
        luma = (rgb[3 * i] + rgb[3 * i + 1] + rgb[3 * i + 2]) // 3
        hist[min(luma * 5 // 256, 4)] += 1
    feats += [c / n for c in hist]
    assert len(feats) == FEATURE_DIM
    return feats


def decode_image(payload: bytes) -> tuple[int, int, bytes]:
    """Real decode for PNG; other formats need pillow/opencv (not in
    this container)."""
    if payload.startswith(PNG_MAGIC):
        return decode_png(payload)
    raise NotImplementedError(
        "only PNG decodes without image libs; "
        "use extract_features(..., fake=True) for the plumbing path"
    )


# --------------------------------------------------- real WAV codec
WAV_MAGIC = b"RIFF"


def encode_wav(rate: int, samples: list[int]) -> bytes:
    """Minimal valid mono PCM16 WAV from integer samples — stdlib
    only; used to build REAL audio fixtures."""
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """Parse a PCM16 WAV: returns (rate, channels, samples)."""
    if not (payload.startswith(b"RIFF") and payload[8:12] == b"WAVE"):
        raise NotImplementedError("not a RIFF/WAVE payload")
    pos, rate, channels, bits, data = 12, None, None, None, b""
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt_code, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt_code != 1 or bits != 16:
                raise NotImplementedError("only PCM16 WAV supported")
        elif tag == b"data":
            data += body
    if rate is None or not data:
        raise NotImplementedError("missing fmt/data chunk")
    n = len(data) // 2
    samples = list(struct.unpack(f"<{n}h", data[: n * 2]))
    return rate, channels, samples


def wav_features(payload: bytes) -> list[float]:
    """FEATURE_DIM real statistics from a decoded WAV: duration, rate,
    channels, rms/min/max, zero-crossing rate, 8-bucket |amp| histogram."""
    rate, channels, samples = decode_wav(payload)
    n = max(len(samples), 1)
    rms = (sum(s * s for s in samples) / n) ** 0.5
    zc = sum(
        1 for a, b in zip(samples, samples[1:]) if (a < 0) != (b < 0)
    ) / max(n - 1, 1)
    feats = [
        1000.0 * len(samples) / (rate * max(channels, 1)),  # duration_ms
        float(rate),
        float(channels),
        rms / 32768.0,
        (min(samples) if samples else 0) / 32768.0,
        (max(samples) if samples else 0) / 32768.0,
        zc,
    ]
    hist = [0] * 8
    for s in samples:
        hist[min(abs(s) * 8 // 32768, 7)] += 1
    feats += [c / n for c in hist]
    feats.append(0.0)  # pad to FEATURE_DIM
    assert len(feats) == FEATURE_DIM
    return feats


def decode_audio(payload: bytes) -> tuple[int, int, list[int]]:
    """Real decode for PCM16 WAV; compressed audio needs ffmpeg (not
    in this container)."""
    if payload.startswith(b"RIFF"):
        return decode_wav(payload)
    raise NotImplementedError("only PCM WAV decodes without audio libs")


def extract_features(media: DataFrame, fake: bool = False,
                     batch_size_hint: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``fake=False`` (default) decodes for real: PNG payloads produce
    actual per-channel statistics (stdlib codec above); any other
    non-null payload raises NotImplementedError inside the executor
    (no JPEG/audio codecs in this container). ``fake=True`` swaps in
    the deterministic content-hash stand-in so the distributed
    plumbing can be exercised with arbitrary bytes. Batches arrive as
    pandas DataFrames with `payload` as bytes objects.
    """

    def _feats(p):
        if p is None:
            return None
        if fake:
            return _fake_features(p)
        if p.startswith(PNG_MAGIC):
            return png_features(p)
        if p.startswith(b"RIFF"):
            return wav_features(p)
        raise NotImplementedError("only PNG/WAV decode without media libs")

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = b["payload"]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0),
                    "sha256": payloads.map(
                        lambda p: hashlib.sha256(p).hexdigest() if p is not None else None
                    ),
                    "features": payloads.map(_feats),
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


def frame_sample_positions(duration_ms, every_ms: int = 1000):
    """Deterministic frame-sampling positions for a video column —
    pure expression (no decode needed): [0, every, 2*every, ...]."""
    return F.sequence(
        F.lit(0).cast("long"), F.greatest(duration_ms - 1, F.lit(0)), F.lit(every_ms).cast("long")
    )


def attach_media_stats(media: DataFrame) -> DataFrame:
    """Pure-expression metadata pass: byte length, aspect ratio —
    stays JVM-side, no UDF."""
    return media.withColumn("n_bytes", F.length("payload").cast("long")).withColumn(
        "aspect",
        F.when(
            (F.col("height").isNotNull()) & (F.col("height") > 0),
            F.col("width").cast("double") / F.col("height"),
        ),
    )
