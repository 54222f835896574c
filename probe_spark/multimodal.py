"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A training-data pipeline at 100 TB carries image/audio/video as opaque
``binary`` columns next to typed metadata.  This module provides the
Spark-side plumbing -- schemas, Arrow batch shapes, mapInPandas stage
signatures -- with:

  * REAL, dependency-free metadata extraction: PNG/JPEG/GIF dimension
    sniffing and WAV header parsing are pure byte-level parsers of public
    container formats;
  * STUBBED decode/feature stages: the heavy decoders (PIL/ffmpeg/torch)
    are not installed in this container.  Each stage degrades to either a
    deterministic fake (seeded by content hash -- stable for tests) or a
    clear NotImplementedError, selected by ``mode``.

All stages are Arrow-vectorized (mapInPandas); none use per-row Python UDFs.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import DataFrame
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

IMAGE_META_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)

AUDIO_META_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("format", StringType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("n_bytes", LongType()),
    ]
)

EMBED_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)

THUMB_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("thumb", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def sniff_image(data: bytes | None) -> tuple[str, int, int]:
    """(format, width, height) from container headers; ('unknown', -1, -1)
    when unrecognized.  Pure byte parsing of the public PNG/JPEG/GIF specs."""
    if not data or len(data) < 10:
        return ("unknown", -1, -1)
    b = bytes(data[:64]) if len(data) >= 64 else bytes(data)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        w, h = struct.unpack(">II", bytes(data[16:24]))
        return ("png", w, h)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        w, h = struct.unpack("<HH", bytes(data[6:10]))
        return ("gif", w, h)
    if b[:2] == b"\xff\xd8":  # JPEG: scan segments for SOFn
        buf = bytes(data)
        i = 2
        while i + 9 < len(buf):
            if buf[i] != 0xFF:
                i += 1
                continue
            marker = buf[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", buf[i + 5 : i + 9])
                return ("jpeg", w, h)
            seglen = struct.unpack(">H", buf[i + 2 : i + 4])[0]
            i += 2 + seglen
        return ("jpeg", -1, -1)
    return ("unknown", -1, -1)


def sniff_wav(data: bytes | None) -> tuple[str, int, int, int]:
    """(format, channels, sample_rate, n_samples) from a RIFF/WAVE header."""
    if not data or len(data) < 44:
        return ("unknown", -1, -1, -1)
    b = bytes(data[:44])
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return ("unknown", -1, -1, -1)
    channels = struct.unpack("<H", b[22:24])[0]
    rate = struct.unpack("<I", b[24:28])[0]
    bits = struct.unpack("<H", b[34:36])[0]
    data_size = struct.unpack("<I", b[40:44])[0]
    denom = max(1, channels * max(1, bits // 8))
    return ("wav", channels, rate, data_size // denom)


def image_metadata(df: DataFrame, id_col: str = "id", bin_col: str = "data") -> DataFrame:
    """Stage 1: binary -> typed image metadata (REAL header parsing)."""

    def run(iterator):
        import pandas as pd

        for pdf in iterator:
            metas = [sniff_image(x) for x in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "format": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                    "n_bytes": [len(x) if x is not None else 0 for x in pdf[bin_col]],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, IMAGE_META_SCHEMA)


def audio_metadata(df: DataFrame, id_col: str = "id", bin_col: str = "data") -> DataFrame:
    """Stage 1 (audio): binary -> typed WAV metadata (REAL header parsing)."""

    def run(iterator):
        import pandas as pd

        for pdf in iterator:
            metas = [sniff_wav(x) for x in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "format": [m[0] for m in metas],
                    "channels": [m[1] for m in metas],
                    "sample_rate": [m[2] for m in metas],
                    "n_samples": [m[3] for m in metas],
                    "n_bytes": [len(x) if x is not None else 0 for x in pdf[bin_col]],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, AUDIO_META_SCHEMA)


def _fake_embedding(data: bytes, dim: int) -> list[float]:
    """Deterministic content-hash embedding (the test stand-in for a model
    forward pass; same bytes -> same vector)."""
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.md5(data[:4096] + counter.to_bytes(4, "little")).digest()
        out.extend((b - 127.5) / 127.5 for b in h)
        counter += 1
    return out[:dim]


def image_embeddings(
    df: DataFrame,
    id_col: str = "id",
    bin_col: str = "data",
    dim: int = 64,
    mode: str = "fake",
) -> DataFrame:
    """Stage 2: binary -> embedding vector.

    mode='fake'  deterministic content-hash vectors (CI / plumbing tests)
    mode='model' requires a real vision model -- NOT available in this
                 container; raises NotImplementedError at executor time.
    """

    def run(iterator):
        import pandas as pd

        for pdf in iterator:
            if mode == "model":
                raise NotImplementedError(
                    "image decode/model inference requires PIL/torch, which "
                    "are not installed in this environment; run with "
                    "mode='fake' for plumbing tests"
                )
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "embedding": [
                        _fake_embedding(bytes(x or b""), dim) for x in pdf[bin_col]
                    ],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, EMBED_SCHEMA)


def image_thumbnails(
    df: DataFrame,
    id_col: str = "id",
    bin_col: str = "data",
    max_px: int = 64,
    mode: str = "fake",
) -> DataFrame:
    """Stage 3: binary -> resized thumbnail bytes.  mode='fake' passes the
    payload through truncated-deterministically with the scaled dimensions
    computed from the REAL sniffed header; mode='model' raises (no codec)."""

    def run(iterator):
        import pandas as pd

        for pdf in iterator:
            if mode == "model":
                raise NotImplementedError(
                    "image resize requires an image codec (PIL), not "
                    "installed here"
                )
            ids, thumbs, ws, hs = [], [], [], []
            for i, x in zip(pdf[id_col], pdf[bin_col]):
                fmt, w, h = sniff_image(x)
                if w > 0 and h > 0:
                    scale = min(1.0, max_px / max(w, h))
                    ws.append(max(1, int(w * scale)))
                    hs.append(max(1, int(h * scale)))
                else:
                    ws.append(-1)
                    hs.append(-1)
                ids.append(i)
                thumbs.append(bytes(x or b"")[: 1 << 16])
            yield pd.DataFrame(
                {"id": ids, "thumb": thumbs, "width": ws, "height": hs}
            )

    return df.select(id_col, bin_col).mapInPandas(run, THUMB_SCHEMA)
