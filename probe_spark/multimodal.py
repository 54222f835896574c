"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A training-data pipeline at 100 TB carries image/audio/video as opaque
``binary`` columns next to typed metadata.  This module provides the
Spark-side plumbing -- schemas, Arrow batch shapes, mapInPandas stage
signatures -- with:

  * REAL, dependency-free metadata extraction: PNG/JPEG/GIF/BMP/PPM
    dimension sniffing and WAV header parsing are pure byte-level parsers
    of public container formats;
  * REAL, dependency-free DECODE for the formats that need no external
    codec: PNG (8-bit gray/rgb/rgba, non-interlaced -- inflate via stdlib
    zlib + scanline unfiltering), BMP (24-bit uncompressed), PPM (P6),
    and PCM WAV (numpy frombuffer).  Real area-average resize
    (numpy pooling), real pixel-space embeddings, real audio features
    (rms / zero-crossing rate) build on these;
  * STUBBED model stages only: actual NN inference (torch) and exotic
    codecs (progressive JPEG, video) are not installed in this container.
    ``mode='model'`` raises a clear NotImplementedError; ``mode='fake'``
    keeps the deterministic content-hash stand-ins for plumbing tests.

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
    if b[:2] == b"BM" and len(data) >= 30:
        bb = bytes(data[:30])
        w = struct.unpack("<i", bb[18:22])[0]
        h = abs(struct.unpack("<i", bb[22:26])[0])
        return ("bmp", w, h)
    if b[:2] == b"P6":
        dims = _ppm_header(bytes(data))
        if dims:
            return ("ppm", dims[0], dims[1])
    return ("unknown", -1, -1)


def _ppm_header(buf: bytes) -> tuple[int, int, int] | None:
    """Parse a P6 header; returns (width, height, pixel_offset) or None."""
    if buf[:2] != b"P6":
        return None
    vals: list[int] = []
    i = 2
    while len(vals) < 3 and i < len(buf):
        c = buf[i : i + 1]
        if c == b"#":  # comment to end of line
            while i < len(buf) and buf[i : i + 1] != b"\n":
                i += 1
        elif c.isdigit():
            j = i
            while j < len(buf) and buf[j : j + 1].isdigit():
                j += 1
            vals.append(int(buf[i:j]))
            i = j
        elif c in b" \t\r\n":
            i += 1
        else:
            return None
    if len(vals) < 3 or vals[2] != 255:
        return None
    return (vals[0], vals[1], i + 1)


def decode_image(data: bytes | None):
    """binary -> (H, W, 3) uint8 numpy array, or None when the payload
    needs a codec this container doesn't have.  REAL decoders, no external
    libs:

      * PNG: 8-bit depth, color types gray/gray+alpha/RGB/RGBA,
        non-interlaced -- IDAT inflate via stdlib zlib, then scanline
        unfiltering (None/Sub/Up/Average/Paeth per the PNG spec).  Up is
        numpy-vectorized; the left-dependent filters run a per-byte loop
        (correctness over speed; thumbnails dominate real use).
      * BMP: 24-bit uncompressed, bottom-up or top-down.
      * PPM: P6 binary, maxval 255.
    """
    import numpy as np

    if not data:
        return None
    buf = bytes(data)
    if buf[:8] == b"\x89PNG\r\n\x1a\n":
        return _png_decode(buf)
    if buf[:2] == b"BM":
        return _bmp_decode(buf)
    if buf[:2] == b"P6":
        dims = _ppm_header(buf)
        if not dims:
            return None
        w, h, off = dims
        need = w * h * 3
        if len(buf) < off + need:
            return None
        return (
            np.frombuffer(buf, np.uint8, need, off).reshape(h, w, 3).copy()
        )
    return None


def _png_decode(buf: bytes):
    import zlib

    import numpy as np

    pos = 8
    idat = bytearray()
    w = h = None
    bd = ct = interlace = None
    while pos + 8 <= len(buf):
        ln = int.from_bytes(buf[pos : pos + 4], "big")
        typ = buf[pos + 4 : pos + 8]
        chunk = buf[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR" and ln >= 13:
            w = int.from_bytes(chunk[0:4], "big")
            h = int.from_bytes(chunk[4:8], "big")
            bd, ct, interlace = chunk[8], chunk[9], chunk[12]
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if not w or not h or bd != 8 or ct not in (0, 2, 4, 6) or interlace:
        return None  # palette / 16-bit / interlaced: out of scope
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w * nch
    if len(raw) < h * (stride + 1):
        return None
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    pos = 0
    for y in range(h):
        f = raw[pos]
        row = np.frombuffer(raw, np.uint8, stride, pos + 1).copy()
        pos += stride + 1
        if f == 1:  # Sub
            for i in range(nch, stride):
                row[i] = (int(row[i]) + int(row[i - nch])) & 0xFF
        elif f == 2:  # Up (vectorized; uint8 wraparound == mod 256)
            row += prev
        elif f == 3:  # Average
            for i in range(stride):
                left = int(row[i - nch]) if i >= nch else 0
                row[i] = (int(row[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = int(row[i - nch]) if i >= nch else 0
                b = int(prev[i])
                c = int(prev[i - nch]) if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (int(row[i]) + pred) & 0xFF
        elif f != 0:
            return None
        out[y] = row
        prev = row
    px = out.reshape(h, w, nch)
    if nch == 1:
        return np.repeat(px, 3, axis=2)
    if nch == 2:  # gray + alpha: drop alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    if nch == 4:
        return px[:, :, :3].copy()
    return px.copy()


def _bmp_decode(buf: bytes):
    import numpy as np

    if len(buf) < 54:
        return None
    off = struct.unpack("<I", buf[10:14])[0]
    w = struct.unpack("<i", buf[18:22])[0]
    h_raw = struct.unpack("<i", buf[22:26])[0]
    bpp = struct.unpack("<H", buf[28:30])[0]
    comp = struct.unpack("<I", buf[30:34])[0]
    if bpp != 24 or comp != 0 or w <= 0 or h_raw == 0:
        return None
    h = abs(h_raw)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    if len(buf) < off + stride * h:
        return None
    rows = np.frombuffer(buf, np.uint8, stride * h, off).reshape(h, stride)
    px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if h_raw > 0:  # bottom-up storage
        px = px[::-1]
    return px.copy()


def pool_resize(img, max_px: int):
    """REAL area-average resize: partition rows/cols into nearly equal
    slices and mean each block (numpy add.reduceat -- no codec library).
    Returns (H', W', 3) uint8 with max(H', W') <= max_px, aspect kept."""
    import numpy as np

    h, w = img.shape[:2]
    scale = min(1.0, max_px / max(h, w))
    th, tw = max(1, round(h * scale)), max(1, round(w * scale))
    ri = (np.arange(th) * h // th).astype(np.int64)
    ci = (np.arange(tw) * w // tw).astype(np.int64)
    acc = np.add.reduceat(
        np.add.reduceat(img.astype(np.float64), ri, axis=0), ci, axis=1
    )
    rcount = np.diff(np.append(ri, h)).reshape(-1, 1, 1)
    ccount = np.diff(np.append(ci, w)).reshape(1, -1, 1)
    return np.clip(acc / (rcount * ccount), 0, 255).astype(np.uint8)


def encode_ppm(img) -> bytes:
    """(H, W, 3) uint8 -> P6 bytes (the dependency-free interchange
    encoding for thumbnails)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_wav_pcm16(data: bytes | None):
    """PCM16 WAV -> (samples float64 in [-1, 1] mono-mixed, sample_rate),
    or None.  REAL decode: RIFF chunk walk + numpy frombuffer."""
    import numpy as np

    if not data or len(data) < 44:
        return None
    buf = bytes(data)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        return None
    pos = 12
    channels = rate = bits = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        ln = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        if cid == b"fmt ":
            channels = struct.unpack("<H", buf[pos + 10 : pos + 12])[0]
            rate = struct.unpack("<I", buf[pos + 12 : pos + 16])[0]
            bits = struct.unpack("<H", buf[pos + 22 : pos + 24])[0]
        elif cid == b"data":
            if bits != 16 or not channels:
                return None
            n = min(ln, len(buf) - pos - 8) // 2
            pcm = np.frombuffer(buf, np.int16, n, pos + 8).astype(np.float64)
            pcm /= 32768.0
            if channels > 1:
                n = (len(pcm) // channels) * channels
                pcm = pcm[:n].reshape(-1, channels).mean(axis=1)
            return pcm, rate
        pos += 8 + ln + (ln & 1)
    return None


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
    mode: str = "pixels",
) -> DataFrame:
    """Stage 2: binary -> embedding vector.

    mode='pixels' REAL pixel-space embedding: decode (PNG/BMP/PPM), area-
                  pool to sqrt(dim) x sqrt(dim) grayscale, scale to [0,1].
                  Undecodable payloads get the zero vector (an honest
                  "no signal", distinguishable downstream).
    mode='fake'   deterministic content-hash vectors (plumbing tests)
    mode='model'  requires a real vision model -- NOT available in this
                  container; raises NotImplementedError at executor time.
    """
    side = max(1, int(dim**0.5))

    def run(iterator):
        import numpy as np
        import pandas as pd

        def pixel_vec(x) -> list[float]:
            img = decode_image(x)
            if img is None:
                return [0.0] * dim
            small = pool_resize(img, side)
            gray = small.astype(np.float64).mean(axis=2) / 255.0
            # pad to exactly side x side (pool_resize keeps aspect)
            full = np.zeros((side, side), np.float64)
            full[: gray.shape[0], : gray.shape[1]] = gray
            v = full.ravel().tolist()
            return (v + [0.0] * dim)[:dim]

        for pdf in iterator:
            if mode == "model":
                raise NotImplementedError(
                    "model inference requires torch, which is not installed "
                    "in this environment; use mode='pixels' (real decode + "
                    "pooled pixels) or mode='fake'"
                )
            if mode == "pixels":
                emb = [pixel_vec(x) for x in pdf[bin_col]]
            else:
                emb = [
                    _fake_embedding(bytes(x or b""), dim) for x in pdf[bin_col]
                ]
            yield pd.DataFrame({"id": pdf[id_col], "embedding": emb})

    return df.select(id_col, bin_col).mapInPandas(run, EMBED_SCHEMA)


def image_thumbnails(
    df: DataFrame,
    id_col: str = "id",
    bin_col: str = "data",
    max_px: int = 64,
    mode: str = "decode",
) -> DataFrame:
    """Stage 3: binary -> resized thumbnail bytes.

    mode='decode' REAL: decode (PNG/BMP/PPM), numpy area-average resize,
                  re-encode as P6 PPM bytes.  Undecodable payloads yield
                  width/height -1 and an empty thumb.
    mode='fake'   passes the payload through truncated, with the scaled
                  dimensions computed from the sniffed header (plumbing
                  tests for formats we can't decode here, e.g. JPEG).
    """

    def run(iterator):
        import pandas as pd

        for pdf in iterator:
            ids, thumbs, ws, hs = [], [], [], []
            for i, x in zip(pdf[id_col], pdf[bin_col]):
                ids.append(i)
                if mode == "decode":
                    img = decode_image(x)
                    if img is None:
                        thumbs.append(b"")
                        ws.append(-1)
                        hs.append(-1)
                    else:
                        small = pool_resize(img, max_px)
                        thumbs.append(encode_ppm(small))
                        hs.append(small.shape[0])
                        ws.append(small.shape[1])
                    continue
                fmt, w, h = sniff_image(x)
                if w > 0 and h > 0:
                    scale = min(1.0, max_px / max(w, h))
                    ws.append(max(1, int(w * scale)))
                    hs.append(max(1, int(h * scale)))
                else:
                    ws.append(-1)
                    hs.append(-1)
                thumbs.append(bytes(x or b"")[: 1 << 16])
            yield pd.DataFrame(
                {"id": ids, "thumb": thumbs, "width": ws, "height": hs}
            )

    return df.select(id_col, bin_col).mapInPandas(run, THUMB_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("duration_s", FloatType()),
        StructField("rms", FloatType()),
        StructField("zero_crossing_rate", FloatType()),
    ]
)


def audio_features(
    df: DataFrame, id_col: str = "id", bin_col: str = "data"
) -> DataFrame:
    """Stage 2 (audio): REAL PCM16 WAV decode (numpy) -> duration, RMS
    amplitude, zero-crossing rate.  Non-PCM16 payloads yield -1 features."""

    def run(iterator):
        import numpy as np
        import pandas as pd

        for pdf in iterator:
            ids, dur, rms, zcr = [], [], [], []
            for i, x in zip(pdf[id_col], pdf[bin_col]):
                ids.append(i)
                decoded = decode_wav_pcm16(x)
                if decoded is None or len(decoded[0]) == 0:
                    dur.append(-1.0)
                    rms.append(-1.0)
                    zcr.append(-1.0)
                    continue
                pcm, rate = decoded
                dur.append(len(pcm) / rate if rate else -1.0)
                rms.append(float(np.sqrt(np.mean(pcm * pcm))))
                zcr.append(
                    float(np.mean(np.abs(np.diff(np.signbit(pcm).astype(np.int8)))))
                )
            yield pd.DataFrame(
                {
                    "id": ids,
                    "duration_s": np.array(dur, np.float32),
                    "rms": np.array(rms, np.float32),
                    "zero_crossing_rate": np.array(zcr, np.float32),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, AUDIO_FEATURES_SCHEMA)
