"""Multimodal plumbing tests: real header sniffing, deterministic fake
decode stages, NotImplementedError gating for the model path."""

import struct
import zlib

import pytest

from probe_spark.multimodal import sniff_image, sniff_wav


def make_png(w: int, h: int) -> bytes:
    ihdr = struct.pack(">II", w, h) + bytes([8, 2, 0, 0, 0])
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk))
    )


def make_jpeg(w: int, h: int) -> bytes:
    # SOI + APP0 + SOF0
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def make_wav(channels: int, rate: int, n_samples: int) -> bytes:
    data_size = n_samples * channels * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, rate, rate * channels * 2, channels * 2, 16)
        + b"data"
        + struct.pack("<I", data_size)
        + b"\x00" * min(data_size, 64)
    )


def test_sniff_png():
    assert sniff_image(make_png(640, 480)) == ("png", 640, 480)


def test_sniff_jpeg():
    assert sniff_image(make_jpeg(1024, 768)) == ("jpeg", 1024, 768)


def test_sniff_gif():
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 10
    assert sniff_image(gif) == ("gif", 320, 200)


def test_sniff_garbage():
    assert sniff_image(b"not an image at all")[0] == "unknown"
    assert sniff_image(None)[0] == "unknown"
    assert sniff_image(b"\xff\xd8" + b"\x00" * 12)[0] == "jpeg"  # truncated


def test_sniff_wav():
    fmt, ch, rate, n = sniff_wav(make_wav(2, 44100, 1000))
    assert (fmt, ch, rate, n) == ("wav", 2, 44100, 1000)
    assert sniff_wav(b"RIFFxxxxNOPE" + b"\x00" * 40)[0] == "unknown"


def test_spark_multimodal_stages(spark):
    from probe_spark.multimodal import (
        audio_metadata,
        image_embeddings,
        image_metadata,
        image_thumbnails,
    )

    rows = [
        (0, make_png(800, 600)),
        (1, make_jpeg(320, 240)),
        (2, b"garbage bytes"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, data binary")

    meta = {r["id"]: r for r in image_metadata(df).collect()}
    assert meta[0]["format"] == "png" and meta[0]["width"] == 800
    assert meta[1]["format"] == "jpeg" and meta[1]["height"] == 240
    assert meta[2]["format"] == "unknown"
    assert meta[3]["n_bytes"] == 0

    emb = {r["id"]: r["embedding"] for r in image_embeddings(df, dim=16).collect()}
    assert len(emb[0]) == 16
    # deterministic: same bytes -> same vector
    emb2 = {r["id"]: r["embedding"] for r in image_embeddings(df, dim=16).collect()}
    assert emb == emb2

    th = {r["id"]: r for r in image_thumbnails(df, max_px=64).collect()}
    assert (th[0]["width"], th[0]["height"]) == (64, 48)
    assert th[2]["width"] == -1

    wdf = spark.createDataFrame(
        [(0, make_wav(1, 16000, 16000))], "id long, data binary"
    )
    arow = audio_metadata(wdf).collect()[0]
    assert arow["sample_rate"] == 16000 and arow["n_samples"] == 16000

    # the model path is explicitly gated
    with pytest.raises(Exception, match="NotImplementedError|not installed"):
        image_embeddings(df, mode="model").collect()
