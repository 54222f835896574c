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

    # the hash-fake plumbing path (for payloads no codec here can decode,
    # e.g. JPEG): deterministic, same bytes -> same vector
    emb = {
        r["id"]: r["embedding"]
        for r in image_embeddings(df, dim=16, mode="fake").collect()
    }
    assert len(emb[0]) == 16
    emb2 = {
        r["id"]: r["embedding"]
        for r in image_embeddings(df, dim=16, mode="fake").collect()
    }
    assert emb == emb2

    # fake thumbnails scale dims from the sniffed header (these PNG/JPEG
    # payloads are header-only fixtures -- not decodable by design)
    th = {r["id"]: r for r in image_thumbnails(df, max_px=64, mode="fake").collect()}
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


# ---- REAL decode paths (no external codecs) -------------------------------


def encode_png(px, filters=None) -> bytes:
    """Minimal PNG encoder for tests: 8-bit RGB, one chosen filter byte per
    row (default 0 = None; the filter TRANSFORMS the stored bytes so decode
    must invert it)."""
    import numpy as np

    h, w, _ = px.shape
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(w * 3, np.int32)
    for y, f in zip(range(h), filters):
        row = px[y].reshape(-1).astype(np.int32)
        if f == 0:
            enc = row
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(3, np.int32), row[:-3]])
            enc = (row - left) % 256
        elif f == 2:  # Up
            enc = (row - prev) % 256
        else:
            raise ValueError(f)
        raw.append(f)
        raw += bytes(enc.astype(np.uint8))
        prev = row

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">II", w, h) + bytes([8, 2, 0, 0, 0])
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def encode_bmp(px) -> bytes:
    import numpy as np

    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = px[y][:, ::-1].reshape(-1)  # RGB -> BGR
        body += bytes(row) + b"\x00" * (stride - w * 3)
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return header + bytes(body)


def _rand_px(h, w, seed=7):
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_png_decode_roundtrip_filters():
    import numpy as np

    from probe_spark.multimodal import decode_image

    px = _rand_px(5, 4)
    for filters in ([0] * 5, [1] * 5, [2] * 5, [0, 1, 2, 1, 0]):
        got = decode_image(encode_png(px, filters))
        assert got is not None and got.shape == (5, 4, 3)
        assert np.array_equal(got, px), filters


def test_bmp_ppm_decode_roundtrip():
    import numpy as np

    from probe_spark.multimodal import decode_image, encode_ppm

    px = _rand_px(6, 5, seed=11)
    got = decode_image(encode_bmp(px))
    assert got is not None and np.array_equal(got, px)
    got2 = decode_image(encode_ppm(px))
    assert got2 is not None and np.array_equal(got2, px)


def test_pool_resize_preserves_mean_and_aspect():
    import numpy as np

    from probe_spark.multimodal import pool_resize

    px = _rand_px(64, 32, seed=3)
    small = pool_resize(px, 16)
    assert small.shape == (16, 8, 3)
    assert abs(float(small.mean()) - float(px.mean())) < 3.0
    # constant image stays exactly constant under area averaging
    flat = np.full((40, 40, 3), 200, np.uint8)
    assert (pool_resize(flat, 8) == 200).all()


def test_wav_pcm16_features():
    import numpy as np

    from probe_spark.multimodal import decode_wav_pcm16

    rate, freq, amp, n = 8000, 440, 0.5, 8000
    t = np.arange(n) / rate
    pcm = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    wav = (
        b"RIFF"
        + struct.pack("<I", 36 + 2 * n)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", 2 * n)
        + pcm.tobytes()
    )
    samples, got_rate = decode_wav_pcm16(wav)
    assert got_rate == rate and len(samples) == n
    rms = float(np.sqrt(np.mean(samples**2)))
    assert abs(rms - amp / np.sqrt(2)) < 0.01  # sine RMS = A/sqrt(2)
    zc = float(np.mean(np.abs(np.diff(np.signbit(samples).astype(np.int8)))))
    assert abs(zc - 2 * freq / rate) < 0.01  # sine crosses 2f times/sec


def test_spark_real_decode_stages(spark):
    """End-to-end real paths through the Spark stages: thumbnails are
    valid PPMs of pooled pixels; pixel embeddings reflect image content
    (not payload hashes); audio features are physical."""
    import numpy as np

    from probe_spark.multimodal import (
        audio_features,
        decode_image,
        image_embeddings,
        image_thumbnails,
    )

    dark = np.full((32, 32, 3), 10, np.uint8)
    light = np.full((32, 32, 3), 240, np.uint8)
    rows = [
        (1, bytearray(encode_png(dark))),
        (2, bytearray(encode_png(light))),
        (3, bytearray(b"not an image")),
    ]
    df = spark.createDataFrame(rows, "id long, data binary")
    thumbs = {r["id"]: r for r in image_thumbnails(df, max_px=8).collect()}
    assert thumbs[1]["width"] == 8 and thumbs[1]["height"] == 8
    back = decode_image(bytes(thumbs[1]["thumb"]))
    assert back is not None and (back == 10).all()
    assert thumbs[3]["width"] == -1 and bytes(thumbs[3]["thumb"]) == b""
    embs = {r["id"]: r["embedding"] for r in image_embeddings(df, dim=16).collect()}
    assert all(abs(v - 10 / 255) < 0.01 for v in embs[1])
    assert all(abs(v - 240 / 255) < 0.01 for v in embs[2])
    assert embs[3] == [0.0] * 16

    rate, n = 8000, 4000
    pcm = (0.25 * np.sin(2 * np.pi * 100 * np.arange(n) / rate) * 32767).astype(
        np.int16
    )
    wav = (
        b"RIFF"
        + struct.pack("<I", 36 + 2 * n)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", 2 * n)
        + pcm.tobytes()
    )
    adf = spark.createDataFrame([(1, bytearray(wav))], "id long, data binary")
    feat = audio_features(adf).collect()[0]
    assert abs(feat["duration_s"] - 0.5) < 1e-6
    assert abs(feat["rms"] - 0.25 / np.sqrt(2)) < 0.01
