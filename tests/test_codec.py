"""Varbyte/delta codec round-trip + property tests (FIXTURES.md SS5 inv. 4)."""

import numpy as np
import pytest

from probe_spark.codec import (
    decode_doc_block,
    encode_doc_block,
    varbyte_decode,
    varbyte_encode,
)


def test_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert len(varbyte_decode(b"")) == 0
    assert encode_doc_block(np.array([], dtype=np.uint64)) == b""


@pytest.mark.parametrize(
    "vals",
    [
        [0],
        [1],
        [127],
        [128],
        [129],
        [16383, 16384, 16385],
        [0, 0, 0],
        [2**32 - 1, 2**32, 2**63 - 1, 2**64 - 1],
        list(range(1000)),
    ],
)
def test_varbyte_roundtrip(vals):
    v = np.array(vals, dtype=np.uint64)
    assert varbyte_decode(varbyte_encode(v)).tolist() == v.tolist()


def test_varbyte_roundtrip_random():
    rng = np.random.default_rng(42)
    for _ in range(50):
        n = int(rng.integers(0, 500))
        # mixed magnitudes
        v = (rng.integers(0, 2**62, n).astype(np.uint64)) >> rng.integers(
            0, 60, n
        ).astype(np.uint64)
        assert varbyte_decode(varbyte_encode(v)).tolist() == v.tolist()


def test_doc_block_roundtrip():
    rng = np.random.default_rng(7)
    for _ in range(20):
        n = int(rng.integers(1, 300))
        ids = np.sort(rng.choice(10**9, size=n, replace=False)).astype(np.uint64)
        assert decode_doc_block(encode_doc_block(ids)).tolist() == ids.tolist()


def test_compression_wins():
    # dense ascending ids: delta+varbyte ~1 byte/doc vs 8 bytes raw
    ids = np.arange(10**6, 10**6 + 10000, 3, dtype=np.uint64)
    enc = encode_doc_block(ids)
    assert len(enc) < len(ids) * 1.2
    assert decode_doc_block(enc).tolist() == ids.tolist()


def test_small_values_one_byte():
    v = np.array([5, 100, 127], dtype=np.uint64)
    assert len(varbyte_encode(v)) == 3
