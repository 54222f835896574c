"""docID delta + varbyte posting-block codec (numpy-vectorized).

Storage format for a posting block (<= POSTING_BLOCK_SIZE docs of one term):
  docs : varbyte(delta(doc_ids))   -- doc_ids strictly ascending
  tfs  : varbyte(tf per doc)
  dls  : varbyte(doc_len per doc)  -- denormalized for join-free BM25

Varbyte: little-endian 7-bit groups, high bit = continuation.  Both encode
and decode are fully vectorized (no per-value Python loop): encode loops
over byte POSITIONS (<= 10 for uint64), decode reconstructs values with one
scatter-add over 7-bit groups.

The reference has no index (SURVEY.md SS2.12); this is the scale machinery
mandated by the north rule ("per-term sorted posting lists with docID delta
+ varbyte compression").
"""

from __future__ import annotations

import numpy as np


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array; returns bytes.  Empty array -> b''."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    nb = np.ones(n, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nb += tmp > 0
        tmp >>= np.uint64(7)
    total = int(nb.sum())
    buf = np.zeros(total, dtype=np.uint8)
    pos = np.empty(n, dtype=np.int64)
    pos[0] = 0
    np.cumsum(nb[:-1], out=pos[1:])
    work = v.copy()
    for k in range(int(nb.max())):
        sel = nb > k
        idx = pos[sel] + k
        byte = (work[sel] & np.uint64(0x7F)).astype(np.uint8)
        cont = (k + 1) < nb[sel]
        buf[idx] = byte | (cont.astype(np.uint8) << 7)
        work[sel] >>= np.uint64(7)
    return buf.tobytes()


def varbyte_decode(data: bytes | bytearray | memoryview) -> np.ndarray:
    """Decode varbyte bytes back to a uint64 array."""
    b = np.frombuffer(data, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty(len(ends), dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    group_id = np.cumsum(np.concatenate(([0], is_last[:-1].astype(np.int64))))
    offset = np.arange(len(b), dtype=np.int64) - starts[group_id]
    vals7 = (b & np.uint8(0x7F)).astype(np.uint64) << (
        offset.astype(np.uint64) * np.uint64(7)
    )
    out = np.zeros(len(ends), dtype=np.uint64)
    np.add.at(out, group_id, vals7)
    return out


def encode_doc_block(doc_ids: np.ndarray) -> bytes:
    """Delta + varbyte encode strictly-ascending doc ids."""
    d = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    if len(d) == 0:
        return b""
    deltas = np.empty_like(d)
    deltas[0] = d[0]
    np.subtract(d[1:], d[:-1], out=deltas[1:])
    return varbyte_encode(deltas)


def decode_doc_block(data: bytes) -> np.ndarray:
    deltas = varbyte_decode(data)
    return np.cumsum(deltas, dtype=np.uint64)
