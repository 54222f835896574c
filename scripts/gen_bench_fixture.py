#!/usr/bin/env python
"""Generate a measurement-only documents/embeddings fixture shaped like the
driver's sf tables (same schema, vocab, length/lang/source distributions as
/root/testdata/sf0.1, scaled by --sf).  Used by round-6 optimization runs to
measure at the driver's sf1.0 scale after the driver-generated sf1.0 was
removed from disk between sessions.  NOT oracle data: correctness gates stay
on the driver's sf0.001/0.01/0.1 tables.

Usage: python scripts/gen_bench_fixture.py --sf 1.0 --out /dev/shm/sf1.0_local
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "a", "the", "line", "sort", "window", "merge", "batch", "spark",
    "order", "data", "column", "join", "small", "customer", "query", "big",
    "stream", "group", "filter", "vector", "wide",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.145, 0.145]


def gen_documents(n: int, rng: np.random.Generator) -> pa.Table:
    lens = rng.integers(10, 101, size=n)
    texts = []
    for ln in lens:
        words = rng.choice(VOCAB, size=ln)
        texts.append(" ".join(words))
    # ~8% near-duplicate pairs like the driver tables (dedup ops see work)
    n_dup = n // 12
    src_ix = rng.integers(0, n, size=n_dup)
    dst_ix = rng.integers(0, n, size=n_dup)
    for s, d in zip(src_ix, dst_ix):
        if s != d:
            texts[d] = texts[s] + " " + rng.choice(VOCAB)
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array([f"src{i % 20}" for i in range(n)]),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )


def gen_embeddings(n: int, rng: np.random.Generator) -> pa.Table:
    dim = 64
    centers = rng.normal(size=(10, dim)).astype(np.float32)
    labels = rng.integers(0, 10, size=n).astype(np.int32)
    vecs = centers[labels] + 0.5 * rng.normal(size=(n, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(vecs.astype(np.float32))),
            "label": pa.array(labels),
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    rng = np.random.default_rng(4242)
    os.makedirs(args.out, exist_ok=True)
    n_docs = int(50000 * args.sf)
    n_vecs = int(20000 * args.sf)
    pq.write_table(
        gen_documents(n_docs, rng), f"{args.out}/documents.parquet"
    )
    pq.write_table(
        gen_embeddings(n_vecs, rng), f"{args.out}/embeddings.parquet"
    )
    print(f"wrote {n_docs} docs + {n_vecs} vecs to {args.out}")


if __name__ == "__main__":
    main()
