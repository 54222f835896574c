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
    # no injected duplicates: the driver tables are pure random word bags
    # (dedup_exact at sf0.01 groups 500 docs into 500 singletons), so the
    # dedup/decontaminate ops must see the same near-dup-sparse shape
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
    # plain random unit vectors with geometry-free labels, matching the
    # driver tables (sf0.1 intra-label mean cosine ~= inter ~= 0, only
    # ~0.2% of pairs above cos 0.35)
    dim = 64
    labels = rng.integers(0, 10, size=n).astype(np.int32)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(vecs.astype(np.float32))),
            "label": pa.array(labels),
        }
    )


def gen_events(n: int, rng: np.random.Generator) -> pa.Table:
    types = np.array(["signup", "purchase", "view", "click", "error"])
    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    span = np.timedelta64(30 * 24 * 3600 * 1_000_000, "us")
    offs = np.sort(rng.integers(0, int(span.astype(np.int64)), size=n))
    n_users = max(1, n * 3 // 200)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts0 + offs.astype("timedelta64[us]")),
            "user_id": pa.array(
                rng.integers(0, n_users, size=n).astype(np.int64)
            ),
            "event_type": pa.array(types[rng.integers(0, 5, size=n)]),
            "value": pa.array(
                np.round(np.abs(rng.normal(50, 50, size=n)), 2)
            ),
            "props": pa.array(
                [
                    '{"k": %d}' % k
                    for k in rng.integers(0, 100, size=n)
                ]
            ),
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
    n_events = int(1_000_000 * args.sf)
    pq.write_table(gen_events(n_events, rng), f"{args.out}/events.parquet")
    print(
        f"wrote {n_docs} docs + {n_vecs} vecs + {n_events} events "
        f"to {args.out}"
    )


if __name__ == "__main__":
    main()
