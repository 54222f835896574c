"""Streaming sharded oracle: rank-identity verification without the
single-host RAM ceiling.

The in-RAM oracle (oracle.CorpusIndex over the whole corpus) needs
~11 GB per million docs, which capped identity runs at 5M docs on a
128 GiB box (two kernel OOM kills in the 5M run's verification phase).
This module removes that ceiling with the classic two-pass split any
distributed scorer uses -- global statistics first, shard-local scoring
second -- while staying f64-IDENTICAL to the in-RAM oracle:

1. ``url_rank_permutation`` derives the url-sort doc_id assignment
   (FIXTURES.md SS1: doc_id = url rank) from urls alone
   (fixtures.page_url), never holding rendered pages.
2. ``global_stats`` streams disjoint doc_id ranges through fork
   workers: each builds a throwaway shard CorpusIndex with the SAME
   build kernel (tokenize, df, doc_lens) plus the rescue-needle
   containment counts global_df would compute, returns only the tiny
   aggregates, and frees the tokens.  df/doc-length/rescue sums are
   integer adds (exact); avgdl is divided ONCE in the parent, so the
   float equals the full build's sum/n bit-for-bit.
3. ``sharded_oracle_topk`` rebuilds each shard's CorpusIndex, patches
   the GLOBAL stats onto it (n_docs, avgdl, df, pre-seeded
   rescue_df_cache -- oracle.search scores are doc-local given those),
   runs every query shard-locally, and merges per-shard top-k by the
   same (score desc, doc_id asc) order the full scan sorts by.

Peak RSS = workers x one shard corpus instead of the whole corpus:
~2 GB-scale shards put 10M+ docs inside this box's budget; on a real
cluster the same two passes are two Spark jobs.  Tokenization runs
twice (stats pass + scoring pass) -- the price of not storing tokens.

Reference parity: the scores this produces are the same
ranking.rs:228-276 BM25 sums the in-RAM oracle computes; the test
suite pins sharded == in-RAM f64-exactly over the 25-query reference
set (tests/test_oracle_shard.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from probe_spark import elastic, oracle
from probe_spark.oracle import CorpusIndex, Doc

# fork-pool COW globals: set in the parent immediately before Pool
# creation so workers inherit them read-only (no pickling per task)
_PERM: list[int] | None = None
_STATS: "GlobalStats | None" = None
_QUERIES: dict[str, str] | None = None
_NEEDLES: list[str] | None = None
_K: int = 10


@dataclass
class GlobalStats:
    """Corpus-wide statistics a shard needs to score exactly."""

    n_docs: int
    avgdl: float
    df: dict[str, int]
    # (needle, exclude_filenames=False) -> containment-or-token df,
    # exactly global_df's rescue count
    rescue_df: dict[tuple[str, bool], int]


def url_rank_permutation(n_docs: int, workers: int = 1) -> list[int]:
    """perm[doc_id] = page index, from the url sort that assigns doc_ids
    (fixtures.oracle_corpus sorts pages by url).  Urls only: ~100 bytes
    per doc instead of a rendered page."""
    from probe_spark.fixtures import page_url

    if workers > 1 and n_docs >= 10_000:
        from multiprocessing import get_context

        with get_context("fork").Pool(workers) as pool:
            urls = pool.map(page_url, range(n_docs), chunksize=8192)
    else:
        urls = [page_url(i) for i in range(n_docs)]
    return sorted(range(n_docs), key=urls.__getitem__)


def _shard_docs(lo: int, hi: int) -> list[Doc]:
    from probe_spark.fixtures import make_page

    assert _PERM is not None
    docs = []
    for g in range(lo, hi):
        p = make_page(_PERM[g])
        docs.append(Doc(doc_id=g, url=p.url, text=p.text, lang=p.lang))
    return docs


def _stats_worker(rng: tuple[int, int]):
    """(df_partial, total_len, rescue_counts) for doc_ids [lo, hi)."""
    lo, hi = rng
    ix = CorpusIndex.build(_shard_docs(lo, hi))
    rescue: dict[tuple[str, bool], int] = {}
    for needle in _NEEDLES or []:
        cnt = 0
        for i, d in enumerate(ix.docs):
            # exactly global_df's ex_fn=False rescue count: token hit on
            # the full (text ++ url) tokens OR containment in the
            # text+"\n"+url haystack
            if needle in ix.tokens[i]:
                cnt += 1
                continue
            if needle in (d.text.lower() + "\n" + d.url.lower()):
                cnt += 1
        rescue[(needle, False)] = cnt
    return ix.df, sum(ix.doc_lens), rescue


def global_stats(
    n_docs: int,
    perm: list[int],
    needles: list[str],
    workers: int = 1,
    shard_size: int = 100_000,
) -> GlobalStats:
    global _PERM, _NEEDLES
    _PERM, _NEEDLES = perm, sorted(needles)
    ranges = [
        (lo, min(lo + shard_size, n_docs))
        for lo in range(0, n_docs, shard_size)
    ]
    if workers > 1 and n_docs >= 10_000:
        from multiprocessing import get_context

        with get_context("fork").Pool(workers) as pool:
            parts = pool.map(_stats_worker, ranges)
    else:
        parts = [_stats_worker(r) for r in ranges]
    df: dict[str, int] = {}
    total_len = 0
    rescue: dict[tuple[str, bool], int] = {}
    for df_p, len_p, resc_p in parts:
        total_len += len_p
        for t, c in df_p.items():
            df[t] = df.get(t, 0) + c
        for k_, c in resc_p.items():
            rescue[k_] = rescue.get(k_, 0) + c
    avgdl = (total_len / n_docs) if n_docs else 0.0
    return GlobalStats(n_docs, avgdl, df, rescue)


def _query_worker(rng: tuple[int, int]):
    """{qid: shard-local top-k} for doc_ids [lo, hi), scored with the
    parent's GLOBAL stats patched onto the shard index."""
    lo, hi = rng
    assert _STATS is not None and _QUERIES is not None
    ix = CorpusIndex.build(_shard_docs(lo, hi))
    ix.n_docs = _STATS.n_docs
    ix.avgdl = _STATS.avgdl
    ix.df = _STATS.df
    ix.rescue_df_cache = dict(_STATS.rescue_df)
    return {
        qid: oracle.search(ix, q, k=_K) for qid, q in _QUERIES.items()
    }


def sharded_oracle_topk(
    n_docs: int,
    queries: dict[str, str],
    k: int = 10,
    workers: int = 1,
    shard_size: int = 100_000,
    perm: list[int] | None = None,
    stats: GlobalStats | None = None,
) -> dict[str, list[tuple[int, float]]]:
    """Top-k per query over the n_docs synthetic corpus, never holding
    more than workers x shard_size docs of tokens.  f64-identical to
    oracle.search over fixtures.oracle_corpus(n_docs)."""
    global _PERM, _STATS, _QUERIES, _K
    if perm is None:
        perm = url_rank_permutation(n_docs, workers)
    needles = sorted(
        {
            t
            for q in queries.values()
            for t in oracle.rescue_terms(elastic.create_query_plan(q, False))
        }
    )
    if stats is None:
        stats = global_stats(n_docs, perm, needles, workers, shard_size)
    _PERM, _STATS, _QUERIES, _K = perm, stats, dict(queries), k
    ranges = [
        (lo, min(lo + shard_size, n_docs))
        for lo in range(0, n_docs, shard_size)
    ]
    if workers > 1 and n_docs >= 10_000:
        from multiprocessing import get_context

        with get_context("fork").Pool(workers) as pool:
            shard_results = pool.map(_query_worker, ranges)
    else:
        shard_results = [_query_worker(r) for r in ranges]
    out: dict[str, list[tuple[int, float]]] = {}
    for qid in queries:
        merged = [t for sr in shard_results for t in sr[qid]]
        merged.sort(key=lambda x: (-x[1], x[0]))
        out[qid] = merged[:k]
    return out
