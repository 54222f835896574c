"""Sharded streaming oracle == in-RAM oracle, f64-exact.

The sharded oracle exists so identity runs scale past the in-RAM
oracle's ~11 GB/M-doc ceiling; its whole value rests on producing
bit-identical top-k, so the gate here is exact float equality over the
full 25-query reference set with shard boundaries forced mid-corpus.
"""

import pytest

from probe_spark.fixtures import (
    REFERENCE_QUERIES,
    make_page,
    oracle_corpus,
    page_url,
)
from probe_spark.oracle import search as oracle_search
from probe_spark.oracle_shard import (
    global_stats,
    sharded_oracle_topk,
    url_rank_permutation,
)

N_DOCS = 6000
SHARD = 1000  # forces 6 shards


def test_page_url_matches_make_page():
    for i in list(range(50)) + [997, 12345, 999_983]:
        assert page_url(i) == make_page(i).url


@pytest.fixture(scope="module")
def in_ram():
    return oracle_corpus(N_DOCS)


@pytest.fixture(scope="module")
def sharded():
    return sharded_oracle_topk(
        N_DOCS, REFERENCE_QUERIES, k=10, workers=2, shard_size=SHARD
    )


def test_global_stats_match_in_ram(in_ram):
    perm = url_rank_permutation(N_DOCS)
    stats = global_stats(
        N_DOCS, perm, ["deprecated", "error handling"], shard_size=SHARD
    )
    assert stats.n_docs == in_ram.n_docs
    assert stats.avgdl == in_ram.avgdl  # exact: int sums, one division
    assert stats.df == in_ram.df
    # rescue containment counts equal global_df's memoized values
    from probe_spark import elastic
    from probe_spark.oracle import global_df

    plan = elastic.create_query_plan('-deprecated -"error handling"', False)
    gdf = global_df(in_ram, plan)
    assert stats.rescue_df[("deprecated", False)] == gdf["deprecated"]
    assert stats.rescue_df[("error handling", False)] == gdf["error handling"]


@pytest.mark.parametrize("qid", sorted(REFERENCE_QUERIES))
def test_sharded_rank_identity(in_ram, sharded, qid):
    expected = oracle_search(in_ram, REFERENCE_QUERIES[qid], k=10)
    got = sharded[qid]
    assert [d for d, _ in got] == [d for d, _ in expected], qid
    for (gd, gs), (_, es) in zip(got, expected):
        assert gs == es, f"{qid} doc {gd}: {gs} != {es}"
