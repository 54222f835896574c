"""BM25 oracle parity tests.

Goldens ported from /root/reference/src/ranking.rs:798-930 plus pipeline
behavior checks for probe_spark.oracle.search.
"""

import math

from probe_spark import oracle
from probe_spark.config import BM25Params
from probe_spark.oracle import CorpusIndex, Doc, rank_documents, search

# probe's live final-scoring parameters (ranking.rs:363-364)
LIVE = BM25Params(k1=1.5, b=0.5)


def test_basic_bm25_scoring():
    # ranking.rs:802-823
    docs = ["api process load", "another random text with process"]
    results = rank_documents(docs, "+api +process +load", LIVE)
    assert len(results) == 1
    assert results[0][0] == 0
    assert 0.0 < results[0][1] < 10.0


def test_mixed_case_exact_term_with_excluded_term_ranking():
    # ranking.rs:827-847
    docs = [
        "This is keywordAlpha",
        "This is keywordAlpha and keywordGamma",
    ]
    results = rank_documents(docs, '"keywordAlpha" -keywordGamma', LIVE)
    assert len(results) == 1
    assert results[0][0] == 0


def test_relative_bm25_scoring():
    # ranking.rs:884-920: more matching terms => higher score
    docs = [
        "api process load data",
        "api process load",
        "api process",
        "api",
    ]
    results = rank_documents(docs, "api process load data", LIVE)
    assert len(results) == 4
    assert [r[0] for r in results] == [0, 1, 2, 3]
    assert results[0][1] > results[1][1] > results[2][1] > results[3][1]


def test_idf_formula():
    # ranking.rs:136-138
    assert oracle.idf(10, 0) == 0.0
    assert oracle.idf(10, 3) == math.log(1.0 + (10 - 3 + 0.5) / (3 + 0.5))


def test_tie_break_doc_index():
    docs = ["retry retry", "retry retry"]
    results = rank_documents(docs, "retry", LIVE)
    assert [r[0] for r in results] == [0, 1]
    assert results[0][1] == results[1][1]


# --- pipeline (global-stats index) tests -----------------------------------

def mk_index():
    docs = [
        Doc(0, "https://a.example.com/error-handling", "error handling with retry logic", "en"),
        Doc(1, "https://b.example.com/firewall", "the firewall blocks traffic", "en"),
        Doc(2, "https://c.example.com/dbdoc", "database deadlock and timeout errors", "en"),
        Doc(3, "https://d.example.com/de-doc", "firewall whitelist regeln", "de"),
        Doc(4, "https://e.example.com/misc", "process deprecated apis with care", "en"),
    ]
    return CorpusIndex.build(docs)


def test_search_single_term():
    idx = mk_index()
    res = search(idx, "firewall")
    ids = [d for d, _ in res]
    assert set(ids) == {1, 3}
    assert all(s > 0 for _, s in res)


def test_search_and():
    idx = mk_index()
    res = search(idx, "error AND handling")
    assert [d for d, _ in res] == [0]


def test_search_implicit_or():
    idx = mk_index()
    res = search(idx, "error handling")
    assert 0 in [d for d, _ in res]
    assert 2 in [d for d, _ in res]  # "errors" stems to error


def test_search_required():
    idx = mk_index()
    res = search(idx, "+firewall whitelist")
    assert set(d for d, _ in res) == {1, 3}
    # doc 3 has both -> ranks first
    assert res[0][0] == 3


def test_search_excluded():
    idx = mk_index()
    res = search(idx, "process -deprecated")
    # doc 4 contains the substring "deprecated" -> excluded; doc 0 has
    # "process"? no -- "retry logic" etc. Check which docs have token process
    ids = [d for d, _ in res]
    assert 4 not in ids


def test_search_only_excluded():
    idx = mk_index()
    res = search(idx, "-deprecated")
    ids = [d for d, _ in res]
    assert 4 not in ids
    assert set(ids) == {0, 1, 2, 3}
    assert all(s == 0.0 for _, s in res)
    assert ids == sorted(ids)  # doc_id tie-break


def test_search_exact_quoted():
    idx = mk_index()
    res = search(idx, '"error handling"')
    assert [d for d, _ in res] == [0]
    res = search(idx, '"Error Handling"')  # case-insensitive containment
    assert [d for d, _ in res] == [0]


def test_search_lang_filter():
    idx = mk_index()
    res = search(idx, "lang:de firewall")
    assert [d for d, _ in res] == [3]


def test_search_universal_filter_only():
    idx = mk_index()
    res = search(idx, "lang:de")
    assert [d for d, _ in res] == [3]
    assert res[0][1] == 0.0


def test_search_stopword_only_query_empty():
    idx = mk_index()
    res = search(idx, "the and for")
    assert res == []


def test_search_deterministic():
    idx = mk_index()
    a = search(idx, "error handling retry")
    b = search(idx, "error handling retry")
    assert a == b


def test_global_stats_used():
    # df/avgdl must be corpus-global: adding a non-matching doc changes IDF
    idx = mk_index()
    res1 = search(idx, "firewall")
    docs2 = idx.docs + [Doc(5, "https://f.example.com/x", "unrelated words entirely", "en")]
    idx2 = CorpusIndex.build(docs2)
    res2 = search(idx2, "firewall")
    assert [d for d, _ in res1] == [d for d, _ in res2]
    assert res1[0][1] != res2[0][1]  # N changed -> IDF changed
