"""More-like-this, did-you-mean, and snippet-window operators.

The gated entries (probe_index_mlt_simple / _suggest_simple /
_snippet_simple) verify these against DuckDB at sf0.01 and sf0.1; this
module pins the semantics on handcrafted corpora where the expected
output is computable by hand or by an in-test brute-force oracle.
"""

from __future__ import annotations

import math

import pytest

from probe_spark.elastic import ParseError, Term, plan_from_index_terms
from probe_spark.limits import best_window

DOCS = [
    # (url, text) -- tiny corpus with controlled tf/df structure
    ("doc://00000000", "apple banana apple cherry mango mango mango"),
    ("doc://00000001", "apple banana banana cherry"),
    ("doc://00000002", "cherry mango plum plum"),
    ("doc://00000003", "apple plum"),
    ("doc://00000004", "banana cherry mango"),
    ("doc://00000005", "kiwi kiwi kiwi"),
]


@pytest.fixture(scope="module")
def fruit_index(spark, tmp_path_factory):
    from pyspark.sql import Row

    from probe_spark.indexer import build_index

    d = tmp_path_factory.mktemp("mlt") / "fruit"
    pages = spark.createDataFrame(
        [Row(url=u, text=t, lang="en") for u, t in DOCS]
    )
    build_index(spark, pages, str(d), n_buckets=2, tokenizer="simple")
    return str(d)


def _bm25(corpus: dict[str, list[str]], terms: list[str]) -> dict[str, float]:
    """Brute-force BM25 (k1=1.2, b=0.75) over the handcrafted corpus --
    the in-test oracle for more_like_this's bag scoring."""
    n = len(corpus)
    dls = {u: len(t) for u, t in corpus.items()}
    avgdl = sum(dls.values()) / n
    out: dict[str, float] = {}
    for term in terms:
        df = sum(1 for toks in corpus.values() if term in toks)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for u, toks in corpus.items():
            tf = toks.count(term)
            if tf == 0:
                continue
            dl = dls[u]
            out[u] = out.get(u, 0.0) + idf * (tf * 2.2) / (
                tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)
            )
    return out


def test_plan_from_index_terms_shape():
    # resolved index terms are NOT case-folded: a case-preserving simple
    # index stores 'Apple' and 'apple' as DISTINCT vocabulary entries,
    # and lowering either would score zero postings against it
    plan = plan_from_index_terms(["mango", "Apple", "apple"])
    assert plan.terms == ["Apple", "apple", "mango"]  # deduped, sorted
    assert plan.excluded_terms == frozenset()
    assert not plan.has_required_anywhere
    assert not plan.exact and not plan.is_universal_query
    assert plan.special_terms == frozenset()
    # resolved terms are NOT re-stemmed: 'query' would stem to 'queri'
    plan2 = plan_from_index_terms(["query"])
    assert plan2.terms == ["query"]
    assert plan2.is_simple_query and isinstance(plan2.ast, Term)
    with pytest.raises(ParseError):
        plan_from_index_terms([])


def test_more_like_this_matches_brute_force(spark, fruit_index):
    from probe_spark.engine import SearchEngine

    eng = SearchEngine(spark, fruit_index)
    # seed doc 0: tokens apple(2) banana(1) cherry(1) mango(3); df caps at
    # floor(0.95*6)=5 pass everything (max df is 4); len>=3 passes all;
    # selection order (tf desc, df asc, term asc), max_terms=3 picks:
    #   mango (tf3), apple (tf2), banana (tf1, df3) over cherry (tf1, df4)
    hits = eng.more_like_this(
        "doc://00000000", k=10, max_terms=3, max_df_frac=0.95
    ).collect()
    corpus = {u: t.split(" ") for u, t in DOCS}
    expect = _bm25(corpus, ["mango", "apple", "banana"])
    expect.pop("doc://00000000")  # seed excluded
    got = {r["url"]: r["score"] for r in hits}
    assert set(got) == set(expect)
    for u, s in expect.items():
        assert got[u] == pytest.approx(s, abs=1e-9)
    # ranked by (score desc, doc_id asc)
    ranks = [r["url"] for r in hits]
    assert ranks == sorted(
        expect, key=lambda u: (-round(expect[u], 12), u)
    )


def test_more_like_this_df_cap_and_unknown(spark, fruit_index):
    from probe_spark.engine import SearchEngine

    eng = SearchEngine(spark, fruit_index)
    # cap floor(0.1*6)=0 rejects every candidate -> empty, stable schema
    empty = eng.more_like_this("doc://00000000", max_df_frac=0.1)
    assert empty.columns == ["rank", "doc_id", "url", "score"]
    assert empty.count() == 0
    with pytest.raises(KeyError):
        eng.more_like_this("doc://99999999")


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_suggest_matches_brute_force(spark, fruit_index):
    from probe_spark.engine import SearchEngine

    eng = SearchEngine(spark, fruit_index)
    rows = eng.suggest("aple", max_dist=2, limit=5).collect()
    vocab = {}
    for _u, t in DOCS:
        for tok in t.split(" "):
            vocab.setdefault(tok, set()).add(_u)
    cands = sorted(
        (
            (t, len(us), _lev(t, "aple"))
            for t, us in vocab.items()
            if _lev(t, "aple") <= 2
        ),
        key=lambda r: (r[2], -r[1], r[0]),
    )[:5]
    assert [(r["term"], r["df"], r["dist"]) for r in rows] == cands
    assert ("apple", 3, 1) == cands[0]


def test_suggest_case_folds_and_limits(spark, fruit_index):
    from probe_spark.engine import SearchEngine

    eng = SearchEngine(spark, fruit_index)
    rows = eng.suggest("APLE", max_dist=2, limit=1).collect()
    assert len(rows) == 1 and rows[0]["term"] == "apple"
    assert eng.suggest("zzzzzzzz").count() == 0


def test_best_window_tiebreaks():
    toks = "x spark x x x x x x x x x spark join x".split(" ")
    # window at pos 2 (spark only, 1 term) loses to pos 12 (spark+join)
    assert best_window(toks, ("spark", "join"), 10) == (12, 2, 2)
    # distinct-terms ties -> more total hits wins
    toks2 = "spark x x x x x x x x x x spark spark x".split(" ")
    assert best_window(toks2, ("spark", "join"), 10) == (12, 1, 2)
    # full tie -> earliest start
    toks3 = "spark x x x x x x x x x x x x spark".split(" ")
    assert best_window(toks3, ("spark", "join"), 10) == (1, 1, 1)
    assert best_window(["a", "b"], ("spark",), 10) is None
    # empty tokens occupy positions (position parity with the SQL oracle)
    toks4 = "  spark".split(" ")  # ['', '', 'spark']
    assert best_window(toks4, ("spark",), 10) == (3, 1, 1)


@pytest.fixture(scope="module")
def mixedcase_index(spark, tmp_path_factory):
    """Case-PRESERVING simple-tokenizer index with mixed-case vocabulary:
    the regression corpus for the case-folding family of bugs (resolved
    index terms must never be re-folded; prefix/suggest must match the
    dictionary's stored case)."""
    from pyspark.sql import Row

    from probe_spark.indexer import build_index

    docs = [
        ("doc://00000000", "Mango Mango Apple kiwi"),
        ("doc://00000001", "Mango Apple pear kiwi"),
        ("doc://00000002", "pear pear plum"),
    ]
    d = tmp_path_factory.mktemp("mixedcase") / "ix"
    pages = spark.createDataFrame(
        [Row(url=u, text=t, lang="en") for u, t in docs]
    )
    build_index(spark, pages, str(d), n_buckets=2, tokenizer="simple")
    return str(d)


def test_mlt_mixed_case_simple_index(spark, mixedcase_index):
    """Regression: more_like_this on a case-preserving index used to
    lowercase the resolved seed terms ('Mango' -> 'mango'), which have no
    postings -- the near-duplicate doc 1 silently scored zero rows."""
    from probe_spark.engine import SearchEngine

    eng = SearchEngine(spark, mixedcase_index)
    hits = eng.more_like_this(
        "doc://00000000", k=10, max_df_frac=0.99
    ).collect()
    urls = [r["url"] for r in hits]
    # doc 1 shares Mango/Apple/kiwi with the seed and must rank first
    assert urls and urls[0] == "doc://00000001"
    assert all(r["score"] > 0 for r in hits)


def test_prefix_search_mixed_case_simple_index(spark, mixedcase_index):
    """Regression: prefix_search lowered the prefix before the
    case-sensitive startswith, so 'Ma' could never expand to 'Mango'."""
    from probe_spark.engine import SearchEngine

    eng = SearchEngine(spark, mixedcase_index)
    hits = eng.prefix_search("Ma", k=10).collect()
    assert {r["url"] for r in hits} == {
        "doc://00000000", "doc://00000001"
    }
    # probe-tokenizer semantics unchanged: lowercase prefix on a
    # lowercase dictionary would behave identically (no rows here
    # because this dictionary stores 'Mango', not 'mango')
    assert eng.prefix_search("zz", k=10).count() == 0


def test_suggest_mixed_case_simple_index(spark, mixedcase_index):
    """suggest folds BOTH sides for the comparison (case-insensitive
    did-you-mean) while displaying the dictionary's stored case."""
    from probe_spark.engine import SearchEngine

    eng = SearchEngine(spark, mixedcase_index)
    rows = eng.suggest("mangp", max_dist=1, limit=3).collect()
    assert any(r["term"] == "Mango" and r["dist"] == 1 for r in rows)
