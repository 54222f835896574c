"""Edge combinations: field filters x excluded/exact/universal queries,
engine vs oracle."""

import pytest

from probe_spark.oracle import search as oracle_search

COMBOS = [
    "lang:de -deprecated",          # filter + only-excluded
    'lang:de "firewall"',           # filter + exact (rescue scan)
    "lang:fr +firewall whitelist",  # filter + required
    "path:postmortems firewall",    # url-substring filter + term
    "lang:de lang:fr",              # filters only -> universal, empty langs?
]


@pytest.fixture(scope="module")
def engine(spark, tiny_index):
    from probe_spark.engine import SearchEngine

    path, _ = tiny_index
    return SearchEngine(spark, path)


@pytest.mark.parametrize("q", COMBOS)
def test_filter_combo_identity(engine, tiny_oracle, q):
    exp = oracle_search(tiny_oracle, q, k=10)
    got = engine.search_local(q, k=10)
    assert [d for d, _ in got] == [d for d, _ in exp], (q, got, exp)
    for (gd, gs), (_, es) in zip(got, exp):
        assert gs == pytest.approx(es, rel=1e-12, abs=1e-12), (q, gd)


def test_ext_filter_identity(spark, tmp_path):
    """ext:/extension: filters match the url's trailing extension in both
    oracle and engine (filters.rs ext class, re-keyed on url)."""
    from probe_spark.engine import SearchEngine
    from probe_spark.indexer import build_index
    from probe_spark.oracle import CorpusIndex, Doc, url_extension

    rows = [
        ("https://a.example.com/docs/error-handling.html", "firewall error handling retry", "en"),
        ("https://a.example.com/docs/guide.pdf?v=2", "firewall whitelist process", "en"),
        ("https://a.example.com/plain/firewall-post", "firewall process lock", "de"),
        ("https://b.example.com/x/page.HTML", "error retry firewall", "en"),
        ("https://b.example.com/y/data.json#frag", "firewall token validation", "fr"),
    ]
    assert url_extension(rows[0][0]) == "html"
    assert url_extension(rows[1][0]) == "pdf"  # before ?query
    assert url_extension(rows[2][0]) == ""
    assert url_extension(rows[3][0]) == "html"  # case-folded
    assert url_extension(rows[4][0]) == "json"  # before #fragment

    pages = spark.createDataFrame(rows, "url string, text string, lang string")
    d = str(tmp_path / "ix")
    build_index(spark, pages, d, n_buckets=2)
    eng = SearchEngine(spark, d)
    oix = CorpusIndex.build(
        [Doc(i, u, t, lg) for i, (u, t, lg) in enumerate(sorted(rows))]
    )
    for q in ("ext:html firewall", "ext:pdf firewall", "extension:json firewall",
              "ext:html", "ext:nope firewall"):
        exp = oracle_search(oix, q, k=10)
        got = eng.search_local(q, k=10)
        assert [x for x, _ in got] == [x for x, _ in exp], (q, got, exp)
        for (gd, gs), (_, es) in zip(got, exp):
            assert gs == pytest.approx(es, rel=1e-12, abs=1e-12), (q, gd)


def test_fresh_rebuild_clears_stale_lineage(spark, tmp_path):
    """A non-resume rebuild into an existing dir must not double-count
    metrics from the previous build's lineage."""
    from probe_spark.fixtures import pages_df
    from probe_spark.indexer import build_index

    d = str(tmp_path / "ix")
    pages = pages_df(spark, 100).drop("html", "warc_ts")
    m1 = build_index(spark, pages, d, n_buckets=2)
    m2 = build_index(spark, pages, d, n_buckets=2)  # rebuild, fresh
    assert m1["n_docs"] == m2["n_docs"] == 100
    assert m2["n_postings"] == m1["n_postings"]
