"""Edge cases for the phase-A doc-id assignment (_assign_doc_ids):
empty input, duplicate urls, heavy skew.  The url-rank invariant on
realistic corpora is pinned by test_doc_ids_match_url_rank; these cover
the shapes a crawler actually produces that fixtures don't."""

from pyspark.sql import functions as F

from probe_spark.indexer import _assign_doc_ids


def _ids(spark, rows, n_buckets=2):
    df = spark.createDataFrame(rows, "url string, text string, lang string")
    indexed, meta = _assign_doc_ids(spark, df, n_buckets)
    out = indexed.select("doc_id", "url", "bucket").collect()
    return sorted((r["doc_id"], r["url"], r["bucket"]) for r in out), meta


def test_empty_input(spark):
    got, meta = _ids(spark, [])
    assert got == []
    assert meta == []


def test_single_row(spark):
    got, meta = _ids(spark, [("u", "t", "en")])
    assert got == [(0, "u", 0)]
    assert sum(m["count"] for m in meta) == 1


def test_ids_are_global_url_rank(spark):
    urls = [f"https://x.com/{i:04d}" for i in range(200)]
    rows = [(u, "text body", "en") for u in reversed(urls)]
    got, meta = _ids(spark, rows, n_buckets=4)
    assert [g[0] for g in got] == list(range(200))
    assert [g[1] for g in got] == sorted(urls)
    assert sum(m["count"] for m in meta) == 200
    # buckets ascend with url ranges (contiguous slices -> contiguous buckets)
    buckets = [g[2] for g in got]
    assert buckets == sorted(buckets)


def test_duplicate_urls_get_unique_contiguous_ids(spark):
    # a recrawl can hand the batch builder duplicate urls; ids must stay
    # unique and contiguous even when duplicates sit at slice boundaries
    rows = [(f"https://x.com/{i % 10}", "t", "en") for i in range(100)]
    got, _meta = _ids(spark, rows, n_buckets=2)
    ids = [g[0] for g in got]
    assert sorted(ids) == list(range(100))
    # equal urls hold consecutive id ranges (they sort together)
    by_url: dict[str, list[int]] = {}
    for i, u, _b in got:
        by_url.setdefault(u, []).append(i)
    for u, block in by_url.items():
        block.sort()
        assert block == list(range(block[0], block[0] + len(block))), u


def test_skewed_input_one_hot_prefix(spark):
    # 90% of urls share one prefix: range slices absorb the skew, ranks
    # stay the global url rank
    rows = [(f"https://hot.com/{i:05d}", "t", "en") for i in range(180)]
    rows += [(f"https://z{i}.com/x", "t", "en") for i in range(20)]
    got, _meta = _ids(spark, rows, n_buckets=4)
    assert [g[0] for g in got] == list(range(200))
    assert [g[1] for g in got] == sorted(r[0] for r in rows)


def test_hot_term_salted_across_buckets(spark, tmp_path):
    """SURVEY §4 skew handling: a head term's postings are B independent
    sorted runs (buckets double as salt) -- no single partition owns a hot
    term, and queries over it stay oracle-identical."""
    from pyspark.sql import functions as F

    from probe_spark.engine import SearchEngine
    from probe_spark.indexer import build_index
    from probe_spark.oracle import CorpusIndex, Doc
    from probe_spark.oracle import search as oracle_search

    # 400 docs, every one of them containing the hot term
    rows = [
        (
            f"https://h{i % 7}.example.com/p{i:04d}",
            f"boilerplate banner text shared page {i % 13} item{i}",
            "en",
        )
        for i in range(400)
    ]
    pages = spark.createDataFrame(rows, "url string, text string, lang string")
    ix = str(tmp_path / "hot_ix")
    build_index(spark, pages, ix, n_buckets=4)

    hot = (
        spark.read.parquet(f"{ix}/postings")
        .filter(F.col("term") == "boilerpl")
    )
    n_buckets_holding = hot.select("bucket").distinct().count()
    assert hot.count() == 400
    assert n_buckets_holding >= 3, "hot term must spread across buckets"

    docs = sorted(rows, key=lambda r: r[0])
    oidx = CorpusIndex.build(
        [Doc(i, u, t, lang) for i, (u, t, lang) in enumerate(docs)]
    )
    eng = SearchEngine(spark, ix)
    for q in ["boilerplate", "boilerplate AND banner", "+boilerplate -item5"]:
        assert eng.search_local(q, 10) == oracle_search(oidx, q, k=10), q
