"""End-to-end Spark engine tests: index build, rank-identity vs the oracle
over the reference query set (FIXTURES.md SS3), determinism, resumability.
"""

import math

import pytest

from probe_spark.oracle import search as oracle_search

# Reference query set q01-q25 (FIXTURES.md SS3)
from probe_spark.fixtures import REFERENCE_QUERIES as QUERIES


@pytest.fixture(scope="module")
def engine(spark, tiny_index):
    from probe_spark.engine import SearchEngine

    path, _metrics = tiny_index
    return SearchEngine(spark, path)


def test_index_build_metrics(tiny_index):
    _, metrics = tiny_index
    assert metrics["n_docs"] == 1000
    assert metrics["n_postings"] > 10000
    assert metrics["docs_per_sec"] > 0
    assert metrics["bytes_in"] > 0 and metrics["bytes_out"] > 0


def test_index_global_stats(spark, tiny_index, tiny_oracle):
    path, _ = tiny_index
    stats = spark.read.parquet(f"{path}/stats").collect()[0]
    assert stats["n_docs"] == tiny_oracle.n_docs
    assert math.isclose(stats["avgdl"], tiny_oracle.avgdl, rel_tol=1e-12)


def test_doc_ids_match_url_rank(spark, tiny_index, tiny_oracle):
    path, _ = tiny_index
    rows = (
        spark.read.parquet(f"{path}/pages_indexed")
        .join(spark.read.parquet(f"{path}/doc_lens"), "doc_id")
        .select("doc_id", "url", "doc_len")
        .orderBy("doc_id")
        .collect()
    )
    assert len(rows) == tiny_oracle.n_docs
    for r in rows:
        d = tiny_oracle.docs[r["doc_id"]]
        assert d.url == r["url"], f"doc_id {r['doc_id']} url mismatch"
        assert tiny_oracle.doc_lens[r["doc_id"]] == r["doc_len"]


def test_df_matches_oracle(spark, tiny_index, tiny_oracle):
    path, _ = tiny_index
    rows = spark.read.parquet(f"{path}/terms").collect()
    spark_df = {r["term"]: r["df"] for r in rows}
    assert spark_df == tiny_oracle.df


@pytest.mark.parametrize("qid", sorted(QUERIES))
def test_rank_identity(engine, tiny_oracle, qid):
    """Engine top-10 must equal the oracle top-10: same doc_ids, same order,
    f64-identical scores (FIXTURES.md SS5 invariant 3)."""
    query = QUERIES[qid]
    expected = oracle_search(tiny_oracle, query, k=10)
    got = engine.search_local(query, k=10)
    assert [d for d, _ in got] == [d for d, _ in expected], (
        f"{qid}: docIDs/order mismatch\n got={got}\n exp={expected}"
    )
    for (gd, gs), (ed, es) in zip(got, expected):
        assert gs == pytest.approx(es, rel=1e-12, abs=1e-12), (
            f"{qid}: score mismatch doc {gd}: {gs} vs {es}"
        )


def test_determinism(engine):
    a = engine.search_local("error handling retry", k=10)
    b = engine.search_local("error handling retry", k=10)
    assert a == b


def test_search_batch_identity(engine):
    """search_batch (one action for the whole set) must be row-identical
    to per-query search() -- across plan shapes that exercise different
    engine state (plain bag, required/boolean, excluded rescue, quoted
    phrase, field filter), pinning that no per-query planning state
    leaks between the unioned branches."""
    batch = {
        "bag": "error handling retry",
        "bool": "+error +handler",
        "excl": "process -deprecated",
        "phrase": '"error handling" retry',
        "field": "lang:de firewall",
    }
    got = engine.search_batch(batch, k=10).collect()
    by_q: dict[str, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["url"], r["score"])
        )
    assert sorted(by_q) == sorted(batch)
    for qid, q in batch.items():
        solo = [
            (r["rank"], r["doc_id"], r["url"], r["score"])
            for r in engine.search(q, k=10).collect()
        ]
        assert by_q[qid] == solo, f"{qid}: batch != solo\n{by_q[qid]}\n{solo}"


def test_search_batch_fused_identity(engine):
    """search_batch_fused (queries-as-data join plan for bag queries,
    branch-union fallback for the rest) must be row-identical to
    search_batch across the WHOLE 25-query reference set -- f64-exact,
    covering both the fused single-/multi-term shapes and every fallback
    shape (required, excluded, quoted, filtered, compound, stopword-only,
    duplicate-keyword)."""
    got = engine.search_batch(QUERIES, k=10).collect()
    fused = engine.search_batch_fused(QUERIES, k=10).collect()
    key = lambda r: (r["query_id"], r["rank"], r["doc_id"], r["url"], r["score"])  # noqa: E731
    assert [key(r) for r in got] == [key(r) for r in fused]


def test_fused_chain_gates_classifier():
    """_fused_chain_gates must fuse exactly the count-expressible
    left-deep chains and bail on every shape whose boolean structure or
    f64 association the fused plan cannot reproduce."""
    from probe_spark import elastic
    from probe_spark.engine import SearchEngine, _fused_chain_gates

    def gates(q):
        p = elastic.create_query_plan(q, False)
        return _fused_chain_gates(p, SearchEngine._excl_only_rescues(p))

    assert gates("error handling retry") == []            # bag
    assert gates("process -deprecated") == ["process"]    # single pos + excl
    assert gates("error AND handling") == ["error", "handl"]   # conjunctive
    assert gates("+error +handler") == ["error", "handler"]    # all required
    assert gates("+error handling") == ["error"]          # required-first
    assert gates("+error handling -noise") == ["error"]
    # bails: parenthesized right subtree, mixed connectors, disjunctive
    # exclusion ("+r -b OR c" matches b-docs when c present), Or-excluded,
    # only-excluded, field filter, stopword-only, multi-keyword positives
    assert gates("(timeout OR deadline) AND retry") is None
    assert gates("error AND handling retry") is None
    assert gates("+retry -deprecated OR process") is None
    assert gates("retry OR -deprecated") is None
    assert gates("-deprecated") is None
    assert gates("lang:de error") is None
    assert gates("the and for") is None
    assert gates("firewall retry") is None  # firewall dual-emits


def test_search_batch_fused_exclusions(engine):
    """Fused exclusions (queries-as-data drop-pair anti-join): bagexcl
    queries ride the fused plan -- including a shared excluded term
    across queries, multiple exclusions in one query, an exclusion that
    hits nothing, and one that wipes a term's whole match set -- and stay
    row-identical to per-query search(), with and without
    exclude_filenames."""
    from probe_spark import elastic
    from probe_spark.engine import SearchEngine, _fused_chain_gates

    batch = {
        "x1": "process -deprecated",
        "x2": "error retry -deprecated",
        "x3": "retry -nonexistentneedle",
        "x4": "error handling -process -deprecated",
        "bag": "error handling retry",
        "req": "+error handling",
        "req2": "+error +handler",
        "reqx": "+process retry -deprecated",
        "conj": "error AND handling",
        "reqq": '+retry -"error handling"',
    }
    for qid, q in batch.items():
        p = elastic.create_query_plan(q, False)
        assert _fused_chain_gates(
            p, SearchEngine._excl_only_rescues(p)
        ) is not None, qid
    for ex_fn in (False, True):
        fused = engine.search_batch_fused(
            batch, k=10, exclude_filenames=ex_fn
        ).collect()
        by_q: dict[str, list] = {}
        for r in fused:
            by_q.setdefault(r["query_id"], []).append(
                (r["rank"], r["doc_id"], r["url"], r["score"])
            )
        for qid, q in batch.items():
            solo = [
                (r["rank"], r["doc_id"], r["url"], r["score"])
                for r in engine.search(
                    q, k=10, exclude_filenames=ex_fn
                ).collect()
            ]
            assert by_q.get(qid, []) == solo, (
                f"{qid} ex_fn={ex_fn}: fused != solo"
            )


def test_exact_flag(engine, tiny_oracle):
    expected = oracle_search(tiny_oracle, "error handling", k=10, exact=True)
    got = engine.search_local("error handling", k=10, exact=True)
    assert [d for d, _ in got] == [d for d, _ in expected]


def test_resumability(spark, tmp_path):
    """Kill after 1 bucket, resume, index equals a clean build
    (FIXTURES.md SS5 invariant 6)."""
    from probe_spark.fixtures import pages_df
    from probe_spark.indexer import build_index

    pages = pages_df(spark, 200)
    clean_dir = tmp_path / "clean"
    build_index(spark, pages, str(clean_dir), n_buckets=3)

    crash_dir = tmp_path / "crash"
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(
            spark, pages, str(crash_dir), n_buckets=3, fail_buckets=frozenset([0])
        )
    # resume completes only the missing buckets
    build_index(spark, pages, str(crash_dir), n_buckets=3, resume=True)

    for table in ("pages_indexed", "doc_lens", "postings", "terms", "stats"):
        a = (
            spark.read.parquet(f"{clean_dir}/{table}")
            .toPandas()
            .sort_values(by=lambda_cols(spark, f"{clean_dir}/{table}"))
            .reset_index(drop=True)
        )
        b = (
            spark.read.parquet(f"{crash_dir}/{table}")
            .toPandas()
            .sort_values(by=lambda_cols(spark, f"{crash_dir}/{table}"))
            .reset_index(drop=True)
        )
        assert a.equals(b), f"{table} differs between clean and resumed build"

    # lineage shows one completed checkpoint per bucket
    from probe_spark.indexer import _read_lineage

    lin = _read_lineage(str(crash_dir))
    assert sorted(lin) == [0, 1, 2]
    assert all(r["n_docs"] > 0 and r["wall_ms"] >= 0 for r in lin.values())


def lambda_cols(spark, path):
    return [
        c for c in spark.read.parquet(path).columns if c not in ("text",)
    ]


def test_extraction_invariant(spark):
    """FIXTURES.md SS5 invariant 1: text == extract_text(html) per row,
    enforced by the build when validate_extraction=True."""
    from probe_spark.fixtures import pages_df
    from probe_spark.indexer import build_index
    import tempfile

    pages = pages_df(spark, 50)
    with tempfile.TemporaryDirectory() as d:
        build_index(spark, pages, d, n_buckets=2, validate_extraction=True)


def test_tokenize_udf_matches_oracle(spark, tiny_index, tiny_oracle):
    """FIXTURES.md SS5 invariant 2: Spark-side tokenization == oracle
    tokenizer, checked via per-doc (doc_len, tf multiset) equality."""
    path, _ = tiny_index
    rows = (
        spark.read.parquet(f"{path}/postings")
        .groupBy("doc_id")
        .agg(
            {"tf": "sum", "term": "count"},
        )
        .collect()
    )
    got = {r["doc_id"]: (r["sum(tf)"], r["count(term)"]) for r in rows}
    for i in range(tiny_oracle.n_docs):
        toks = tiny_oracle.tokens[i]
        exp = (len(toks), len(set(toks)))
        assert got.get(i, (0, 0)) == exp, f"doc {i} token stats mismatch"


def test_wide_query_rank_identity(spark, tiny_index, tiny_oracle, engine):
    """A 40-term mixed query (OR bag + AND + required + excluded) stays
    oracle-identical -- exercises the pivot agg with many tf columns and
    the validated path well below the 256-term limit."""
    from probe_spark.oracle import search as oracle_search

    words = [
        "firewall", "whitelist", "deadlock", "timeout", "deadline", "retry",
        "error", "handler", "process", "migration", "endpoint", "token",
        "header", "download", "upload", "cache", "index", "shard", "replica",
        "batch", "stream", "window", "merge", "sort", "join", "scan",
        "vector", "matrix", "tensor", "graph", "queue", "stack", "heap",
        "tree", "hash", "map", "set", "list",
    ]
    q_or = " ".join(words)  # implicit OR bag
    q_mixed = (
        "(" + " OR ".join(words[:6]) + ") AND (" + " OR ".join(words[6:12])
        + ") +" + words[12] + " -" + words[13]
    )
    for q in (q_or, q_mixed):
        got = engine.search_local(q, 10)
        want = oracle_search(tiny_oracle, q, k=10)
        assert got == want, q


def test_pin_hot_identity_and_refresh(spark, tiny_index):
    """pin_hot (executor-cached postings/doc store for interactive
    serving) must not change any result row, and the pin must survive a
    check_refresh reopen (re-applied to the fresh readers)."""
    from probe_spark.engine import SearchEngine

    path, _ = tiny_index
    cold = SearchEngine(spark, path)
    hot = SearchEngine(spark, path)
    hot.pin_hot()
    assert hot._postings_df.storageLevel.useMemory
    for q in ("firewall", "+error +handler", "process -deprecated",
              '"error handling" retry'):
        assert hot.search_local(q, 10) == cold.search_local(q, 10), q
    # force a reopen and confirm the pin re-applies
    hot._index_fp = None
    assert hot.check_refresh()
    assert hot._pin and hot._postings_df.storageLevel.useMemory
    assert hot.search_local("firewall", 10) == cold.search_local(
        "firewall", 10
    )
    for f in hot._pinned_frames:
        f.unpersist()
