"""Structured Streaming incremental index: drain a directory of page files,
fold into an existing index, verify the engine matches an oracle built from
the resulting doc store (exact ids + scores)."""

import pytest

from probe_spark.oracle import CorpusIndex, Doc
from probe_spark.oracle import search as oracle_search


@pytest.mark.parametrize("query", ["firewall", "error AND handling", "+retry process"])
def test_incremental_ingest_then_query(spark, tmp_path, query):
    from pyspark.sql import functions as F

    from probe_spark.engine import SearchEngine
    from probe_spark.fixtures import pages_df
    from probe_spark.indexer import build_index
    from probe_spark.streaming.incremental import start_incremental_index

    ix = str(tmp_path / "ix")
    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()

    # initial batch build over docs 0..149
    base = pages_df(spark, 150).drop("html", "warc_ts")
    build_index(spark, base, ix, n_buckets=2)

    # a wave of 50 new pages arrives as files (docs 150..199)
    wave1 = (
        pages_df(spark, 200)
        .drop("html", "warc_ts")
        .join(base.select("url"), "url", "leftanti")
    )
    wave1.coalesce(1).write.mode("overwrite").parquet(str(stream_dir / "w1"))
    q = start_incremental_index(
        spark, f"{stream_dir}/w1", ix, str(tmp_path / "ckpt1")
    )
    q.awaitTermination(120)

    # engine must now rank over the union corpus; the oracle is built from
    # the engine's own doc store (ids are arrival-order for streamed docs)
    docs_rows = spark.read.parquet(f"{ix}/pages_indexed").collect()
    oracle_ix = CorpusIndex.build(
        [Doc(r["doc_id"], r["url"], r["text"], r["lang"]) for r in docs_rows]
    )
    assert oracle_ix.n_docs == 200

    eng = SearchEngine(spark, ix)
    got = eng.search_local(query, k=10)
    expected = oracle_search(oracle_ix, query, k=10)
    assert [d for d, _ in got] == [d for d, _ in expected], query
    for (gd, gs), (_, es) in zip(got, expected):
        assert gs == pytest.approx(es, rel=1e-12, abs=1e-12), (query, gd)


def test_incremental_compaction_after_stream(spark, tmp_path):
    """Compaction is per-bucket and resumable: after a streaming delta,
    compact_index(resume=True) compacts ONLY the delta bucket, and the
    WAND engine (upper bounds re-derived from current global stats) stays
    rank-identical to the oracle over the union corpus."""
    import json

    from probe_spark.compaction import compact_index
    from probe_spark.fixtures import pages_df
    from probe_spark.indexer import build_index
    from probe_spark.streaming.incremental import start_incremental_index
    from probe_spark.wand import WandEngine

    ix = str(tmp_path / "ix")
    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    base = pages_df(spark, 120).drop("html", "warc_ts")
    build_index(spark, base, ix, n_buckets=2)
    m1 = compact_index(spark, ix)
    assert m1["buckets_compacted"] == 2

    wave = (
        pages_df(spark, 170)
        .drop("html", "warc_ts")
        .join(base.select("url"), "url", "leftanti")
    )
    wave.coalesce(1).write.mode("overwrite").parquet(str(stream_dir / "w"))
    q = start_incremental_index(spark, f"{stream_dir}/w", ix, str(tmp_path / "ck"))
    q.awaitTermination(120)

    m2 = compact_index(spark, ix, resume=True)
    assert m2["buckets_compacted"] == 3  # only the delta was new
    state = json.loads((tmp_path / "ix" / "lineage" / "compaction.json").read_text())
    assert len(state["buckets"]) == 3

    docs_rows = spark.read.parquet(f"{ix}/pages_indexed").collect()
    oracle_ix = CorpusIndex.build(
        [Doc(r["doc_id"], r["url"], r["text"], r["lang"]) for r in docs_rows]
    )
    assert oracle_ix.n_docs == 170
    eng = WandEngine(spark, ix, phase1_segs=1)
    for query in ("firewall", "error AND handling", "+retry process"):
        got = eng.search_local(query, k=10)
        expected = oracle_search(oracle_ix, query, k=10)
        assert [d for d, _ in got] == [d for d, _ in expected], query
        for (gd, gs), (_, es) in zip(got, expected):
            assert gs == pytest.approx(es, rel=1e-12, abs=1e-12), (query, gd)


def test_incremental_checkpoint_no_reprocess(spark, tmp_path):
    """Restarting the stream over the same directory must not double-index
    (exactly-once from the checkpoint)."""
    from probe_spark.fixtures import pages_df
    from probe_spark.indexer import build_index
    from probe_spark.streaming.incremental import start_incremental_index

    ix = str(tmp_path / "ix")
    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    build_index(spark, pages_df(spark, 50).drop("html", "warc_ts"), ix, n_buckets=2)

    pages_df(spark, 80).drop("html", "warc_ts").where("url like '%-7%'").coalesce(
        1
    ).write.mode("overwrite").parquet(str(stream_dir / "w"))

    for _ in range(2):  # second run: checkpoint says nothing new
        q = start_incremental_index(
            spark, f"{stream_dir}/w", ix, str(tmp_path / "ckpt")
        )
        q.awaitTermination(120)

    docs = spark.read.parquet(f"{ix}/pages_indexed")
    assert docs.count() == docs.select("url").distinct().count()
