"""Structured Streaming incremental index maintenance (extension).

The reference is batch-per-invocation with no streaming (SURVEY.md SS2.12),
and the north rule requires resumable BATCH builds -- satisfied by
indexer.py's lineage checkpoints.  This module is the optional streaming
extension sketched there: new pages arriving in a directory are folded into
the index incrementally with exactly-once semantics from the Structured
Streaming checkpoint.

Design:
  * readStream over the pages directory (file source tracks processed files
    in the checkpoint -- the streaming analog of snapshot-scoped builds);
  * foreachBatch: tokenize the micro-batch with the SAME shared pipeline,
    assign doc_ids above the current high-water mark (batch-local url rank
    -- note this is arrival-order, not global url rank, so tie-breaks are
    deterministic but not identical to a from-scratch rebuild; a rebuild
    canonicalizes), append postings/pages_indexed/doc_lens under delta
    buckets, refresh terms/stats (cheap idempotent aggregates);
  * the flat-postings query engine sees appended postings immediately;
    compaction folds deltas into block-max blocks on demand.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from probe_spark.indexer import TOKENS_SCHEMA, _tokenize_partition, write_stats

PAGES_SCHEMA = "url string, text string, lang string"


def _high_water(spark: SparkSession, index_dir: str) -> int:
    p = Path(index_dir) / "stream_state.json"
    if p.exists():
        return int(json.loads(p.read_text())["next_doc_id"])
    lens_dir = Path(index_dir) / "doc_lens"
    if lens_dir.exists():
        row = (
            spark.read.parquet(str(lens_dir))
            .agg(F.max("doc_id").alias("m"))
            .collect()[0]
        )
        if row["m"] is not None:
            return int(row["m"]) + 1
    return 0


def _set_high_water(index_dir: str, value: int) -> None:
    p = Path(index_dir) / "stream_state.json"
    tmp = p.with_suffix(".tmp")
    tmp.write_text(json.dumps({"next_doc_id": value}))
    tmp.rename(p)


def _refresh_aggregates(spark: SparkSession, index_dir: str) -> None:
    out = Path(index_dir)
    tpart = out / "terms_partial"
    if tpart.exists():
        terms_src = spark.read.parquet(str(tpart))
    else:  # pragma: no cover - index built without partials
        terms_src = spark.read.parquet(str(out / "postings")).select(
            "term", F.lit(1).alias("df"), F.col("tf").alias("cf")
        )
    terms_src.groupBy("term").agg(
        F.sum("df").alias("df"), F.sum("cf").alias("cf")
    ).write.mode("overwrite").parquet(str(out / "terms"))
    row = (
        spark.read.parquet(str(out / "doc_lens"))
        .agg(F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("a"))
        .collect()[0]
    )
    import shutil

    shutil.rmtree(out / "stats", ignore_errors=True)
    write_stats(index_dir, int(row["n"]), float(row["a"] or 0.0))


def ingest_batch(spark: SparkSession, batch_df, index_dir: str, epoch_id: int) -> int:
    """Fold one micro-batch of pages into the index; returns docs added."""
    out = Path(index_dir)
    base = _high_water(spark, index_dir)
    fresh = batch_df.select("url", "text", "lang").dropDuplicates(["url"])
    if (out / "pages_indexed").exists():
        # url is the document key: re-crawled pages already in the index
        # are skipped (the streaming analog of the session-cache dedup, S8)
        existing = spark.read.parquet(str(out / "pages_indexed")).select("url")
        fresh = fresh.join(existing, "url", "leftanti")
    w = Window.orderBy("url")  # micro-batches are small by construction
    pages = fresh.withColumn(
        "doc_id", F.row_number().over(w) - 1 + F.lit(base)
    )
    rows = pages.select("doc_id", "url", "lang", "text").mapInPandas(
        _tokenize_partition, TOKENS_SCHEMA
    )
    rows.persist()
    n_docs = rows.filter(F.col("term").isNull()).count()
    bucket = f"stream_{epoch_id}_{base}"
    (
        rows.filter(F.col("term").isNotNull())
        .select("term", "doc_id", "tf", "doc_len")
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .parquet(str(out / "postings" / f"bucket={bucket}"))
    )
    (
        rows.filter(F.col("term").isNull())
        .select("doc_id", "url", "lang", "text")
        .coalesce(2)
        .write.mode("overwrite")
        .parquet(str(out / "pages_indexed" / f"bucket={bucket}"))
    )
    (
        rows.filter(F.col("term").isNull())
        .select("doc_id", "doc_len", "tri_bloom")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(str(out / "doc_lens" / f"bucket={bucket}"))
    )
    (
        rows.filter(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(str(out / "terms_partial" / f"bucket={bucket}"))
    )
    rows.unpersist()
    _set_high_water(index_dir, base + n_docs)
    _refresh_aggregates(spark, index_dir)
    # lineage row for the stream batch (same checkpoint table as builds)
    lineage = out / "lineage"
    lineage.mkdir(exist_ok=True)
    (lineage / f"stream_{epoch_id}_{base}.json").write_text(
        json.dumps(
            {
                "bucket": bucket,
                "n_docs": n_docs,
                "epoch": epoch_id,
                "finished_ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
        )
    )
    return n_docs


def start_incremental_index(
    spark: SparkSession,
    pages_stream_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start (or resume) the incremental indexer.  With available_now=True
    it drains everything currently in the directory and stops -- the
    batch-friendly trigger used in tests; on a cluster, drop it and the
    query runs continuously."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(pages_stream_dir)
    )

    def process(batch_df, epoch_id):
        if batch_df.isEmpty():
            return
        ingest_batch(spark, batch_df, index_dir, epoch_id)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
