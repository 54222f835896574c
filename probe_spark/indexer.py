"""Distributed inverted-index build (SURVEY.md SS7.2-7.4).

Layout under ``index_dir`` (parquet everywhere; the production target is an
Iceberg catalog -- this sandbox has no Iceberg runtime jars, so snapshot
semantics are provided by an explicit manifest + lineage table, which is the
same mechanism Iceberg snapshots would give us):

  manifest.json                 build parameters + bucket offsets (phase A)
  pages_indexed/bucket=i/       ingest snapshot: doc_id-assigned pages
  docs/bucket=i/                doc store: doc_id, url, doc_len, lang, text
  postings/bucket=i/            flat postings: term, doc_id, tf, doc_len
  terms/                        term dictionary: term, df, cf
  stats/                        singleton: n_docs, avgdl
  lineage/                      per-bucket build metrics + checkpoints

Scale design notes (explicitly, per the north rule):
  * doc_id is the global url-lexicographic rank (FIXTURES.md SS1, mirroring
    probe's doc-index tie-break at ranking.rs:408-420), assigned WITHOUT a
    global sort: range-partition by url into B buckets, rank within each
    bucket (Window.partitionBy(bucket)), then add per-bucket offsets
    computed from bucket counts -- two narrow passes, no driver collect of
    data rows.
  * per-doc TF is computed map-side inside the tokenize mapInPandas UDF
    (one Arrow pass, no explode->groupBy shuffle for TF).
  * postings within a bucket are range-partitioned and sorted by
    (term, doc_id) before write, so parquet row-group stats prune term
    lookups at query time; buckets double as salt for hot-term skew --
    a head term's postings are B independent sorted runs merged at query
    or compaction time (SURVEY.md SS4 skew handling).
  * builds are resumable: each bucket commits a lineage row after its
    files land; re-running skips completed buckets (kill-resume tested).
  * doc_len is denormalized into postings rows so BM25 scoring needs no
    join against the doc store.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TOKENS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("url", StringType()),
        StructField("lang", StringType()),
        StructField("text", StringType()),
        StructField("doc_len", LongType()),
        StructField("term", StringType()),
        StructField("tf", IntegerType()),
    ]
)


def _tokenize_partition(iterator):
    """mapInPandas: one input row per doc -> one output row per unique term
    (term != null) carrying (tf, doc_len); plus one row with term = null per
    doc carrying the doc-store payload.  Tokenization is the shared textkit
    pipeline -- identical bytes-in/tokens-out as the oracle."""
    import pandas as pd

    from probe_spark.textkit import preprocess_text_with_url

    for pdf in iterator:
        out = {
            "doc_id": [],
            "url": [],
            "lang": [],
            "text": [],
            "doc_len": [],
            "term": [],
            "tf": [],
        }
        for doc_id, url, lang, text in zip(
            pdf["doc_id"], pdf["url"], pdf["lang"], pdf["text"]
        ):
            toks = preprocess_text_with_url(text or "", url or "")
            counts: dict[str, int] = {}
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
            dl = len(toks)
            # doc-store row
            out["doc_id"].append(doc_id)
            out["url"].append(url)
            out["lang"].append(lang)
            out["text"].append(text)
            out["doc_len"].append(dl)
            out["term"].append(None)
            out["tf"].append(0)
            # posting rows
            for t, c in counts.items():
                out["doc_id"].append(doc_id)
                out["url"].append(None)
                out["lang"].append(None)
                out["text"].append(None)
                out["doc_len"].append(dl)
                out["term"].append(t)
                out["tf"].append(c)
        yield pd.DataFrame(out)


def _assign_doc_ids(
    spark: SparkSession, pages: DataFrame, n_buckets: int
) -> tuple[DataFrame, list[dict]]:
    """Phase A: doc_id = global url rank via range partition + offsets."""
    ranged = pages.repartitionByRange(n_buckets, "url").withColumn(
        "bucket", F.spark_partition_id()
    )
    # persist so the count job and the write job see the SAME range
    # boundaries (range partitioning samples; recomputation could re-sample)
    ranged.persist()
    counts = (
        ranged.groupBy("bucket").count().orderBy("bucket").collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    bucket_meta = []
    for row in counts:
        offsets[row["bucket"]] = acc
        bucket_meta.append({"bucket": row["bucket"], "count": row["count"], "offset": acc})
        acc += row["count"]
    offset_df = spark.createDataFrame(
        [(b, o) for b, o in offsets.items()], ["bucket", "offset"]
    )
    w = Window.partitionBy("bucket").orderBy("url")
    indexed = (
        ranged.withColumn("rank_in_bucket", F.row_number().over(w) - 1)
        .join(F.broadcast(offset_df), "bucket")
        .withColumn("doc_id", F.col("offset") + F.col("rank_in_bucket"))
        .drop("rank_in_bucket", "offset")
    )
    return indexed, bucket_meta, ranged


def _read_lineage(spark: SparkSession, index_dir: str) -> set[int]:
    p = Path(index_dir) / "lineage"
    if not p.exists() or not any(p.glob("*.parquet")):
        return set()
    rows = spark.read.parquet(str(p)).select("bucket").distinct().collect()
    return {r["bucket"] for r in rows}


def _append_lineage(spark: SparkSession, index_dir: str, row: dict) -> None:
    df = spark.createDataFrame(
        [
            (
                row["bucket"],
                row["n_docs"],
                row["n_postings"],
                row["bytes_in"],
                row["bytes_out"],
                row["wall_ms"],
                row["finished_ts"],
            )
        ],
        "bucket int, n_docs long, n_postings long, bytes_in long, "
        "bytes_out long, wall_ms long, finished_ts string",
    )
    df.coalesce(1).write.mode("append").parquet(str(Path(index_dir) / "lineage"))


def _dir_bytes(path: Path) -> int:
    return sum(f.stat().st_size for f in path.rglob("*") if f.is_file())


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    n_buckets: int = 8,
    resume: bool = False,
    validate_extraction: bool = False,
    fail_buckets: frozenset[int] = frozenset(),
) -> dict:
    """Build (or resume) the inverted index from a pages DataFrame.

    ``fail_buckets`` injects a failure after the named buckets complete --
    used by the kill-resume test only.

    Returns build metrics (also persisted in the lineage table).
    """
    out = Path(index_dir)
    out.mkdir(parents=True, exist_ok=True)
    manifest_path = out / "manifest.json"
    pages_indexed_dir = out / "pages_indexed"

    if resume and manifest_path.exists():
        manifest = json.loads(manifest_path.read_text())
        n_buckets = manifest["n_buckets"]
    else:
        if validate_extraction:
            from probe_spark.extract import extract_text

            @F.pandas_udf("string")
            def _extract(html):  # pragma: no cover - trivial wrapper
                return html.map(extract_text)

            bad = pages.filter(_extract(F.col("html")) != F.col("text")).count()
            if bad:
                raise ValueError(
                    f"{bad} rows violate the text == extract_text(html) invariant"
                )
        # Phase A: ingest snapshot with doc ids
        indexed, bucket_meta, ranged = _assign_doc_ids(spark, pages, n_buckets)
        (
            indexed.select("doc_id", "url", "lang", "text", "bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(str(pages_indexed_dir))
        )
        ranged.unpersist()
        manifest = {
            "n_buckets": n_buckets,
            "buckets": bucket_meta,
            "created_ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        manifest_path.write_text(json.dumps(manifest, indent=1))

    done = _read_lineage(spark, index_dir) if resume else set()

    # Phase B: per-bucket tokenize + write (resumable unit)
    for b in range(n_buckets):
        if b in done:
            continue
        t0 = time.time()
        bucket_pages = (
            spark.read.parquet(str(pages_indexed_dir / f"bucket={b}"))
            .select("doc_id", "url", "lang", "text")
            # each bucket lands as ~1 file from the phase-A shuffle; spread
            # tokenization across all cores (round-robin, no key needed)
            .repartition(spark.sparkContext.defaultParallelism)
        )
        rows = bucket_pages.mapInPandas(_tokenize_partition, TOKENS_SCHEMA)
        rows.persist()
        docs_dir = out / "docs" / f"bucket={b}"
        postings_dir = out / "postings" / f"bucket={b}"
        # postings first: the range-partition sampling materializes the
        # persisted tokenization at full parallelism, so the coalesced
        # doc-store write below reads from cache instead of throttling
        # tokenization down to its few write tasks
        postings_b = (
            rows.filter(F.col("term").isNotNull())
            .select("term", "doc_id", "tf", "doc_len")
            .repartitionByRange(
                max(2, spark.sparkContext.defaultParallelism // 2),
                "term",
                "doc_id",
            )
            .sortWithinPartitions("term", "doc_id")
        )
        postings_b.write.mode("overwrite").parquet(str(postings_dir))
        docs_b = rows.filter(F.col("term").isNull()).select(
            "doc_id", "url", "doc_len", "lang", "text"
        )
        docs_b.coalesce(4).write.mode("overwrite").parquet(str(docs_dir))
        n_docs = docs_b.count()
        n_postings = rows.filter(F.col("term").isNotNull()).count()
        rows.unpersist()
        wall_ms = int((time.time() - t0) * 1000)
        _append_lineage(
            spark,
            index_dir,
            {
                "bucket": b,
                "n_docs": n_docs,
                "n_postings": n_postings,
                "bytes_in": _dir_bytes(pages_indexed_dir / f"bucket={b}"),
                "bytes_out": _dir_bytes(postings_dir) + _dir_bytes(docs_dir),
                "wall_ms": wall_ms,
                "finished_ts": time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                ),
            },
        )
        if b in fail_buckets:
            raise RuntimeError(f"injected failure after bucket {b}")

    # Phase C: finalize global aggregates (idempotent overwrite)
    postings = spark.read.parquet(str(out / "postings"))
    terms = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )
    terms.write.mode("overwrite").parquet(str(out / "terms"))
    docs = spark.read.parquet(str(out / "docs"))
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("doc_len").alias("avgdl")
    )
    stats.write.mode("overwrite").parquet(str(out / "stats"))

    lineage = spark.read.parquet(str(out / "lineage"))
    agg = lineage.agg(
        F.sum("n_docs").alias("docs"),
        F.sum("n_postings").alias("postings"),
        F.sum("bytes_in").alias("bytes_in"),
        F.sum("bytes_out").alias("bytes_out"),
        F.sum("wall_ms").alias("wall_ms"),
    ).collect()[0]
    wall_s = max(agg["wall_ms"], 1) / 1000.0
    return {
        "n_docs": agg["docs"],
        "n_postings": agg["postings"],
        "bytes_in": agg["bytes_in"],
        "bytes_out": agg["bytes_out"],
        "wall_ms": agg["wall_ms"],
        "docs_per_sec": agg["docs"] / wall_s,
        "postings_per_sec": agg["postings"] / wall_s,
    }
