"""Multi-file multi-GiB WARC ingest smoke (r4 VERDICT ask #6).

Exports N fixture pages as many-file .warc.gz containers (the Common
Crawl delivery layout: one gzip member per record), then measures:

  a) container parse+extract throughput: read_warc over every file ->
     count (per-file streaming parse, HTTP strip, extract_text)
  b) end-to-end container ingest: read_warc -> build_index
  c) the parquet-path baseline: same pages from parquet -> build_index

and reports docs/s for each plus the corpus geometry.  The per-file
streaming memory claim (one record resident, never the file) is pinned
separately by tests/test_warc.py::test_stream_records_bounded_memory;
this smoke is the throughput half of the evidence.

Usage: python scripts/warc_ingest_smoke.py [n_docs] [n_files]
Defaults: 1_000_000 docs, 32 files (~2.3 GiB of html payload).
Writes scratch under /tmp/warc_smoke; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from probe_spark.fixtures import pages_df
    from probe_spark.indexer import build_index
    from probe_spark.session import get_spark
    from probe_spark.warc import read_warc, write_warc

    tmp = Path("/tmp/warc_smoke")
    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True)
    spark = get_spark("warc_smoke", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_docs": n_docs, "n_files": n_files, "cores": cpus}
    try:
        pages = pages_df(spark, n_docs).repartition(n_files)
        # materialize the parquet baseline first (also the export input,
        # so generation cost is outside every timed window)
        pq_dir = str(tmp / "pages_parquet")
        pages.write.mode("overwrite").parquet(pq_dir)
        pq = spark.read.parquet(pq_dir)

        t0 = time.time()
        n_written = write_warc(pq, str(tmp / "warc"), cdx=False)
        export_sec = time.time() - t0
        files = sorted((tmp / "warc").glob("*.warc.gz"))
        total_bytes = sum(f.stat().st_size for f in files)
        out["export"] = {
            "sec": round(export_sec, 1),
            "docs_per_sec": round(n_written / export_sec, 1),
            "files": len(files),
            "gzip_bytes": total_bytes,
            "gib": round(total_bytes / 2**30, 2),
        }

        paths = [str(f) for f in files]
        t0 = time.time()
        n_parsed = read_warc(spark, paths).count()
        parse_sec = time.time() - t0
        assert n_parsed == n_docs, (n_parsed, n_docs)
        out["parse_extract"] = {
            "sec": round(parse_sec, 1),
            "docs_per_sec": round(n_parsed / parse_sec, 1),
            "mib_per_sec": round(total_bytes / 2**20 / parse_sec, 1),
        }

        t0 = time.time()
        m = build_index(
            spark, read_warc(spark, paths), str(tmp / "ix_warc"), n_buckets=8
        )
        warc_build_sec = time.time() - t0
        out["build_from_warc"] = {
            "sec": round(warc_build_sec, 1),
            "docs_per_sec": round(n_docs / warc_build_sec, 1),
            "n_postings": m["n_postings"],
        }

        t0 = time.time()
        m2 = build_index(spark, pq, str(tmp / "ix_pq"), n_buckets=8)
        pq_build_sec = time.time() - t0
        out["build_from_parquet"] = {
            "sec": round(pq_build_sec, 1),
            "docs_per_sec": round(n_docs / pq_build_sec, 1),
            "n_postings": m2["n_postings"],
        }
        assert m["n_postings"] == m2["n_postings"]
        out["container_overhead_x"] = round(warc_build_sec / pq_build_sec, 2)
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
