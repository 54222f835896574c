#!/usr/bin/env python
"""Round-6 optimization micro-bench (guide SS1): isolates the 12 queries the
frozen bench.py times (8 headline search shapes + 4 entry ops), with

  * the SAME methodology as bench.py (warm engine, min-of-N sweeps,
    ``.collect()`` on the op frames, ``search_local`` for headline shapes),
  * adjacent single-thread steal probes so a degraded host window is
    attributable,
  * per-query Spark JOB counts (the driver fixed cost),
  * optional ``.explain("formatted")`` capture into plans/r06/.

This file is NOT the driver bench; bench.py is frozen for measurement.
Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [--plans DIR]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = {
    "single_term": "spark",
    "and": "merge AND sort",
    "implicit_or": "window batch stream",
    "required": "+spark +join",
    "excluded": "scan -vector",
    "exact_phrase": '"join scan"',
    "nested_bool": "(merge OR sort) AND spark",
    "field_filter": "lang:de spark",
}


def _steal_probe_ms() -> float:
    t0 = time.time()
    x = 0
    for i in range(5 * 10**6):
        x += i * i
    return (time.time() - t0) * 1000.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_sweeps = int(os.environ.get("PROBE_BENCH_SWEEPS", "3"))
    plans_dir = None
    if "--plans" in sys.argv:
        plans_dir = sys.argv[sys.argv.index("--plans") + 1]
        os.makedirs(plans_dir, exist_ok=True)

    from pyspark.sql import functions as F

    from probe_spark.engine import SearchEngine
    from probe_spark.indexer import build_index
    from probe_spark.session import get_spark

    tmp = tempfile.mkdtemp(
        prefix="probe_bx_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    spark = get_spark("probe_bench_extra", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    result: dict = {"sf_dir": sf_dir, "cpus": cpus}
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        pages = docs.select(
            F.format_string("doc://%08d", F.col("doc_id")).alias("url"),
            F.col("text"),
            F.col("lang"),
        )
        t0 = time.time()
        metrics = build_index(spark, pages, f"{tmp}/ix", n_buckets=4)
        result["build_sec"] = round(time.time() - t0, 2)
        result["n_docs"] = metrics["n_docs"]

        eng = SearchEngine(spark, f"{tmp}/ix")
        eng.search_local("spark", 10)
        eng.search_local('"warmup phrase"', 10)
        eng.search_local("+spark merge", 10)

        from probe_spark.entry_queries import (
            dedup_minhash,
            r1_bm25_topk,
            sim_cosine_topk,
            text_quality,
        )

        OPS = [
            ("op_bm25_simple", r1_bm25_topk),
            ("op_dedup_minhash", dedup_minhash),
            ("op_sim_cosine", sim_cosine_topk),
            ("op_text_quality", text_quality),
        ]

        if plans_dir:
            for name, fn in OPS:
                df = fn(spark, sf_dir)
                with open(f"{plans_dir}/{name}.txt", "w") as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))

        sc = spark.sparkContext
        st = sc.statusTracker()
        sweeps: list[dict[str, float]] = []
        probes = [round(_steal_probe_ms(), 1)]
        jobs: dict[str, int] = {}
        for si in range(n_sweeps):
            sweep: dict[str, float] = {}
            for name, q in HEADLINE.items():
                grp = f"bx_{si}_{name}"
                sc.setJobGroup(grp, name)
                t0 = time.time()
                eng.search_local(q, 10)
                sweep[name] = time.time() - t0
                sc.setJobGroup(None, None)
                jobs[name] = len(st.getJobIdsForGroup(grp))
            for name, fn in OPS:
                grp = f"bx_{si}_{name}"
                sc.setJobGroup(grp, name)
                t0 = time.time()
                fn(spark, sf_dir).collect()
                sweep[name] = time.time() - t0
                sc.setJobGroup(None, None)
                jobs[name] = len(st.getJobIdsForGroup(grp))
            sweeps.append(sweep)
            probes.append(round(_steal_probe_ms(), 1))
        queries = {
            name: round(min(s[name] for s in sweeps), 3) for name in sweeps[0]
        }
        result["queries"] = queries
        result["value"] = round(sum(queries.values()), 3)
        result["jobs_last_sweep"] = jobs
        result["sweeps"] = [
            {k: round(v, 3) for k, v in s.items()} for s in sweeps
        ]
        result["window"] = {
            "steal_probe_ms": probes,
            "probe_spread": round(max(probes) / min(probes), 2),
        }
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
