#!/usr/bin/env python
"""Benchmark harness (driver-run per round; see BASELINE.md).

Measures, at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]:

  1. scaling evidence (north rule): the SAME index-build job over a 20k-doc
     synthetic fixture corpus at local[8] vs local[N] -- throughput at both
     plus efficiency = (t8/tN)/(N/8).  Disable with PROBE_BENCH_SCALING=0.
  2. inverted-index build over the sf documents table (docs/sec).
  3. query latency: headline elastic queries + pipeline operators, as
     MIN over 3 serialized sweeps, with per-sweep values and adjacent
     single-thread steal probes recorded so a degraded host window is
     distinguishable from a real regression in the artifact itself.

Prints ONE JSON line:
  {"metric": "...", "value": <total query sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "build": {...}, "scaling": {...}}
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

# big enough that tokenize compute dominates the fixed per-job costs
# (scheduling, tiny-file writes) -- at 60k the 32-core build was ~60%
# fixed overhead and the measured efficiency reflected the harness, not
# the job; the north-rule evidence needs the job itself to dominate
SCALING_DOCS = int(os.environ.get("PROBE_BENCH_SCALING_DOCS", "150000"))

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


def _burn(_):
    x = 0
    for i in range(2 * 10**7):
        x += i * i
    return x


def _cpu_ceiling(lo: int, hi: int) -> float:
    """Raw-CPU scaling efficiency of this host from lo to hi processes:
    pure-Python arithmetic via multiprocessing, 2 tasks per process slot.
    On an unloaded hi-core box this is ~1.0; co-tenant steal pulls it down
    and bounds ANY job's achievable efficiency."""
    import multiprocessing as mp

    rates = {}
    for n in (lo, hi):
        with mp.Pool(n) as pool:
            t0 = time.time()
            pool.map(_burn, range(2 * n))
        rates[n] = 2 * n / (time.time() - t0)
    return (rates[hi] / rates[lo]) / (hi / lo)


def _steal_probe_ms() -> float:
    """Single-thread fixed-work walltime (ms): a cheap window-quality
    marker recorded ADJACENT to each timed block.  On this shared host the
    CPU ceiling swings 0.4-1.0x between minutes; recording the probe next
    to the measurement makes a degraded window distinguishable from a real
    regression from the artifact alone."""
    t0 = time.time()
    x = 0
    for i in range(5 * 10**6):
        x += i * i
    return (time.time() - t0) * 1000.0


def _io_write_worker(args):
    """One writer: K parquet files of ~8 MB each onto the shared scratch
    (pyarrow only -- no Spark, no JVM), returns bytes written."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path, wid, k = args
    import numpy as np

    rng = np.random.default_rng(wid)
    # random payload defeats parquet compression so bytes written ~= bytes
    # on the wire -- a compressible table would measure the codec, not IO
    col = rng.integers(0, 2**62, size=1_000_000, dtype=np.int64)
    table = pa.table({"v": pa.array(col)})
    total = 0
    for i in range(k):
        f = f"{path}/w{wid}_{i}.parquet"
        pq.write_table(table, f, compression="none")
        total += os.path.getsize(f)
    return total


def _io_ceiling(lo: int, hi: int, tmp: str) -> dict:
    """Write-bandwidth scaling of the bench scratch from lo to hi parallel
    parquet writers (the IO analog of _cpu_ceiling): aggregate MB/s at
    both levels + efficiency.  This is the missing half of the scaling
    story -- the index build is tokenize (CPU) + parquet writes (IO), and
    a shared write path that stops scaling past lo writers bounds the
    build's achievable efficiency the same way CPU steal does.  Real
    clusters give every executor its own disk; this box shares one."""
    import multiprocessing as mp

    d = f"{tmp}/io_probe"
    os.makedirs(d, exist_ok=True)
    out = {}
    try:
        for n in (lo, hi):
            jobs = [(d, w, 2) for w in range(n)]
            with mp.Pool(n) as pool:
                t0 = time.time()
                totals = pool.map(_io_write_worker, jobs)
            sec = time.time() - t0
            out[n] = sum(totals) / sec / (1 << 20)
            for f in os.listdir(d):
                os.unlink(f"{d}/{f}")
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return {
        "io_write_mb_s_lo": round(out[lo], 1),
        "io_write_mb_s_hi": round(out[hi], 1),
        "host_io_ceiling_efficiency": round(
            (out[hi] / out[lo]) / (hi / lo), 3
        ),
    }


def _fresh_spark(cores: int | str):
    from probe_spark.session import get_spark

    s = get_spark("probe_bench", cores=cores)
    s.sparkContext.setLogLevel("ERROR")
    return s


_SCALING_PAGES: str | None = None


def _scaling_pages(tmp: str) -> str:
    """Materialize the synthetic pages table once (untimed setup); the
    timed scaling job then reads parquet like the real workload would."""
    global _SCALING_PAGES
    if _SCALING_PAGES is None:
        from probe_spark.fixtures import pages_df

        path = f"{tmp}/pages"
        spark = _fresh_spark(32)
        try:
            pages_df(spark, SCALING_DOCS).drop("html", "warc_ts").write.mode(
                "overwrite"
            ).parquet(path)
        finally:
            spark.stop()
        _SCALING_PAGES = path
    return _SCALING_PAGES


def _scaling_trial(cores: int, tmp: str, out_dir: str) -> tuple[float, float]:
    """One scaling trial at ``cores``: (build seconds, tokenize-kernel
    seconds) from a fresh session.  The kernel (tokenize+TF mapInPandas, no
    writes) isolates compute scaling from shuffle/write fixed costs; the
    build that precedes it doubles as JIT/codegen warm-up, identical at
    both levels."""
    from pyspark.sql import functions as F

    from probe_spark.indexer import TOKENS_SCHEMA, _tokenize_partition, build_index

    pages_path = _scaling_pages(tmp)
    spark = _fresh_spark(cores)
    try:
        t0 = time.time()
        build_index(spark, spark.read.parquet(pages_path), out_dir, n_buckets=4)
        build_sec = time.time() - t0
        shutil.rmtree(out_dir, ignore_errors=True)
        df = (
            spark.read.parquet(pages_path)
            .withColumn("doc_id", F.monotonically_increasing_id())
            .repartition(int(cores) * 2)
            .mapInPandas(_tokenize_partition, TOKENS_SCHEMA)
        )
        t0 = time.time()
        df.filter(F.col("term").isNull()).count()
        return build_sec, time.time() - t0
    finally:
        spark.stop()


def _scaling_min_of_interleaved(
    cpus: int, tmp: str
) -> tuple[float, float, float, float, list]:
    """Min-of-2 INTERLEAVED trials per level, mirrored order (lo hi hi lo)
    so a drifting host window hits both levels symmetrically -- this shared
    box swings 2-4x between minutes and min-of-N over interleaved runs is
    the only stable statistic.  Each trial is bracketed by a steal probe so
    a PER-TRIAL degraded minute is visible in the artifact (the r4 bench
    saw the two hi-core kernel runs land in a bad patch while the builds
    did not -- whole-block probes could not show that).  Returns
    (t_lo, t_hi, kt_lo, kt_hi, trials) where trials is the per-trial log
    [{cores, build_sec, kernel_sec, probe_ms_before, probe_ms_after}]."""
    best = {8: [float("inf"), float("inf")], cpus: [float("inf"), float("inf")]}
    trials = []
    for i, cores in enumerate((8, cpus, cpus, 8)):
        p0 = _steal_probe_ms()
        b, k = _scaling_trial(cores, tmp, f"{tmp}/scale_{cores}_{i}")
        p1 = _steal_probe_ms()
        trials.append(
            {
                "cores": cores,
                "build_sec": round(b, 2),
                "kernel_sec": round(k, 2),
                "probe_ms_before": round(p0, 1),
                "probe_ms_after": round(p1, 1),
            }
        )
        best[cores][0] = min(best[cores][0], b)
        best[cores][1] = min(best[cores][1], k)
    return best[8][0], best[cpus][0], best[8][1], best[cpus][1], trials


SERVING_LOG_QUERIES = int(os.environ.get("PROBE_BENCH_LOG_QUERIES", "200"))


def _serving_trial(
    cores: int, ix_dir: str, log: dict[str, str]
) -> tuple[float, float]:
    """One query-serving trial at ``cores`` from a fresh session:
    (branch_sec, fused_sec) where branch_sec serves the 25-ref-query set
    via search_batch (one unioned physical plan per query -- per-branch
    scheduling is a fixed driver cost) and fused_sec serves the
    ``log``-query mixed-shape batch via search_batch_fused (queries-as-data
    join with gate-count matching:
    one postings scan + one shuffle regardless of batch size).  A warm-up
    batch first: JIT/codegen and dictionary caching are per-session
    constants, identical at both levels, paid once per executor lifetime
    on a real serving cluster."""
    from probe_spark.engine import SearchEngine
    from probe_spark.fixtures import REFERENCE_QUERIES

    spark = _fresh_spark(cores)
    try:
        eng = SearchEngine(spark, ix_dir)
        eng.search_batch(
            {"warm1": "firewall", "warm2": '+error "handler"'}
        ).collect()
        eng.search_batch_fused({"warm3": "firewall network"}).collect()
        t0 = time.time()
        eng.search_batch(REFERENCE_QUERIES, k=10).collect()
        branch = time.time() - t0
        t0 = time.time()
        eng.search_batch_fused(log, k=10).collect()
        return branch, time.time() - t0
    finally:
        spark.stop()


def _serving_scaling(cpus: int, tmp: str) -> dict:
    """Query-serving throughput at 8 vs ``cpus`` cores over the SAME
    prebuilt fixture index -- the serving half of the north rule's N->4N
    evidence (the build half is _scaling_min_of_interleaved).  Interleaved
    min-of-2 per level with adjacent steal probes, like the build trials.
    The index is built once, untimed, at full cores.  Two serving plans
    are measured so the artifact shows WHY the fused plan exists: the
    branch-union plan's cost is per-query driver scheduling (fixed, does
    not parallelize), the fused plan's cost is data work (scales)."""
    from probe_spark.fixtures import query_log
    from probe_spark.indexer import build_index

    ix_dir = f"{tmp}/serve_ix"
    pages_path = _scaling_pages(tmp)
    spark = _fresh_spark(cpus)
    try:
        build_index(spark, spark.read.parquet(pages_path), ix_dir, n_buckets=4)
    finally:
        spark.stop()
    log = query_log(SERVING_LOG_QUERIES)
    best_b = {8: float("inf"), cpus: float("inf")}
    best_f = {8: float("inf"), cpus: float("inf")}
    trials = []
    for cores in (8, cpus, cpus, 8):
        p0 = _steal_probe_ms()
        b, f = _serving_trial(cores, ix_dir, log)
        p1 = _steal_probe_ms()
        trials.append(
            {
                "cores": cores,
                "branch_sec": round(b, 2),
                "fused_sec": round(f, 2),
                "probe_ms_before": round(p0, 1),
                "probe_ms_after": round(p1, 1),
            }
        )
        best_b[cores] = min(best_b[cores], b)
        best_f[cores] = min(best_f[cores], f)
    shutil.rmtree(ix_dir, ignore_errors=True)
    ratio = cpus / 8
    # same-ratio host ceiling measured adjacent to the serving trials, so
    # the fused plan's raw efficiency is decidable against what the box
    # itself could scale in those minutes (the build block measures its
    # own ceiling the same way)
    ceiling = _cpu_ceiling(8, cpus)
    f_eff = (best_f[8] / best_f[cpus]) / ratio
    return {
        "index_docs": SCALING_DOCS,
        "cores_lo": 8,
        "cores_hi": cpus,
        "host_cpu_ceiling_efficiency": round(ceiling, 3),
        "branch": {
            "job": "25-ref-query batch via half-fused per-query plans "
            "(per-query scoring, shared topk window + url join)",
            "n_queries": 25,
            "sec_lo": round(best_b[8], 2),
            "sec_hi": round(best_b[cpus], 2),
            "queries_per_sec_hi": round(25 / best_b[cpus], 2),
            "efficiency": round((best_b[8] / best_b[cpus]) / ratio, 3),
        },
        "fused": {
            "job": f"{len(log)}-mixed-shape-query log (bag/+req/-excl/AND) via "
            "queries-as-data join "
            "(search_batch_fused)",
            "n_queries": len(log),
            "sec_lo": round(best_f[8], 2),
            "sec_hi": round(best_f[cpus], 2),
            "queries_per_sec_lo": round(len(log) / best_f[8], 2),
            "queries_per_sec_hi": round(len(log) / best_f[cpus], 2),
            "efficiency": round(f_eff, 3),
            "efficiency_vs_host_ceiling": round(min(1.0, f_eff / ceiling), 3)
            if ceiling > 0
            else None,
        },
        "trials": trials,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    # bench scratch on tmpfs: the sandbox's single virtio disk saturates on
    # writeback under parallel writes and poisons timing (real clusters
    # have per-node disks); RAM-backed scratch isolates compute scaling
    tmp = tempfile.mkdtemp(
        prefix="probe_bench_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    result: dict = {
        "metric": "index-build docs/sec + query latency (BM25 inverted index)",
        "unit": "sec",
        "sf": sf,
        "cpus": cpus,
    }

    # 1. scaling evidence: same job, two parallelism levels.  The sandbox
    # is a shared oversubscribed host with 2-4x run-to-run variance AND a
    # fluctuating raw-CPU ceiling (co-tenant steal), so (a) interleave up
    # to three runs per level and take the min, and (b) measure the host's
    # raw multiprocessing ceiling for the same core ratio in the same
    # minutes -- job efficiency is reported both raw and normalized to
    # that ceiling (a real N->4N executor cluster has no such ceiling).
    if os.environ.get("PROBE_BENCH_SCALING", "1") != "0" and cpus > 8:
        ceil0 = _cpu_ceiling(8, cpus)
        io_ceil = _io_ceiling(8, cpus, tmp)
        t_lo, t_hi, kt_lo, kt_hi, trials = _scaling_min_of_interleaved(
            cpus, tmp
        )
        ceil1 = _cpu_ceiling(8, cpus)
        ceiling = max(ceil0, ceil1)
        speedup = t_lo / t_hi
        eff = speedup / (cpus / 8)
        k_eff = (kt_lo / kt_hi) / (cpus / 8)
        result["scaling"] = {
            "job": f"index-build {SCALING_DOCS} synthetic pages",
            "cores_lo": 8,
            "cores_hi": cpus,
            "sec_lo": round(t_lo, 2),
            "sec_hi": round(t_hi, 2),
            "docs_per_sec_lo": round(SCALING_DOCS / t_lo, 1),
            "docs_per_sec_hi": round(SCALING_DOCS / t_hi, 1),
            "speedup": round(speedup, 3),
            "efficiency": round(eff, 3),
            # host ceiling: same-ratio speedup of pure-Python CPU work via
            # multiprocessing (no Spark, no I/O) on this box, measured
            # before and after the job runs; the max is the best the host
            # offered during the window
            "host_cpu_ceiling_efficiency": round(ceiling, 3),
            "efficiency_vs_host_ceiling": round(min(1.0, eff / ceiling), 3)
            if ceiling > 0
            else None,
            # the CPU-dominant tokenize+TF kernel alone (no writes): what a
            # real cluster's executors spend their time on
            "tokenize_kernel_sec_lo": round(kt_lo, 2),
            "tokenize_kernel_sec_hi": round(kt_hi, 2),
            "tokenize_kernel_efficiency": round(k_eff, 3),
            # write-path ceiling of the same scratch the build writes to
            # (no Spark): bounds the non-kernel (write) half of the build
            **io_ceil,
            # per-trial raw values + adjacent window probes: lets a reader
            # attribute an outlier trial to a degraded minute
            "trials": trials,
        }
        # the serving half of the same evidence: batch query throughput
        # over a prebuilt index at the same two parallelism levels
        if os.environ.get("PROBE_BENCH_SERVING", "1") != "0":
            result["scaling"]["serving"] = _serving_scaling(cpus, tmp)

    from probe_spark.engine import SearchEngine
    from probe_spark.indexer import build_index
    from pyspark.sql import functions as F

    spark = _fresh_spark(cpus)

    # 2. index build over the sf documents table
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(
        F.format_string("doc://%08d", F.col("doc_id")).alias("url"),
        F.col("text"),
        F.col("lang"),
    )
    t0 = time.time()
    metrics = build_index(spark, pages, f"{tmp}/ix", n_buckets=4)
    build_sec = time.time() - t0
    result["build"] = {
        "n_docs": metrics["n_docs"],
        "n_postings": metrics["n_postings"],
        "sec": round(build_sec, 2),
        "docs_per_sec": round(metrics["n_docs"] / build_sec, 1),
        "postings_per_sec": round(metrics["n_postings"] / build_sec, 1),
        "bytes_out": metrics["bytes_out"],
    }

    # 3. query latency: MIN-OF-3 SERIALIZED SWEEPS over the whole query
    # set, each sweep bracketed by a single-thread steal probe.  The r3
    # artifact could not distinguish a degraded host window from a real
    # regression (every query slowed uniformly); recording per-sweep
    # values + adjacent window probes makes that call decidable from the
    # JSON alone.  Min (not median) is the right window statistic on a
    # box whose ceiling only ever degrades the number.
    eng = SearchEngine(spark, f"{tmp}/ix")
    # warm-up: codegen/JIT for both the postings path and the doc-store
    # text-scan path (first string-contains scan pays a one-time JIT cost)
    eng.search_local("spark", 10)
    eng.search_local('"warmup phrase"', 10)
    # warm the general boolean path too (pivot agg + lane scorer codegen)
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
    N_SWEEPS = int(os.environ.get("PROBE_BENCH_SWEEPS", "3"))
    sweeps: list[dict[str, float]] = []
    probes: list[float] = [round(_steal_probe_ms(), 1)]
    all_ts: list[float] = []
    for _ in range(N_SWEEPS):
        sweep: dict[str, float] = {}
        for name, q in HEADLINE.items():
            t0 = time.time()
            eng.search_local(q, 10)
            dt = time.time() - t0
            sweep[name] = dt
            all_ts.append(dt)
        for name, fn in OPS:
            t0 = time.time()
            fn(spark, sf_dir).collect()
            sweep[name] = time.time() - t0
        sweeps.append(sweep)
        probes.append(round(_steal_probe_ms(), 1))
    queries = {
        name: round(min(s[name] for s in sweeps), 3) for name in sweeps[0]
    }
    all_ts.sort()
    result["latency"] = {
        "p50": round(all_ts[len(all_ts) // 2], 3),
        "p99": round(all_ts[min(len(all_ts) - 1, int(len(all_ts) * 0.99))], 3),
        "n_samples": len(all_ts),
    }
    result["queries"] = queries
    result["query_sweeps"] = [
        {k: round(v, 3) for k, v in s.items()} for s in sweeps
    ]
    # window evidence adjacent to the query block: per-sweep single-thread
    # probe walltimes (ms; spread > ~1.5x == degraded/unstable window) --
    # see BASELINE.md for how to read these
    result["window"] = {
        "steal_probe_ms": probes,
        "probe_spread": round(max(probes) / min(probes), 2)
        if min(probes) > 0
        else None,
    }
    result["value"] = round(sum(queries.values()), 3)
    # 3b. interactive single-query serving evidence: warm per-query Spark
    # job counts (the driver fixed cost more cores cannot absorb) vs the
    # single-action scheduling floor, plus the pin_hot() lane (postings +
    # doc store executor-cached -- the production hot-set serving
    # configuration).  The pin is dropped afterwards so every other
    # series stays comparable with pre-pin rounds.
    floor_ts = []
    for _ in range(3):
        t0 = time.time()
        spark.range(1).count()
        floor_ts.append(time.time() - t0)
    sc = spark.sparkContext
    st = sc.statusTracker()
    warm_jobs: dict[str, int] = {}
    for name, q in HEADLINE.items():
        grp = f"svjc_{name}"
        sc.setJobGroup(grp, name)
        eng.search_local(q, 10)
        sc.setJobGroup(None, None)
        warm_jobs[name] = len(st.getJobIdsForGroup(grp))
    eng.pin_hot()
    for q in HEADLINE.values():  # fill the cache + codegen once
        eng.search_local(q, 10)
    pinned: dict[str, float] = {}
    for name, q in HEADLINE.items():
        ts = []
        for _ in range(2):
            t0 = time.time()
            eng.search_local(q, 10)
            ts.append(time.time() - t0)
        pinned[name] = round(min(ts), 3)
    for frame in eng._pinned_frames:
        frame.unpersist()
    eng._pin = False
    eng._pinned_frames = ()
    result["serving_single"] = {
        "action_floor_sec": round(min(floor_ts), 3),
        "warm_jobs": warm_jobs,
        "pinned_queries": pinned,
        "pinned_sum_sec": round(sum(pinned.values()), 3),
        "note": (
            "warm_jobs = Spark jobs per warm headline query (AQE stage "
            "materializations included); pinned_* = same queries with "
            "pin_hot() executor-cached postings/doc store, the "
            "interactive-serving configuration"
        ),
    }
    # round-4 pipeline text ops, timed OUTSIDE the headline sum so the
    # "value" series stays comparable across rounds; min-of-2
    from probe_spark.entry_queries import (
        dedup_span_exact,
        pipeline_decontaminate,
        pipeline_decontaminate_fuzzy,
        pipeline_pack_chunks,
        corpus_mixture,
        sample_lang_temperature,
        split_leakage_report,
        text_tfidf_topk,
        dedup_semantic,
        filter_domain_spam,
        filter_length_percentile,
        sample_dsir,
        sim_knn_join,
        dedup_incremental,
        cluster_assign,
        filter_proto_prune,
        text_boilerplate_ngrams,
        text_pii_redact,
        text_repetition,
        text_unigram_nll,
        filter_ccnet_buckets,
        text_bigram_nll,
        text_oov_rate,
        dedup_snapshot_latest,
        sim_pq_topk,
        events_json_extract,
        events_funnel,
        events_retention,
        events_value_percentiles,
        events_anomaly_mad,
        events_distinct_users,
        filter_blocklist,
        dedup_cross_source_matrix,
        corpus_vocab_stats,
        pipeline_chunk_overlap,
        text_pmi_bigrams,
        dedup_url_canonical,
        filter_gopher_rules,
        graph_degree,
        graph_pagerank,
        graph_anchor_text,
        graph_triangles,
        graph_indegree_histogram,
        graph_hits,
        text_readability,
        sample_epoch_mix,
        text_entropy,
        pipeline_shard_manifest,
        events_transition_matrix,
        events_kmv_distinct,
        dedup_containment,
        events_bot_flags,
        graph_reciprocal,
        text_winnow_fingerprints,
        source_warc_roundtrip,
        source_cdx_snapshot_latest,
    )

    # the four quantizer consumers share path-keyed trained-centroid /
    # PQ-codebook caches (entry_queries._CENTROID_CACHE & co.); clear them
    # so this block measures a deterministic cold-then-warm sequence
    # regardless of what ran earlier in the process
    from probe_spark import entry_queries as _eq

    _eq._CENTROID_CACHE.clear()
    _eq._PQ_CODEBOOK_CACHE.clear()
    _QUANTIZER_OPS = {
        "op_semantic_dedup",
        "op_cluster_assign",
        "op_proto_prune",
        "op_pq_ann",
    }

    extra = {}
    # SymSpell lane for the suggest comparison: one-time index-derived
    # table build, recorded apart from the per-query lookup it enables
    from probe_spark.symspell import build_suggest_buckets

    t0 = time.time()
    build_suggest_buckets(spark, f"{tmp}/ix", max_dist=2)
    extra["op_suggest_symspell_build"] = round(time.time() - t0, 3)
    # absorb the engine reopen the new manifest triggers (check_refresh
    # fingerprint change -> stats reread + dictionary preload) HERE, so
    # the first timed op below doesn't pay it and the per-op series stays
    # comparable with pre-lane rounds
    eng.check_refresh()
    for name, fn in (
        ("op_text_repetition", text_repetition),
        ("op_boilerplate_ngrams", text_boilerplate_ngrams),
        ("op_lang_temperature", sample_lang_temperature),
        ("op_decontaminate", pipeline_decontaminate),
        ("op_span_dedup", dedup_span_exact),
        ("op_pii_redact", text_pii_redact),
        ("op_unigram_nll", text_unigram_nll),
        ("op_decontaminate_fuzzy", pipeline_decontaminate_fuzzy),
        ("op_pack_chunks", pipeline_pack_chunks),
        ("op_split_leakage", split_leakage_report),
        ("op_tfidf_topk", text_tfidf_topk),
        ("op_corpus_mixture", corpus_mixture),
        ("op_length_percentile", filter_length_percentile),
        ("op_domain_spam", filter_domain_spam),
        ("op_semantic_dedup", dedup_semantic),
        ("op_dsir_sampling", sample_dsir),
        ("op_knn_join", sim_knn_join),
        ("op_incremental_dedup", dedup_incremental),
        ("op_cluster_assign", cluster_assign),
        ("op_proto_prune", filter_proto_prune),
        ("op_ccnet_buckets", filter_ccnet_buckets),
        ("op_bigram_nll", text_bigram_nll),
        ("op_oov_rate", text_oov_rate),
        ("op_snapshot_latest", dedup_snapshot_latest),
        ("op_pq_ann", sim_pq_topk),
        ("op_events_json", events_json_extract),
        ("op_events_funnel", events_funnel),
        ("op_events_retention", events_retention),
        ("op_events_percentiles", events_value_percentiles),
        ("op_events_anomaly", events_anomaly_mad),
        ("op_events_dau", events_distinct_users),
        ("op_blocklist", filter_blocklist),
        ("op_cross_source", dedup_cross_source_matrix),
        ("op_vocab_stats", corpus_vocab_stats),
        ("op_chunk_overlap", pipeline_chunk_overlap),
        ("op_pmi_bigrams", text_pmi_bigrams),
        ("op_url_canonical", dedup_url_canonical),
        ("op_gopher_rules", filter_gopher_rules),
        ("op_graph_degree", graph_degree),
        ("op_graph_pagerank", graph_pagerank),
        ("op_graph_anchor", graph_anchor_text),
        ("op_graph_triangles", graph_triangles),
        ("op_graph_indeg_hist", graph_indegree_histogram),
        ("op_graph_hits", graph_hits),
        ("op_readability", text_readability),
        ("op_epoch_mix", sample_epoch_mix),
        ("op_text_entropy", text_entropy),
        ("op_shard_manifest", pipeline_shard_manifest),
        ("op_events_transitions", events_transition_matrix),
        # index-native serving extras over the bench's own full-probe
        # index: more-like-this (seed fetch + dictionary lookup + bag
        # query) and did-you-mean -- brute (vocabulary-sized levenshtein
        # scan, the cross-round comparable series) vs the SymSpell
        # delete-bucket lookup (identical rows; the table build cost is
        # op_suggest_symspell_build, recorded once below)
        (
            "op_more_like_this",
            lambda _s, _d: eng.more_like_this(
                "doc://00000007", k=10, max_df_frac=0.95
            ),
        ),
        (
            "op_suggest",
            lambda _s, _d: eng.suggest("sprak", use_buckets=False),
        ),
        (
            "op_suggest_symspell",
            lambda _s, _d: eng.suggest("sprak", use_buckets=True),
        ),
        ("op_kmv_distinct", events_kmv_distinct),
        ("op_containment", dedup_containment),
        ("op_bot_flags", events_bot_flags),
        ("op_graph_reciprocal", graph_reciprocal),
        ("op_winnow", text_winnow_fingerprints),
        # Common-Crawl container paths: full corpus export->re-ingest
        # through .warc.gz framing, and the CDX serialize->parse->plan
        ("op_warc_roundtrip", source_warc_roundtrip),
        ("op_cdx_snapshot", source_cdx_snapshot_latest),
        # prefix-wildcard: dictionary top-terms rewrite + bag scoring
        (
            "op_prefix_search",
            lambda _s, _d: eng.prefix_search("sp", max_terms=4, k=10),
        ),
        # faceted results: all matches grouped by a 16-way url-hash facet
        (
            "op_facets",
            lambda _s, _d: eng.facets(
                "spark join",
                eng._docs().select(
                    "url", F.substring(F.md5("url"), 1, 1).alias("facet")
                ),
            ),
        ),
    ):
        ts = []
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).collect()
            ts.append(time.time() - t0)
        extra[name] = round(min(ts), 3)
        if name in _QUANTIZER_OPS:
            # first run of the first quantizer consumer pays the one-time
            # k-means training (the caches were cleared above); record it
            # so warm min-of-2 vs pre-cache rounds stays attributable
            extra[name + "_first"] = round(ts[0], 3)
    result["extra_ops"] = extra
    result["quantizer_cache"] = (
        "centroid/PQ caches cleared at extra_ops start; *_first includes "
        "any one-time training, plain values are min-of-2 (warm = the "
        "production frozen-codebook serving path)"
    )
    # 4. batched serving: the whole HEADLINE set in ONE Spark action
    # (SearchEngine.search_batch) vs the sequential sum above -- the
    # amortization a cluster gets when queries arrive as an eval batch
    # instead of one job each.  min-of-N like the sweeps.
    seq_sec = sum(queries[n] for n in HEADLINE)
    batch_ts = []
    for _ in range(N_SWEEPS):
        t0 = time.time()
        eng.search_batch(HEADLINE, k=10).collect()
        batch_ts.append(time.time() - t0)
    result["batch"] = {
        "n_queries": len(HEADLINE),
        "batch_sec": round(min(batch_ts), 3),
        "batch_runs": [round(t, 3) for t in batch_ts],
        "sequential_sec": round(seq_sec, 3),
        "amortization": round(seq_sec / min(batch_ts), 2)
        if min(batch_ts) > 0
        else None,
    }
    probes.append(round(_steal_probe_ms(), 1))
    result["window"]["probe_spread"] = (
        round(max(probes) / min(probes), 2) if min(probes) > 0 else None
    )
    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)
    # Full detail object first (own line + sidecar file), then a COMPACT
    # (<1 KiB) headline line LAST: the driver's tail-capture window
    # truncated round 4's single giant line to unparseable, so the final
    # stdout line must always fit.  Readers wanting sweeps/extra_ops use
    # the detail line or BENCH_DETAIL.json.
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    try:
        with open(detail_path, "w") as f:
            json.dump(result, f)
    except OSError:
        detail_path = None
    print(json.dumps(result))
    scaling = result.get("scaling") or {}
    serving = scaling.get("serving") or {}
    compact = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": "sec",
        "sf": result["sf"],
        "queries": {
            n: result["queries"][n]
            for n in list(HEADLINE) + [n for n, _ in OPS]
            if n in result["queries"]
        },
        "latency": result["latency"],
        "build_docs_per_sec": result["build"]["docs_per_sec"],
        "window_probe_spread": result["window"]["probe_spread"],
        "scaling": {
            k: scaling[k]
            for k in (
                "efficiency",
                "host_cpu_ceiling_efficiency",
                "efficiency_vs_host_ceiling",
                "tokenize_kernel_efficiency",
            )
            if k in scaling
        } or None,
        "serving_scaling": {
            "branch_efficiency": serving.get("branch", {}).get("efficiency"),
            "fused_efficiency": serving.get("fused", {}).get("efficiency"),
            "fused_eff_vs_ceiling": serving.get("fused", {}).get(
                "efficiency_vs_host_ceiling"
            ),
        }
        if serving
        else None,
        "batch_amortization": result["batch"]["amortization"],
        "serving_single": {
            "max_warm_jobs": max(
                result["serving_single"]["warm_jobs"].values()
            ),
            "pinned_sum_sec": result["serving_single"]["pinned_sum_sec"],
        },
        "detail": detail_path,
    }
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
