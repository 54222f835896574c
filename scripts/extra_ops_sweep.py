#!/usr/bin/env python
"""Round-6 micro-bench for the non-headline pipeline operators bench.py
times in its extra_ops block (entry-queries ops only; the engine-bound
extras need the full probe index and are covered by bench.py itself).
Min-of-2 per op with Spark job counts, mirroring bench.py's methodology.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/extra_ops_sweep.py [op ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OPS = [
    ("op_text_repetition", "text_repetition"),
    ("op_boilerplate_ngrams", "text_boilerplate_ngrams"),
    ("op_lang_temperature", "sample_lang_temperature"),
    ("op_decontaminate", "pipeline_decontaminate"),
    ("op_span_dedup", "dedup_span_exact"),
    ("op_pii_redact", "text_pii_redact"),
    ("op_unigram_nll", "text_unigram_nll"),
    ("op_decontaminate_fuzzy", "pipeline_decontaminate_fuzzy"),
    ("op_pack_chunks", "pipeline_pack_chunks"),
    ("op_split_leakage", "split_leakage_report"),
    ("op_tfidf_topk", "text_tfidf_topk"),
    ("op_corpus_mixture", "corpus_mixture"),
    ("op_length_percentile", "filter_length_percentile"),
    ("op_domain_spam", "filter_domain_spam"),
    ("op_semantic_dedup", "dedup_semantic"),
    ("op_dsir_sampling", "sample_dsir"),
    ("op_knn_join", "sim_knn_join"),
    ("op_incremental_dedup", "dedup_incremental"),
    ("op_cluster_assign", "cluster_assign"),
    ("op_proto_prune", "filter_proto_prune"),
    ("op_ccnet_buckets", "filter_ccnet_buckets"),
    ("op_bigram_nll", "text_bigram_nll"),
    ("op_oov_rate", "text_oov_rate"),
    ("op_snapshot_latest", "dedup_snapshot_latest"),
    ("op_pq_ann", "sim_pq_topk"),
    ("op_events_json", "events_json_extract"),
    ("op_events_funnel", "events_funnel"),
    ("op_events_retention", "events_retention"),
    ("op_events_percentiles", "events_value_percentiles"),
    ("op_events_anomaly", "events_anomaly_mad"),
    ("op_events_dau", "events_distinct_users"),
    ("op_blocklist", "filter_blocklist"),
    ("op_cross_source", "dedup_cross_source_matrix"),
    ("op_vocab_stats", "corpus_vocab_stats"),
    ("op_chunk_overlap", "pipeline_chunk_overlap"),
    ("op_pmi_bigrams", "text_pmi_bigrams"),
    ("op_url_canonical", "dedup_url_canonical"),
    ("op_gopher_rules", "filter_gopher_rules"),
    ("op_graph_degree", "graph_degree"),
    ("op_graph_pagerank", "graph_pagerank"),
    ("op_graph_anchor", "graph_anchor_text"),
    ("op_graph_triangles", "graph_triangles"),
    ("op_graph_indeg_hist", "graph_indegree_histogram"),
    ("op_graph_hits", "graph_hits"),
    ("op_readability", "text_readability"),
    ("op_epoch_mix", "sample_epoch_mix"),
    ("op_text_entropy", "text_entropy"),
    ("op_shard_manifest", "pipeline_shard_manifest"),
    ("op_events_transitions", "events_transition_matrix"),
    ("op_kmv_distinct", "events_kmv_distinct"),
    ("op_containment", "dedup_containment"),
    ("op_bot_flags", "events_bot_flags"),
    ("op_graph_reciprocal", "graph_reciprocal"),
    ("op_winnow", "text_winnow_fingerprints"),
    ("op_warc_roundtrip", "source_warc_roundtrip"),
    ("op_cdx_snapshot", "source_cdx_snapshot_latest"),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    only = set(sys.argv[1:])

    from probe_spark import entry_queries as eq
    from probe_spark.session import get_spark

    spark = get_spark("extra_ops_sweep", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    eq._CENTROID_CACHE.clear()
    eq._PQ_CODEBOOK_CACHE.clear()
    sc = spark.sparkContext
    st = sc.statusTracker()
    out = {}
    jobs = {}
    try:
        for name, fn_name in OPS:
            if only and name not in only and fn_name not in only:
                continue
            fn = getattr(eq, fn_name)
            ts = []
            for i in range(2):
                grp = f"xs_{name}_{i}"
                sc.setJobGroup(grp, name)
                t0 = time.time()
                fn(spark, sf_dir).collect()
                ts.append(time.time() - t0)
                sc.setJobGroup(None, None)
                jobs[name] = len(st.getJobIdsForGroup(grp))
            out[name] = round(min(ts), 3)
            print(f"{name:28s} {out[name]:7.3f}  jobs={jobs[name]}", flush=True)
    finally:
        spark.stop()
    print(json.dumps({"sf_dir": sf_dir, "ops": out, "jobs": jobs}))


if __name__ == "__main__":
    main()
