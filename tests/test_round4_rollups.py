"""Round-4 rollup/report operators: exact event percentiles, MAD anomaly
counts, daily-active-users, blocklist-density filter, cross-source overlap
matrix, Heaps vocabulary stats, overlapping chunker.

Each entry is also under the driver's DuckDB gate (ALL_QUERIES); these
tests pin hand-computed expectations on tiny fixtures so a regression is
caught without the oracle.
"""

from __future__ import annotations

import pandas as pd

import math

from probe_spark.entry_queries import (
    corpus_vocab_stats,
    dedup_cross_source_matrix,
    events_anomaly_mad,
    events_distinct_users,
    events_value_percentiles,
    filter_blocklist,
    pipeline_chunk_overlap,
    text_pmi_bigrams,
)


def _write_docs(tmp_path, rows):
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def _write_events(tmp_path, rows):
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    # microsecond precision: Spark's parquet reader rejects TIMESTAMP(NANOS)
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf.to_parquet(tmp_path / "events.parquet", index=False)
    return str(tmp_path)


def test_percentiles_linear_interpolation(spark, tmp_path):
    # values 1..10: p50 = 5.5, p95 at index 0.95*9 = 8.55 -> 9.55,
    # p99 at index 8.91 -> 9.91 (exact linear interpolation, not approx).
    rows = [
        (i, "2024-01-01 00:00:00", i, "a", float(i + 1), "{}")
        for i in range(10)
    ]
    sf = _write_events(tmp_path, rows)
    [r] = events_value_percentiles(spark, sf).collect()
    assert (r["event_type"], r["n"]) == ("a", 10)
    assert (r["p50"], r["p95"], r["p99"]) == (5.5, 9.55, 9.91)


def test_anomaly_mad_flags_only_the_outlier(spark, tmp_path):
    # values [1,2,3,4,100]: median 3, MAD 1, threshold 3 + 3*1.4826 =
    # 7.4478 -> only 100 is flagged.  4 is NOT (robust to the outlier
    # inflating a stddev-based threshold).
    rows = [
        (i, "2024-01-01 00:00:00", i, "a", v, "{}")
        for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 100.0])
    ]
    sf = _write_events(tmp_path, rows)
    [r] = events_anomaly_mad(spark, sf).collect()
    assert (r["n"], r["n_outliers"]) == (5, 1)


def test_dau_counts_distinct_per_day(spark, tmp_path):
    rows = [
        (0, "2024-01-01 01:00:00", 7, "a", 0.0, "{}"),
        (1, "2024-01-01 02:00:00", 7, "a", 0.0, "{}"),  # same user, day 1
        (2, "2024-01-01 03:00:00", 8, "a", 0.0, "{}"),
        (3, "2024-01-02 01:00:00", 7, "a", 0.0, "{}"),
    ]
    sf = _write_events(tmp_path, rows)
    out = {
        r["day"]: (r["n_users"], r["n_events"])
        for r in events_distinct_users(spark, sf).collect()
    }
    assert out == {"2024-01-01": (2, 3), "2024-01-02": (1, 1)}


def test_blocklist_density_integer_rule(spark, tmp_path):
    # doc 0: 1 hit in 19 tokens -> 20 > 19, dropped.  doc 1: 1 hit in
    # 20 tokens -> 20 > 20 false, kept (boundary).  doc 2: clean.
    clean18 = " ".join(f"w{i}" for i in range(18))
    clean19 = " ".join(f"w{i}" for i in range(19))
    rows = [
        (0, "panic " + clean18, "en", "s", 1),
        (1, "panic " + clean19, "en", "s", 1),
        (2, "all clear here", "en", "s", 1),
    ]
    sf = _write_docs(tmp_path, rows)
    [r] = filter_blocklist(spark, sf).collect()
    assert (r["n_docs"], r["n_dropped"], r["total_hits"]) == (3, 1, 2)


def test_cross_source_matrix_prefix_key(spark, tmp_path):
    # docs 0/1 share their first-8-token prefix across srcA/srcB (bodies
    # differ); doc 2's prefix is unique; doc 3 duplicates doc 0 WITHIN
    # srcA (distinct collapse -> not double counted).
    prefix = "p0 p1 p2 p3 p4 p5 p6 p7"
    rows = [
        (0, prefix + " tail one", "en", "srcA", 1),
        (1, prefix + " other body", "en", "srcB", 1),
        (2, "q0 q1 q2 q3 q4 q5 q6 q7 x", "en", "srcA", 1),
        (3, prefix + " tail one", "en", "srcA", 1),
    ]
    sf = _write_docs(tmp_path, rows)
    out = dedup_cross_source_matrix(spark, sf).collect()
    assert [
        (r["src_a"], r["src_b"], r["n_shared_hashes"]) for r in out
    ] == [("srcA", "srcB", 1)]


def test_vocab_stats_hand_computed(spark, tmp_path):
    # src s: "a b a" + "b c" -> 5 tokens, terms {a:2,b:2,c:1} -> 3
    # distinct, 1 hapax, 2 docs.
    rows = [(0, "a b a", "en", "s", 5), (1, "b c", "en", "s", 3)]
    sf = _write_docs(tmp_path, rows)
    [r] = corpus_vocab_stats(spark, sf).collect()
    assert (r["n_docs"], r["n_terms"], r["n_tokens"], r["n_hapax"]) == (
        2,
        3,
        5,
        1,
    )


def test_chunk_overlap_windows(spark, tmp_path):
    # size 50 stride 40.  90 tokens -> starts 0/40 only: the chunk at 40
    # already reaches end-of-doc ([40,90) = 50 tokens), so a start at 80
    # would be a strict SUBSET of it and must not be emitted (no token
    # enters the training mix through a redundant tail chunk).  95
    # tokens -> the chunk at 40 ends at 90 < 95, so start 80 adds the
    # new tokens 90..94 and is emitted with len 15.  A 1-token doc
    # yields a single 1-token chunk.
    rows = [
        (0, " ".join(f"t{i}" for i in range(90)), "en", "s", 1),
        (1, "solo", "en", "s", 1),
        (2, " ".join(f"t{i}" for i in range(95)), "en", "s", 1),
    ]
    sf = _write_docs(tmp_path, rows)
    out = sorted(
        (r["doc_id"], r["chunk_idx"], r["start"], r["chunk_len"])
        for r in pipeline_chunk_overlap(spark, sf).collect()
    )
    assert out == [
        (0, 0, 0, 50),
        (0, 1, 40, 50),
        (1, 0, 0, 1),
        (2, 0, 0, 50),
        (2, 1, 40, 50),
        (2, 2, 80, 15),
    ]


def test_pmi_bigrams_hand_computed(spark, tmp_path):
    # corpus = 3x "a b" + 1x "a c b": N=9 tokens, B=5 bigrams; only
    # (a,b) clears the min-count-3 floor with n12=3, n(a)=n(b)=4 ->
    # pmi = ln(3*9*9 / (5*4*4)).
    rows = [(i, "a b", "en", "s", 3) for i in range(3)]
    rows.append((3, "a c b", "en", "s", 5))
    sf = _write_docs(tmp_path, rows)
    out = text_pmi_bigrams(spark, sf).collect()
    assert [(r["w1"], r["w2"], r["n12"]) for r in out] == [("a", "b", 3)]
    assert out[0]["pmi"] == round(math.log(3 * 9 * 9 / (5 * 4 * 4)), 6)
