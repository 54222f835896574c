"""LM-quality / vocabulary-coverage / snapshot-dedup operators:
filter_ccnet_buckets, text_bigram_nll, text_oov_rate,
dedup_snapshot_latest.

Each entry is also under the driver's DuckDB gate (ALL_QUERIES); these
tests pin hand-computed expectations on tiny corpora so a regression is
caught without the oracle, plus the structural contracts (bucket
ordering, smoothing formula, deterministic vocabulary cut, argmax
tie-break) the operators must keep at scale.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from probe_spark.entry_queries import (
    dedup_snapshot_latest,
    filter_ccnet_buckets,
    text_bigram_nll,
    text_oov_rate,
)


def _write_docs(tmp_path, rows):
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


# ---------------------------------------------------------------------------
# filter_ccnet_buckets
# ---------------------------------------------------------------------------


def test_ccnet_buckets_hand_computed(tmp_path, spark):
    # one language, 3 docs with strictly increasing NLL: "a a" (all the
    # most common word) < "a b" < "b c" (rarest mix).  Corpus counts:
    # a=3, b=2, c=1, total=6.
    sf = _write_docs(
        tmp_path,
        [
            (0, "a a", "en", "s", 3),
            (1, "a b", "en", "s", 3),
            (2, "b c", "en", "s", 3),
        ],
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in filter_ccnet_buckets(spark, sf).collect()
    }
    lp = {"a": math.log(3 / 6), "b": math.log(2 / 6), "c": math.log(1 / 6)}
    exp = {
        0: -(lp["a"] + lp["a"]) / 2,
        1: -(lp["a"] + lp["b"]) / 2,
        2: -(lp["b"] + lp["c"]) / 2,
    }
    for d, e in exp.items():
        assert got[d]["avg_nll"] == pytest.approx(round(e, 6), abs=1e-9)
    # N=3 -> ranks ceil(3/3)=1, ceil(6/3)=2: one doc per bucket, ordered
    # by NLL (head = most typical)
    assert got[0]["bucket"] == "head"
    assert got[1]["bucket"] == "middle"
    assert got[2]["bucket"] == "tail"


def test_ccnet_buckets_per_language_thresholds(tmp_path, spark):
    # two languages with DIFFERENT score scales; per-language thresholds
    # must bucket each language by its own distribution, never pooled.
    rows = []
    # lang en: 6 docs, 2 of each NLL level
    for i, text in enumerate(["a a", "a a", "a b", "a b", "b c", "b c"]):
        rows.append((i, text, "en", "s", len(text)))
    # lang de: 3 docs all IDENTICAL text -> same bin -> everything is
    # head (cum of the single bin reaches both ranks)
    for i in range(3):
        rows.append((10 + i, "x y", "de", "s", 3))
    sf = _write_docs(tmp_path, rows)
    got = {
        r["doc_id"]: r["bucket"]
        for r in filter_ccnet_buckets(spark, sf).collect()
    }
    assert [got[i] for i in range(6)] == [
        "head", "head", "middle", "middle", "tail", "tail",
    ]
    assert all(got[10 + i] == "head" for i in range(3))


def test_ccnet_bucket_order_matches_score_order(tmp_path, spark):
    # structural contract: within a language, every head doc's bin <=
    # every middle doc's bin <= every tail doc's bin
    rows = [
        (i, " ".join(["w%d" % (j % (1 + i % 5)) for j in range(6)]), "en",
         "s", 11)
        for i in range(30)
    ]
    sf = _write_docs(tmp_path, rows)
    out = filter_ccnet_buckets(spark, sf).collect()
    by_bucket = {"head": [], "middle": [], "tail": []}
    for r in out:
        by_bucket[r["bucket"]].append(r["avg_nll"])
    if by_bucket["head"] and by_bucket["middle"]:
        assert max(by_bucket["head"]) <= min(by_bucket["middle"]) + 0.01
    if by_bucket["middle"] and by_bucket["tail"]:
        assert max(by_bucket["middle"]) <= min(by_bucket["tail"]) + 0.01


# ---------------------------------------------------------------------------
# text_bigram_nll
# ---------------------------------------------------------------------------


def test_bigram_nll_hand_computed(tmp_path, spark):
    # corpus: doc0 "a b a", doc1 "a b".  bigrams: (a,b)x2, (b,a)x1.
    # c1: a->2, b->1.  V = 2 (words a, b).
    sf = _write_docs(
        tmp_path,
        [
            (0, "a b a", "en", "s", 5),
            (1, "a b", "en", "s", 3),
        ],
    )
    got = {
        r["doc_id"]: r.asDict() for r in text_bigram_nll(spark, sf).collect()
    }
    p_ab = (2 + 1) / (2 + 2)  # (c12+1)/(c1+V)
    p_ba = (1 + 1) / (1 + 2)
    assert got[0]["n_bigrams"] == 2
    assert got[0]["avg_nll2"] == pytest.approx(
        round(-(math.log(p_ab) + math.log(p_ba)) / 2, 6), abs=1e-9
    )
    assert got[1]["n_bigrams"] == 1
    assert got[1]["avg_nll2"] == pytest.approx(
        round(-math.log(p_ab), 6), abs=1e-9
    )


def test_bigram_nll_excludes_single_word_docs(tmp_path, spark):
    sf = _write_docs(
        tmp_path,
        [
            (0, "solo", "en", "s", 4),
            (1, "a b", "en", "s", 3),
        ],
    )
    got = {r["doc_id"] for r in text_bigram_nll(spark, sf).collect()}
    assert got == {1}


def test_bigram_nll_flags_word_salad(tmp_path, spark):
    # the signal this op exists for: identical unigram bags, different
    # transition structure.  Repeated "a b" chains are corpus-typical;
    # the salad doc uses the SAME words but unseen-rare transitions.
    rows = [(i, "a b a b a b", "en", "s", 11) for i in range(5)]
    rows.append((9, "b b a a b a", "en", "s", 11))  # same bag, odd pairs
    sf = _write_docs(tmp_path, rows)
    got = {
        r["doc_id"]: r["avg_nll2"]
        for r in text_bigram_nll(spark, sf).collect()
    }
    assert got[9] > got[0]


# ---------------------------------------------------------------------------
# text_oov_rate
# ---------------------------------------------------------------------------


def test_oov_rate_hand_computed(tmp_path, spark):
    # 20 distinct words w00..w19; w00..w15 appear twice (top-16 by
    # count), w16..w19 once.  Tie-breaks don't trigger: counts separate
    # the cut cleanly.
    # counts: w00..w15 appear 3x (docs 0,1,2), w16..w19 appear 1x (doc 1
    # only) -- the top-16 cut is clean, no tie with the rares
    common = " ".join(f"w{i:02d}" for i in range(16))
    rare = "w16 w17 w18 w19"
    sf = _write_docs(
        tmp_path,
        [
            (0, common, "en", "s", len(common)),          # all in-vocab
            (1, common + " " + rare, "en", "s", 99),       # 16/20
            (2, common, "en", "s", len(common)),           # all in-vocab
        ],
    )
    got = {
        r["doc_id"]: r.asDict() for r in text_oov_rate(spark, sf).collect()
    }
    assert got[0]["in_vocab_frac"] == 1.0 and got[0]["kept"]
    assert got[1]["in_vocab_frac"] == pytest.approx(0.8)
    assert got[1]["kept"]  # >= is inclusive at the threshold
    assert got[2]["in_vocab_frac"] == 1.0 and got[2]["kept"]


def test_oov_vocab_tie_breaks_lexicographic(tmp_path, spark):
    # 17 words ALL with count 1: the top-16 cut must take the 16
    # lexicographically smallest (deterministic), leaving only 'q' out
    words = sorted(["q"] + [f"a{i:02d}" for i in range(16)])
    sf = _write_docs(
        tmp_path, [(0, " ".join(words), "en", "s", 99)]
    )
    row = text_oov_rate(spark, sf).collect()[0]
    assert row["in_vocab_frac"] == pytest.approx(round(16 / 17, 6))


# ---------------------------------------------------------------------------
# dedup_snapshot_latest
# ---------------------------------------------------------------------------


def _write_events(tmp_path, rows):
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    # microsecond unit: pandas defaults to ns, which parquet records as
    # TIMESTAMP(NANOS) -- illegal for Spark's reader
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf.to_parquet(tmp_path / "events.parquet", index=False)
    return str(tmp_path)


def test_snapshot_latest_hand_computed(tmp_path, spark):
    sf = _write_events(
        tmp_path,
        [
            # key 1: three revisits, latest is event 12
            (10, "2024-01-01 00:00:00", 1, "crawl", 0.0, "{}"),
            (11, "2024-01-02 00:00:00", 1, "crawl", 0.0, "{}"),
            (12, "2024-01-03 00:00:01", 1, "crawl", 0.0, "{}"),
            # key 2: single snapshot
            (20, "2024-06-01 12:00:00", 2, "crawl", 0.0, "{}"),
        ],
    )
    got = {
        r["user_id"]: r.asDict()
        for r in dedup_snapshot_latest(spark, sf).collect()
    }
    assert got[1]["latest_event_id"] == 12
    assert got[1]["n_snapshots"] == 3
    # span = 2 days + 1 second, exact integer microseconds
    assert got[1]["span_us"] == (2 * 86400 + 1) * 1_000_000
    assert got[2] == {
        "user_id": 2,
        "latest_event_id": 20,
        "n_snapshots": 1,
        "span_us": 0,
    }


def test_snapshot_latest_ts_tie_breaks_to_highest_event_id(tmp_path, spark):
    sf = _write_events(
        tmp_path,
        [
            (5, "2024-01-01 00:00:00", 7, "crawl", 0.0, "{}"),
            (9, "2024-01-01 00:00:00", 7, "crawl", 0.0, "{}"),
            (3, "2024-01-01 00:00:00", 7, "crawl", 0.0, "{}"),
        ],
    )
    row = dedup_snapshot_latest(spark, sf).collect()[0]
    assert row["latest_event_id"] == 9
    assert row["span_us"] == 0
