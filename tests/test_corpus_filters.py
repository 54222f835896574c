"""Round-4 corpus-filter operators: percentile length trim, domain-level
spam filter, SemDeDup semantic dedup.

Each entry is also under the driver's DuckDB gate (ALL_QUERIES); these
tests pin hand-computed expectations on tiny corpora so a regression is
caught without the oracle, plus the keep-the-farthest SemDeDup paper
semantics and the tau monotonicity contract.
"""

from __future__ import annotations

import pandas as pd

from probe_spark.entry_queries import (
    filter_domain_spam,
    filter_length_percentile,
    semantic_dedup,
)


def _write_docs(tmp_path, rows):
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def test_length_percentile_hand_computed(spark, tmp_path):
    # 20 docs with word counts 1..20.  rank_lo = (5*20+99)//100 = 1 ->
    # lo = 1; rank_hi = (95*20+99)//100 = 19 -> hi = 19.  Only the
    # 20-word doc is trimmed.
    rows = [
        (i, " ".join(f"w{j}" for j in range(i)), "en", "s", 5 * i)
        for i in range(1, 21)
    ]
    sf = _write_docs(tmp_path, rows)
    out = {
        r["doc_id"]: r["kept"]
        for r in filter_length_percentile(spark, sf).collect()
    }
    assert out == {i: i <= 19 for i in range(1, 21)}


def test_length_percentile_single_length_keeps_all(spark, tmp_path):
    sf = _write_docs(
        tmp_path, [(i, "a b c", "en", "s", 5) for i in range(4)]
    )
    out = filter_length_percentile(spark, sf).collect()
    assert all(r["kept"] for r in out) and len(out) == 4


def test_domain_spam_hand_computed(spark, tmp_path):
    # 'mill' repeats one word (ttr = 2/40 < 0.42), 'short' averages 3
    # words (< 50), 'good' is long and diverse -> only 'good' survives.
    long_diverse = " ".join(f"t{i}" for i in range(60))
    sf = _write_docs(
        tmp_path,
        [
            (0, "spam " + "spam " * 38 + "x", "en", "mill", 10),
            (1, "a b c", "en", "short", 5),
            (2, long_diverse, "en", "good", 100),
            (3, long_diverse + " extra", "en", "good", 100),
        ],
    )
    out = {
        r["doc_id"]: r["kept"] for r in filter_domain_spam(spark, sf).collect()
    }
    assert out == {0: False, 1: False, 2: True, 3: True}


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )


def test_semantic_dedup_keeps_farthest_from_centroid(spark):
    # One cell: centroid ~ [2/3, 1/3]; ranks by centroid-sim asc are
    # v2 (farthest), v0, v1.  cos(v0, v1) = 1 >= tau drops v1 (v0 is the
    # lower-ranked of the identical pair); cos(v2, v0) = 0 keeps both.
    emb = _emb_df(spark, [[1, 0], [1, 0], [0, 1]])
    out = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup(spark, emb, k_cells=1, iters=1, tau=0.9).collect()
    }
    assert out == {0: True, 1: False, 2: True}


def test_semantic_dedup_tau_monotone(spark):
    emb = _emb_df(
        spark, [[1, 0], [0.9, 0.1], [0, 1], [0.1, 0.9], [0.5, 0.5]]
    )
    dropped = {}
    for tau in (0.8, 0.95, 1.1):
        out = semantic_dedup(spark, emb, k_cells=2, iters=1, tau=tau)
        dropped[tau] = {r["vec_id"] for r in out.collect() if not r["kept"]}
    # raising tau only shrinks the dup set; above max cosine all survive
    assert dropped[0.95] <= dropped[0.8]
    assert dropped[1.1] == set()


def test_filter_plans_broadcast_not_sortmerge(spark, tmp_path):
    # scale contract: the verdict/threshold joins back onto the corpus
    # must be broadcast (hash or nested-loop for the 1-row threshold
    # frame), never a sort-merge shuffle of the corpus side
    sf = _write_docs(
        tmp_path,
        [(i, " ".join(f"w{j}" for j in range(i + 2)), "en", f"s{i % 2}", 9)
         for i in range(8)],
    )
    spam = filter_domain_spam(spark, sf)
    spam_plan = spam._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in spam_plan
    assert "SortMergeJoin" not in spam_plan
    trim = filter_length_percentile(spark, sf)
    trim_plan = trim._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in trim_plan
    assert "SortMergeJoin" not in trim_plan


def test_sample_dsir_hand_computed(spark, tmp_path):
    # doc 0 is the target slice (0 % 97 == 0).  Vocabulary {apple,
    # banana, zebra, yak}, V=4, target tokens tt=3, train tokens tc=4.
    # lr(apple) = ln(3/7) - ln(2/8) > 0, lr(banana) = ln(2/7) - ln(2/8)
    # > 0, lr(zebra) = lr(yak) = ln(1/7) - ln(2/8) < 0 -> doc 1
    # (target-like words) is selected, doc 2 (words absent from the
    # target) is not.
    sf = _write_docs(
        tmp_path,
        [
            (0, "apple apple banana", "en", "s", 18),
            (1, "apple banana", "en", "s", 12),
            (2, "zebra yak", "en", "s", 9),
        ],
    )
    from probe_spark.entry_queries import sample_dsir

    out = {r["doc_id"]: r for r in sample_dsir(spark, sf).collect()}
    assert set(out) == {1, 2}
    assert out[1]["selected"] and out[1]["weight"] > 0
    assert not out[2]["selected"] and out[2]["weight"] < 0


def test_sim_knn_join_twins_rank_first(spark, tmp_path):
    # Two pairs of identical vectors (all 24 sign bits match within a
    # pair, so band collision is guaranteed) plus noise dims to keep the
    # clusters apart: every vector's top neighbour must be its twin at
    # cos 1.0, and ranks per vector are dense from 1.
    import pandas as pd

    vecs = [
        [1.0, 0.1, 0.0, 0.0],
        [1.0, 0.1, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.2],
        [0.0, 0.0, 1.0, 0.2],
    ]
    pdf = pd.DataFrame(
        {"vec_id": range(4), "embedding": vecs, "label": [0] * 4}
    )
    pdf["embedding"] = pdf["embedding"].apply(
        lambda v: [float(x) for x in v]
    )
    pdf.to_parquet(tmp_path / "embeddings.parquet", index=False)

    from probe_spark.entry_queries import sim_knn_join

    rows = sim_knn_join(spark, str(tmp_path)).collect()
    twin = {0: 1, 1: 0, 2: 3, 3: 2}
    top1 = {r["vec_id"]: r for r in rows if r["rank"] == 1}
    for v, t in twin.items():
        assert top1[v]["nbr"] == t and top1[v]["cos"] == 1.0
    # ranks dense and ordered by cos desc within each vector
    by_vec = {}
    for r in sorted(rows, key=lambda r: (r["vec_id"], r["rank"])):
        by_vec.setdefault(r["vec_id"], []).append(r)
    for v, rs in by_vec.items():
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert [r["cos"] for r in rs] == sorted(
            (r["cos"] for r in rs), reverse=True
        )


import pytest as _pytest


@_pytest.mark.parametrize(
    "lengths",
    [
        list(range(1, 41)),                     # distinct ramp
        [5] * 30 + [500],                       # heavy ties + one outlier
        [1] * 3 + [10] * 34 + [9999] * 3,       # mass at one length
        [7, 7, 7, 7],                           # degenerate single length
    ],
)
def test_length_percentile_trims_at_most_ten_percent(spark, tmp_path, lengths):
    # invariant of the integer rank arithmetic: fewer than ceil(5%N) docs
    # fall below lo and at most floor(5%N) above hi, so kept >= 0.9N - 1
    # for ANY length distribution (ties can only widen the kept band)
    import shutil

    d = tmp_path / f"c{len(lengths)}_{lengths[0]}_{lengths[-1]}"
    d.mkdir()
    sf = _write_docs(
        d, [(i, " ".join(["w"] * n), "en", "s", n) for i, n in enumerate(lengths)]
    )
    out = filter_length_percentile(spark, sf).collect()
    n = len(lengths)
    kept = sum(1 for r in out if r["kept"])
    assert len(out) == n
    assert kept >= 0.9 * n - 1
