"""Round-4 additions: Bloom-prefiltered incremental dedup, cluster mixture
report, and SSL-prototypes pruning.

Each entry is also under the driver's DuckDB gate (ALL_QUERIES); these
tests pin hand-computed semantics on tiny corpora -- in particular that
the bloom path stays EXACT under forced heavy false positives, the one
failure mode the sf fixtures cannot produce on demand.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from probe_spark.dedup import incremental_dedup


def _frames(spark, snap_texts, batch_texts):
    snap = spark.createDataFrame(
        [(i, t) for i, t in enumerate(snap_texts)], "doc_id long, text string"
    )
    base = len(snap_texts)
    batch = spark.createDataFrame(
        [(base + i, t) for i, t in enumerate(batch_texts)],
        "doc_id long, text string",
    )
    return snap, batch


def test_incremental_dedup_drops_snapshot_dups_only(spark):
    # batch texts A and C already exist in the snapshot -> dropped; the two
    # identical E docs are INTRA-batch dups -- this operator dedups against
    # the snapshot only, so both keep (exact dedup of the batch against
    # itself is dedup_exact's job)
    snap, batch = _frames(
        spark, ["A", "B", "C"], ["A", "D", "C", "E", "E"]
    )
    kept = {r["doc_id"] for r in incremental_dedup(snap, batch).collect()}
    assert kept == {4, 6, 7}


def test_incremental_dedup_exact_under_forced_false_positives(spark):
    # m_bits=4 forces nearly every probe to collide: almost all batch docs
    # go bloom-positive, so the exact-repair anti-join carries the whole
    # answer.  The result must still equal the plain anti-join bit for bit.
    snap, batch = _frames(
        spark,
        [f"snap {i}" for i in range(40)] + ["shared x", "shared y"],
        [f"new {i}" for i in range(40)] + ["shared x", "shared y"],
    )
    got = incremental_dedup(snap, batch, m_bits=4, k_hashes=6)
    want = (
        batch.select("doc_id", F.md5("text").alias("h"))
        .join(snap.select(F.md5("text").alias("h")), "h", "left_anti")
        .select("doc_id", "h")
    )
    g = sorted((r["doc_id"], r["h"]) for r in got.collect())
    w = sorted((r["doc_id"], r["h"]) for r in want.collect())
    assert g == w and len(g) == 40


def test_incremental_dedup_empty_snapshot_keeps_all(spark):
    snap, batch = _frames(spark, [], ["p", "q", "q"])
    kept = {r["doc_id"] for r in incremental_dedup(snap, batch).collect()}
    assert kept == {0, 1, 2}


def test_cluster_assign_report_shape(spark):
    from probe_spark.entry_queries import cluster_assign

    out = cluster_assign(spark, "/root/testdata/sf0.001").toPandas()
    assert sorted(out.columns) == [
        "cell", "max_sim", "min_sim", "n_vecs", "share_ppm",
    ]
    assert int(out["n_vecs"].sum()) == 500  # every vector assigned once
    # shares are floor-ppm of a full partition: sum in (1e6 - #cells, 1e6]
    assert 1_000_000 - len(out) < int(out["share_ppm"].sum()) <= 1_000_000
    assert (out["min_sim"] <= out["max_sim"]).all()


def test_proto_prune_drops_exactly_bottom_decile_per_cell(spark):
    from probe_spark.entry_queries import filter_proto_prune

    out = filter_proto_prune(spark, "/root/testdata/sf0.001").toPandas()
    assert len(out) == 500  # verdict for every vector
    per = out.groupby("cell").agg(
        n=("vec_id", "size"), dropped=("kept", lambda s: int((~s).sum()))
    )
    assert (per["dropped"] == per["n"] // 10).all()
    # the dropped members are exactly the TOP ranks (most prototypical)
    bad = out[~out["kept"]]
    assert (
        bad.groupby("cell")["rank"].max()
        == per.loc[bad["cell"].unique()]["n"] // 10
    ).all()
