"""Edge contracts of the vectorized quantizer/PQ assignment paths
(entry_queries.assign_sims / pq assign): NULL and wrong-length
embeddings are omitted exactly like the oracle's unnest-of-NULL;
degenerate zero-norm centroids yield NULL sims (DuckDB double x/0.0 is
NULL) that never win assignment; PQ handles a trailing subspace
narrower than sub_dim.  The replaced long-format Spark division would
have thrown DIVIDE_BY_ZERO under ANSI mode on the degenerate input."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from probe_spark.entry_queries import _quantizer_sims, pq_topk


def test_null_and_ragged_embeddings_are_omitted(spark):
    pdf = pd.DataFrame(
        {
            "vec_id": [0, 1, 2, 3],
            "embedding": [
                np.ones(8, dtype=np.float32),
                None,
                np.ones(4, dtype=np.float32),  # wrong length
                np.arange(8, dtype=np.float32),
            ],
        }
    )
    emb = spark.createDataFrame(pdf)
    ed, _vn, sims, _w = _quantizer_sims(emb, 2, 1)
    try:
        assert sorted({r["vec_id"] for r in sims.collect()}) == [0, 3]
    finally:
        ed.unpersist()
        sims.unpersist()


def test_degenerate_zero_centroid_yields_null_and_never_wins(spark):
    # k=2 strata init puts vec 0 and vec 2 in cell 0; their mean is the
    # zero vector, so cell 0's norm is 0 -> every cell-0 sim must be
    # NULL (matching DuckDB x/0.0) and assignment must go to cell 1.
    pdf = pd.DataFrame(
        {
            "vec_id": [0, 1, 2],
            "embedding": [
                np.array([1.0, 0.0], dtype=np.float32),
                np.array([0.5, 0.5], dtype=np.float32),
                np.array([-1.0, 0.0], dtype=np.float32),
            ],
        }
    )
    emb = spark.createDataFrame(pdf)
    ed, _vn, sims, w = _quantizer_sims(emb, 2, 0)
    try:
        rows = [
            (r["vec_id"], r["cell"], r["sim"]) for r in sims.collect()
        ]
        assert all(s is None for _v, c, s in rows if c == 0)
        assert all(s is not None for _v, c, s in rows if c == 1)
        assign = (
            sims.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .collect()
        )
        assert {r["vec_id"] for r in assign} == {0, 1, 2}
        assert all(r["cell"] == 1 for r in assign)
    finally:
        ed.unpersist()
        sims.unpersist()


def test_pq_handles_trailing_narrow_subspace(spark):
    # 8 dims with sub_dim=3 -> subspace widths 3, 3, 2; the vectorized
    # assign must slice the trailing subspace to its true width instead
    # of broadcasting against a padded matrix.
    pdf = pd.DataFrame(
        {
            "vec_id": list(range(6)),
            "embedding": [
                np.random.default_rng(i).standard_normal(8).astype(
                    np.float32
                )
                for i in range(6)
            ],
        }
    )
    emb = spark.createDataFrame(pdf)
    out = pq_topk(
        spark, emb, query_vec_id=0, k_codes=2, sub_dim=3,
        rerank_pool=5, topk=3,
    ).collect()
    assert len(out) == 3
    assert all(r["vec_id"] != 0 for r in out)
