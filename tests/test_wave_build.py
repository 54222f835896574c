"""PROBE_BUILD_WAVE_BUCKETS: chunked-wave builds must produce an index
identical to the single-wave build.

The knob exists to bound the build's in-flight block-manager footprint
(persisted tokenize cache + three repartition shuffles per wave); it must
be a pure scheduling choice -- every derived table byte-identical row-wise
to the default single-wave layout, and lineage still one row per bucket so
resume granularity is unchanged."""

from probe_spark.fixtures import pages_df
from probe_spark.indexer import build_index

from tests.test_spark_engine import lambda_cols


def test_wave_chunked_build_equals_single_wave(spark, tmp_path, monkeypatch):
    pages = pages_df(spark, 200)

    monkeypatch.delenv("PROBE_BUILD_WAVE_BUCKETS", raising=False)
    single_dir = tmp_path / "single"
    m_single = build_index(spark, pages, str(single_dir), n_buckets=5)

    monkeypatch.setenv("PROBE_BUILD_WAVE_BUCKETS", "2")  # 5 buckets -> 3 waves
    waved_dir = tmp_path / "waved"
    m_waved = build_index(spark, pages, str(waved_dir), n_buckets=5)

    assert m_waved["n_postings"] == m_single["n_postings"]
    assert m_waved["n_docs"] == m_single["n_docs"]

    for table in ("pages_indexed", "doc_lens", "postings", "terms", "stats"):
        a = (
            spark.read.parquet(f"{single_dir}/{table}")
            .toPandas()
            .sort_values(by=lambda_cols(spark, f"{single_dir}/{table}"))
            .reset_index(drop=True)
        )
        b = (
            spark.read.parquet(f"{waved_dir}/{table}")
            .toPandas()
            .sort_values(by=lambda_cols(spark, f"{waved_dir}/{table}"))
            .reset_index(drop=True)
        )
        assert a.equals(b), f"{table} differs between single-wave and waved build"

    lineage = spark.read.json(f"{waved_dir}/lineage")
    assert lineage.select("bucket").distinct().count() == 5
