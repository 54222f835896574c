import shutil

import pytest


@pytest.fixture(scope="session")
def spark():
    from probe_spark.session import get_spark

    s = get_spark("probe_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_index(spark, tmp_path_factory):
    """1000-doc fixture corpus indexed on disk (FIXTURES.md 'tiny')."""
    from probe_spark.fixtures import pages_df
    from probe_spark.indexer import build_index

    d = tmp_path_factory.mktemp("ix") / "tiny"
    pages = pages_df(spark, 1000)
    # emit_bloom=True: several tests exercise the legacy bloom prefilter
    # path directly (default builds are bloom-free, tri-lane-served)
    metrics = build_index(spark, pages, str(d), n_buckets=4, emit_bloom=True)
    yield str(d), metrics
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def tiny_oracle():
    from probe_spark.fixtures import oracle_corpus

    return oracle_corpus(1000)
