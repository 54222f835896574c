"""S8 session cache + Q10 validator + Spark-UDF == oracle tokenizer property
(FIXTURES.md SS5 invariant 2 on random strings)."""

import random

from probe_spark.elastic import validate_query


def test_validate_query():
    ok, err = validate_query("+error AND (handler OR worker)")
    assert ok and err is None
    ok, err = validate_query("@ ! ^")
    assert not ok and err


def test_session_cache_roundtrip(spark, tmp_path):
    from probe_spark.session_cache import SessionCache

    cache = SessionCache(spark, str(tmp_path / "cache"))
    results = [(1, 0.9), (2, 0.8), (3, 0.7)]
    # empty cache passes everything through
    assert cache.filter_results("s1", "firewall", results) == results
    cache.add_results("s1", "firewall", results[:2])
    # same session+query: previously returned docs are dropped
    assert cache.filter_results("s1", "firewall", results) == [(3, 0.7)]
    # different query or session: untouched (md5(query) keying)
    assert cache.filter_results("s1", "whitelist", results) == results
    assert cache.filter_results("s2", "firewall", results) == results
    # append accumulates
    cache.add_results("s1", "firewall", [(3, 0.7)])
    assert cache.filter_results("s1", "firewall", results) == []


def test_spark_tokenize_udf_equals_oracle_on_random_strings(spark):
    """Run textkit.tokenize inside a Spark Arrow UDF and compare with the
    driver-side oracle on adversarial random strings."""
    import pandas as pd
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    from probe_spark.textkit import tokenize

    rng = random.Random(1234)
    corpus = []
    alphabet = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
        " _-./:()\"'+!@#éü中文 "
    )
    for i in range(300):
        n = rng.randint(0, 80)
        corpus.append((i, "".join(rng.choice(alphabet) for _ in range(n))))
    corpus += [
        (1000, "parseJSONToHTML5 firewall-whitelist codeblock"),
        (1001, "-negated tokens -here stay out"),
        (1002, "OAuth2Provider std::collections::HashMap"),
    ]

    df = spark.createDataFrame(corpus, "id long, text string")
    schema = StructType(
        [
            StructField("id", StringType()),
            StructField("tokens", ArrayType(StringType())),
        ]
    )

    def run(iterator):
        from probe_spark.textkit import tokenize as tk

        for pdf in iterator:
            yield pd.DataFrame(
                {
                    "id": pdf["id"].astype(str),
                    "tokens": [tk(t or "") for t in pdf["text"]],
                }
            )

    got = {
        int(r["id"]): list(r["tokens"]) for r in df.mapInPandas(run, schema).collect()
    }
    for i, text in corpus:
        assert got[i] == tokenize(text), f"mismatch on {text!r}"


def test_session_cache_md5_invalidation(spark, tmp_path):
    """cache.rs:45-56 analog: a cached doc whose TEXT changed in the doc
    store is returned again (invalidated); unchanged docs stay filtered."""
    from probe_spark.session_cache import SessionCache

    ix = tmp_path / "ix"
    docs_dir = str(ix / "pages_indexed")

    def write_docs(rows):
        spark.createDataFrame(
            rows, "doc_id long, url string, lang string, text string"
        ).coalesce(1).write.mode("overwrite").parquet(docs_dir)

    write_docs([(1, "u1", "en", "alpha"), (2, "u2", "en", "beta")])
    cache = SessionCache(spark, str(tmp_path / "cache"), index_dir=str(ix))
    results = [(1, 0.9), (2, 0.8)]
    cache.add_results("s1", "q", results)
    assert cache.filter_results("s1", "q", results) == []
    # re-ingest changes doc 1's text -> it must come back; doc 2 stays seen
    write_docs([(1, "u1", "en", "alpha CHANGED"), (2, "u2", "en", "beta")])
    assert cache.filter_results("s1", "q", results) == [(1, 0.9)]
