"""WARC 1.0 source/sink (probe_spark/warc.py, ISO 28500): golden-bytes
parser tests, gzip multi-member handling, and the Spark export->ingest
roundtrip against the fixture corpus."""

from __future__ import annotations

import datetime as dt
import gzip

import pytest

from probe_spark.warc import (
    _read_file,
    build_record,
    parse_records,
    response_rows,
)

TS = dt.datetime(2025, 3, 1, 12, 0, 5, tzinfo=dt.timezone.utc)


def test_record_roundtrip_golden():
    html = b"<html><body>hi \xc3\xa9</body></html>"
    rec = build_record("https://a.example.com/x", TS, html, "fr")
    # spec framing: version line, CRLF headers, blank line, content,
    # double-CRLF terminator
    assert rec.startswith(b"WARC/1.0\r\n")
    assert rec.endswith(b"\r\n\r\n")
    (headers, content), = list(parse_records(rec))
    assert headers["warc-type"] == "response"
    assert headers["warc-target-uri"] == "https://a.example.com/x"
    assert headers["warc-date"] == "2025-03-01T12:00:05Z"
    assert headers["warc-identified-content-language"] == "fr"
    assert content.endswith(html)  # HTTP block + body
    (url, ts, body, lang), = list(response_rows(rec))
    assert (url, ts, body, lang) == (
        "https://a.example.com/x",
        TS,
        html,
        "fr",
    )


def test_non_response_records_skipped():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n"
        b"\r\nabcd\r\n\r\n"
    )
    rec = build_record("doc://1", TS, b"<p>x</p>")
    rows = list(response_rows(info + rec))
    assert len(rows) == 1 and rows[0][0] == "doc://1"
    # headerless payload is returned whole (no false HTTP stripping)
    assert rows[0][3] == "und"


def test_truncated_record_raises():
    rec = build_record("doc://1", TS, b"0123456789")
    with pytest.raises(ValueError, match="truncated"):
        list(parse_records(rec[: len(rec) - 16]))
    with pytest.raises(ValueError, match="version"):
        list(parse_records(b"NOTWARC\r\n\r\n"))


def test_gzip_multi_member_read(tmp_path):
    """CC layout: each record its own gzip member, concatenated."""
    recs = [
        build_record(f"doc://{i}", TS, f"<p>{i}</p>".encode())
        for i in range(3)
    ]
    p = tmp_path / "f.warc.gz"
    with open(p, "wb") as f:
        for r in recs:
            f.write(gzip.compress(r))
    rows = list(response_rows(_read_file(str(p))))
    assert [r[0] for r in rows] == ["doc://0", "doc://1", "doc://2"]
    assert rows[2][2] == b"<p>2</p>"


def test_spark_roundtrip(spark, tmp_path):
    """Export the fixture pages as .warc.gz, re-ingest, and require the
    exact (url, warc_ts, html, lang) multiset back; text must equal the
    deterministic extract_text invariant (the fixture stores exactly
    that)."""
    import glob

    from probe_spark.fixtures import pages_df
    from probe_spark.warc import read_warc, write_warc

    src = pages_df(spark, 40).select(
        "url", "warc_ts", "html", "lang", "text"
    )
    n = write_warc(
        src.select("url", "warc_ts", "html", "lang"), str(tmp_path / "w")
    )
    assert n == 40
    files = sorted(glob.glob(str(tmp_path / "w" / "*.warc.gz")))
    assert files
    back = read_warc(spark, files)
    a = {
        (r["url"], r["warc_ts"], bytes(r["html"]), r["lang"], r["text"])
        for r in src.collect()
    }
    b = {
        (r["url"], r["warc_ts"], bytes(r["html"]), r["lang"], r["text"])
        for r in back.collect()
    }
    assert a == b


def test_roundtrip_entry_matches_oracle(spark, tmp_path):
    """The gated entry's contract, checked directly vs DuckDB on a tiny
    synthetic documents table (the driver runs the same comparison at
    sf0.01)."""
    import duckdb
    import pandas as pd

    from probe_spark.entry_queries import (
        WARC_ROUNDTRIP_SQL,
        source_warc_roundtrip,
    )

    pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["alpha beta", None, "gamma éclair"],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    got = (
        source_warc_roundtrip(spark, str(tmp_path))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    want = con.sql(WARC_ROUNDTRIP_SQL).df()
    assert list(got["html_md5"]) == list(want["html_md5"])
    assert list(got["n_bytes"]) == list(want["n_bytes"])
    assert list(got["ts_unix"]) == list(want["ts_unix"])
    assert list(got["lang"]) == ["en", "en", "en"]


def _wet_record(url: str, ts: dt.datetime, text: str, lang: str) -> bytes:
    body = text.encode("utf-8")
    headers = [
        b"WARC/1.0",
        b"WARC-Type: conversion",
        b"WARC-Target-URI: " + url.encode(),
        b"WARC-Date: " + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode(),
        b"WARC-Identified-Content-Language: " + lang.encode(),
        b"Content-Type: text/plain",
        b"Content-Length: " + str(len(body)).encode(),
    ]
    return b"\r\n".join(headers) + b"\r\n\r\n" + body + b"\r\n\r\n"


def test_wet_source(spark, tmp_path):
    """WET conversion records -> pages shape (html NULL, text direct);
    warcinfo preamble records (every real WET file starts with one) are
    skipped."""
    import glob

    from probe_spark.warc import read_wet

    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n"
        b"\r\nabcd\r\n\r\n"
    )
    recs = info + b"".join(
        _wet_record(f"https://x.example.com/{i}", TS, f"text {i} é", "de")
        for i in range(3)
    )
    p = tmp_path / "f.warc.wet.gz"
    p.write_bytes(gzip.compress(recs))
    df = read_wet(spark, sorted(glob.glob(str(tmp_path / "*.gz"))))
    rows = sorted(df.collect(), key=lambda r: r["url"])
    assert [r["url"] for r in rows] == [
        f"https://x.example.com/{i}" for i in range(3)
    ]
    assert rows[1]["text"] == "text 1 é"
    assert rows[0]["html"] is None
    assert {r["lang"] for r in rows} == {"de"}
    assert rows[0]["warc_ts"] == TS.replace(tzinfo=None) or rows[0][
        "warc_ts"
    ] == TS


def test_cli_build_from_warc(spark, tmp_path, capsys):
    """probe build --format warc: end-to-end container -> index -> search
    through the CLI."""
    import glob
    import json as _json

    from probe_spark.cli import main
    from probe_spark.fixtures import pages_df
    from probe_spark.warc import write_warc

    write_warc(
        pages_df(spark, 30).select("url", "warc_ts", "html", "lang"),
        str(tmp_path / "w"),
    )
    rc = main(
        [
            "build",
            "--pages",
            str(tmp_path / "w" / "*.warc.gz"),
            "--index",
            str(tmp_path / "ix"),
            "--buckets",
            "2",
            "--format",
            "warc",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    metrics = _json.loads(out.strip().splitlines()[-1])
    assert metrics["n_docs"] == 30
    rc = main(
        ["search", "--index", str(tmp_path / "ix"), "--query", "firewall",
         "-k", "3", "--format", "json"]
    )
    assert rc == 0
    payload = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["results"] and all("url" in h for h in payload["results"])
    # bad glob is a clean error, not a traceback
    rc = main(
        ["build", "--pages", str(tmp_path / "none" / "*.gz"),
         "--index", str(tmp_path / "ix2"), "--format", "wet"]
    )
    assert rc == 1


def test_stream_records_parity_and_truncation(tmp_path):
    """stream_records must yield exactly what parse_records yields, and
    raise the same truncation errors."""
    import io as _io

    from probe_spark.warc import stream_records

    recs = b"".join(
        build_record(f"doc://{i}", TS, f"<p>{i}</p>".encode())
        for i in range(4)
    )
    a = list(parse_records(recs))
    b = list(stream_records(_io.BytesIO(recs)))
    assert a == b
    with pytest.raises(ValueError, match="truncated"):
        list(stream_records(_io.BytesIO(recs[: len(recs) - 20])))


def test_http_chunked_and_content_encoding():
    """Real CC captures preserve raw response bytes: chunked framing and
    Content-Encoding: gzip must be decoded to the page bytes."""
    from probe_spark.warc import _http_body

    page = b"<html><body>chunky page bytes</body></html>"
    # chunked: two chunks + terminator
    c1, c2 = page[:10], page[10:]
    chunked = (
        hex(len(c1))[2:].encode() + b"\r\n" + c1 + b"\r\n"
        + hex(len(c2))[2:].encode() + b"\r\n" + c2 + b"\r\n"
        + b"0\r\n\r\n"
    )
    payload = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + chunked
    )
    assert _http_body(payload) == page
    # gzip content-encoding
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
        + gzip.compress(page)
    )
    assert _http_body(payload) == page
    # deflate (zlib-wrapped)
    import zlib

    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n"
        + zlib.compress(page)
    )
    assert _http_body(payload) == page
    # mislabeled gzip keeps raw bytes rather than raising
    payload = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnotgz"
    assert _http_body(payload) == b"notgz"


def test_build_record_rejects_header_injection_and_null_html():
    with pytest.raises(ValueError, match="CR/LF"):
        build_record("http://x\r\nWARC-Type: warcinfo", TS, b"x")
    with pytest.raises(ValueError, match="NULL"):
        build_record("http://x", TS, None)


def test_write_warc_null_policy(spark, tmp_path):
    """NULL html fails loudly (no fabricated response bytes); NULL lang
    falls back to 'und'."""
    from pyspark.sql import Row

    from probe_spark.warc import read_warc, write_warc

    schema = (
        "url string, warc_ts timestamp, html binary, lang string"
    )
    ok = spark.createDataFrame(
        [("doc://1", TS, b"<p>x</p>", None)], schema
    )
    write_warc(ok, str(tmp_path / "ok"))
    import glob

    back = read_warc(
        spark, sorted(glob.glob(str(tmp_path / "ok" / "*.warc.gz")))
    ).collect()
    assert back[0]["lang"] == "und"
    bad = spark.createDataFrame([("doc://2", TS, None, "en")], schema)
    with pytest.raises(Exception, match="NULL"):
        write_warc(bad, str(tmp_path / "bad"))


def test_cli_wet_validate_rejected(tmp_path, capsys):
    import json as _json

    from probe_spark.cli import main

    (tmp_path / "f.wet.gz").write_bytes(
        gzip.compress(_wet_record("doc://1", TS, "hello", "en"))
    )
    rc = main(
        ["build", "--pages", str(tmp_path / "*.wet.gz"), "--index",
         str(tmp_path / "ix"), "--format", "wet", "--validate-extraction"]
    )
    assert rc == 1
    assert "text-only" in _json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    )["error"]


def test_surt_urlkey():
    from probe_spark.warc import surt

    assert surt("https://www.Example.COM/Path/X") == "com,example)/path/x"
    assert surt("http://a.b.example.org/") == "org,example,b,a)/"
    assert surt("doc://00000042") == "00000042)/"


def test_surt_percent_encodes_whitespace():
    """A crawled URL with a literal space/tab would shift the space-
    delimited CDX line fields; the urlkey must percent-encode them."""
    from probe_spark.warc import surt

    key = surt("https://example.com/a b\tc")
    assert key == "com,example)/a%20b%09c"
    assert not any(c.isspace() for c in key)


def test_build_record_converts_aware_datetime_to_utc():
    """A tz-aware non-UTC timestamp must be converted, not stamped as
    wall time with a bogus 'Z'."""
    aware = dt.datetime(
        2025, 3, 1, 7, 0, 5, tzinfo=dt.timezone(dt.timedelta(hours=-5))
    )
    rec = build_record("https://a.example.com/x", aware, b"<html/>", "en")
    (headers, _content), = list(parse_records(rec))
    assert headers["warc-date"] == "2025-03-01T12:00:05Z"


def test_cdx_sidecar_digest_is_base32_sha1(spark, tmp_path):
    """CDX convention (Common Crawl / warcio): payload digest is base32
    SHA-1, so digest-dedup interoperates with genuine indexes."""
    import base64
    import hashlib

    from probe_spark.warc import read_cdx, write_warc

    html = b"<html><body>digest me</body></html>"
    df = spark.createDataFrame(
        [("https://a.example.com/x", TS, bytearray(html), None, "en")],
        "url string, warc_ts timestamp, html binary, text string,"
        " lang string",
    )
    write_warc(df, str(tmp_path / "out"), cdx=True)
    cdx_files = list((tmp_path / "out").glob("*.cdx"))
    assert cdx_files
    row, = read_cdx(spark, [str(p) for p in cdx_files]).collect()
    expect = base64.b32encode(hashlib.sha1(html).digest()).decode("ascii")
    assert row["digest"] == expect


def test_read_cdx(spark, tmp_path):
    """CDXJ lines -> typed capture table, blank lines skipped, fields
    cast (entirely JVM-side)."""
    from probe_spark.warc import read_cdx

    lines = [
        'com,example)/a 20250101120005 {"url": "https://example.com/a",'
        ' "digest": "sha1:AAA", "mime": "text/html", "status": "200",'
        ' "filename": "f.warc.gz", "offset": "123", "length": "456"}',
        "",
        'com,example)/b 20250202000000 {"url": "https://example.com/b",'
        ' "digest": "sha1:BBB", "mime": "text/html", "status": "404",'
        ' "filename": "f.warc.gz", "offset": "789", "length": "10"}',
    ]
    (tmp_path / "idx.cdx").write_text("\n".join(lines))
    rows = sorted(
        read_cdx(spark, [str(tmp_path / "idx.cdx")]).collect(),
        key=lambda r: r["urlkey"],
    )
    assert len(rows) == 2
    a, b = rows
    assert a["urlkey"] == "com,example)/a" and a["status"] == 200
    assert a["offset"] == 123 and a["length"] == 456
    assert a["warc_ts"].strftime("%Y%m%d%H%M%S") == "20250101120005"
    assert b["digest"] == "sha1:BBB" and b["status"] == 404


def test_cdx_entry_matches_oracle(spark, tmp_path):
    import duckdb
    import pandas as pd

    from probe_spark.entry_queries import (
        CDX_SNAPSHOT_SQL,
        source_cdx_snapshot_latest,
    )

    pd.DataFrame(
        {"doc_id": [0, 1, 2, 3], "text": ["a", "b", None, "c d"]}
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    got = (
        source_cdx_snapshot_latest(spark, str(tmp_path))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    want = con.sql(CDX_SNAPSHOT_SQL).df()
    for c in ("n_captures", "latest_ts_unix", "digest", "status"):
        assert list(got[c]) == list(want[c]), c
    assert list(got["n_captures"]) == [2, 1, 1, 2]  # doc 0 and 3 re-crawled


def test_selective_fetch_via_cdx_sidecar(spark, tmp_path):
    """The Common-Crawl access pattern end to end: export with a true
    offset/length sidecar index, PLAN a subset at the index layer, fetch
    ONLY those byte ranges -- and prove the ranged access by corrupting
    every byte outside the selected members (a scan would return
    garbage; the fetch must not notice)."""
    import glob

    from probe_spark.fixtures import pages_df
    from probe_spark.warc import fetch_captures, read_cdx, write_warc

    src = pages_df(spark, 60).select("url", "warc_ts", "html", "lang", "text")
    out = tmp_path / "w"
    n = write_warc(
        src.select("url", "warc_ts", "html", "lang"), str(out), cdx=True
    )
    assert n == 60
    sidecars = sorted(glob.glob(str(out / "*.cdx")))
    assert sidecars
    cdx = read_cdx(spark, sidecars)
    assert cdx.count() == 60
    # plan: fetch only urls containing 'firewall' (the index layer knows
    # urls; no WARC byte read yet)
    sel = cdx.filter(cdx.url.contains("firewall"))
    want_urls = {r["url"] for r in sel.select("url").collect()}
    assert 0 < len(want_urls) < 60
    got = fetch_captures(spark, sel, str(out)).collect()
    assert {r["url"] for r in got} == want_urls
    # full fidelity of fetched rows vs the source
    src_rows = {
        r["url"]: (r["warc_ts"], bytes(r["html"]), r["lang"], r["text"])
        for r in src.collect()
    }
    for r in got:
        assert (
            r["warc_ts"],
            bytes(r["html"]),
            r["lang"],
            r["text"],
        ) == src_rows[r["url"]]
    # corrupt every byte OUTSIDE the selected members; ranged fetch is
    # oblivious, proving it reads only the planned ranges
    keep = {
        (r["filename"], int(r["offset"]), int(r["length"]))
        for r in sel.collect()
    }
    import os

    for f in glob.glob(str(out / "*.warc.gz")):
        base = os.path.basename(f)
        spans = sorted(
            (o, o + ln) for (fn, o, ln) in keep if fn == base
        )
        data = bytearray(open(f, "rb").read())
        for i in range(len(data)):
            if not any(a <= i < b for a, b in spans):
                data[i] = 0xAA
        open(f, "wb").write(bytes(data))
    got2 = fetch_captures(spark, sel, str(out)).collect()
    assert {r["url"] for r in got2} == want_urls
    assert all(
        (r["warc_ts"], bytes(r["html"]), r["lang"], r["text"])
        == src_rows[r["url"]]
        for r in got2
    )


def test_read_cdx_utc_independent_of_session_tz(spark, tmp_path):
    """CDX timestamps are UTC by convention: the parsed instant must not
    drift with spark.sql.session.timeZone (write_warc's WARC-Date is
    already session-independent; the index must agree with it)."""
    from probe_spark.warc import read_cdx

    (tmp_path / "i.cdx").write_text(
        'com,example)/a 20250101120005 {"url": "https://example.com/a",'
        ' "digest": "d", "mime": "m", "status": "200",'
        ' "filename": "f", "offset": "0", "length": "1"}\n'
    )
    from pyspark.sql import functions as F

    def unix_ts():
        return (
            read_cdx(spark, [str(tmp_path / "i.cdx")])
            .select(F.unix_timestamp("warc_ts").alias("u"))
            .collect()[0]["u"]
        )

    assert unix_ts() == 1735732805  # 2025-01-01T12:00:05Z
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        assert unix_ts() == 1735732805  # same instant, different session
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_fetch_captures_rejects_path_escape(spark, tmp_path):
    """A foreign index row must not read outside warc_dir: filename is
    reduced to its basename, so '../secret' resolves inside warc_dir and
    simply fails to open rather than escaping it."""
    from probe_spark.fixtures import pages_df
    from probe_spark.warc import fetch_captures, read_cdx, write_warc

    out = tmp_path / "w"
    write_warc(
        pages_df(spark, 5).select("url", "warc_ts", "html", "lang"),
        str(out),
        cdx=True,
    )
    # a secret file OUTSIDE warc_dir that a traversal would reach
    secret = tmp_path / "secret.warc.gz"
    secret.write_bytes(b"\x1f\x8b")  # content irrelevant
    import glob

    from pyspark.sql import functions as F

    cdx = read_cdx(spark, sorted(glob.glob(str(out / "*.cdx"))))
    evil = cdx.limit(1).withColumn(
        "filename", F.lit("../secret.warc.gz")
    )
    with pytest.raises(Exception, match="secret.warc.gz"):
        fetch_captures(spark, evil, str(out)).collect()


def test_stream_records_bounded_memory(tmp_path):
    """The per-file streaming parse must hold ONE record, never the
    file: peak Python allocation while iterating a ~40 MiB multi-record
    stream stays within a few records' worth of memory."""
    import tracemalloc

    from probe_spark.warc import build_record, stream_records

    body = b"<html>" + b"x" * 200_000 + b"</html>"
    path = tmp_path / "big.warc"
    n = 200
    with open(path, "wb") as f:
        for i in range(n):
            f.write(build_record(f"https://a.example.com/{i}", TS, body))
    total = path.stat().st_size
    assert total > 35 * 2**20
    seen = 0
    with open(path, "rb") as f:
        tracemalloc.start()
        for _headers, content in stream_records(f):
            assert body in content
            seen += 1
        _cur, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
    assert seen == n
    # one record is ~0.2 MiB; allow a handful of records of slack, but
    # nothing near the 40 MiB file
    assert peak < 4 * 2**20, f"peak {peak/2**20:.1f} MiB"
