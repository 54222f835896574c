"""WARC 1.0 source/sink -- the container Common-Crawl-style corpora
actually arrive in (ISO 28500 / WARC-1.0, a public spec; format summary
below).  The engine's ingest tables are (url, warc_ts, html, text, lang);
this module turns .warc / .warc.gz files into that shape and back:

    read_warc(spark, paths)  -> DataFrame(url, warc_ts, html, text, lang)
    write_warc(df, out_dir)  -> one .warc.gz per partition, rows written

Record grammar (spec §4): a version line ``WARC/1.0\r\n``, header lines
``Name: value\r\n``, a blank ``\r\n``, exactly Content-Length bytes of
content block, then ``\r\n\r\n``.  Response records wrap a full HTTP
response (status line + headers + body); the page bytes are the body
after the FIRST blank line of the HTTP block.  Common Crawl convention:
every record is its own gzip member, so a .warc.gz is a concatenation of
members -- Python's gzip transparently decompresses the concatenation.
Language rides the public ``WARC-Identified-Content-Language`` header
(Common Crawl carries it since 2018); absent, lang is ``und``.

Scale shape: parallelism is per WARC FILE (the cc-pyspark pattern) --
each task streams one file from shared storage and yields Arrow batches
of parsed pages, so nothing buffers more than one file per task and a
100 TB crawl is as parallel as its file count (~64k files/crawl).  The
parser is a pure function over bytes, unit-tested against hand-built
golden records.
"""

from __future__ import annotations

import datetime as dt
import gzip
import io
import uuid
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

_CRLF = b"\r\n"


def build_record(
    url: str, ts: dt.datetime, html: bytes, lang: str = "und"
) -> bytes:
    """One WARC/1.0 response record wrapping a minimal HTTP/1.1 200
    response around ``html``.  Deterministic except WARC-Record-ID (a
    fresh UUID, as the spec requires per record)."""
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        + b"Content-Length: "
        + str(len(html)).encode()
        + _CRLF
        + _CRLF
        + html
    )
    headers = [
        b"WARC/1.0",
        b"WARC-Type: response",
        b"WARC-Record-ID: <urn:uuid:" + str(uuid.uuid4()).encode() + b">",
        b"WARC-Target-URI: " + url.encode(),
        b"WARC-Date: " + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode(),
        b"WARC-Identified-Content-Language: " + lang.encode(),
        b"Content-Type: application/http; msgtype=response",
        b"Content-Length: " + str(len(http)).encode(),
    ]
    return _CRLF.join(headers) + _CRLF + _CRLF + http + _CRLF + _CRLF


def parse_records(buf: bytes) -> Iterator[tuple[dict, bytes]]:
    """(headers, content) for each record in an uncompressed WARC buffer.
    Header names are case-folded.  Raises ValueError on a structurally
    truncated record (mid-record EOF) -- a short-read upstream should be
    surfaced, not silently dropped."""
    pos = 0
    n = len(buf)
    while pos < n:
        # tolerate extra blank separators between records
        while pos < n and buf[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        head_end = buf.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError("WARC: truncated header block")
        lines = buf[pos:head_end].split(_CRLF)
        if not lines[0].startswith(b"WARC/"):
            raise ValueError(
                f"WARC: bad version line {lines[0][:40]!r} at {pos}"
            )
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, _sep, v = ln.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = (
                v.strip().decode("utf-8", "replace")
            )
        clen = int(headers.get("content-length", "0"))
        body_start = head_end + 4
        if body_start + clen > n:
            raise ValueError("WARC: truncated content block")
        yield headers, buf[body_start : body_start + clen]
        pos = body_start + clen


def _http_body(payload: bytes) -> bytes:
    """Page bytes of an application/http response payload: everything
    after the FIRST blank line (HTTP headers are CRLF-delimited; a
    headerless payload is returned whole)."""
    i = payload.find(_CRLF + _CRLF)
    return payload if i < 0 else payload[i + 4 :]


def response_rows(
    buf: bytes,
) -> Iterator[tuple[str, dt.datetime, bytes, str]]:
    """(url, warc_ts, html, lang) for each WARC-Type: response record;
    request/metadata/warcinfo records are skipped (spec-valid files
    interleave them).  lang = first code of
    WARC-Identified-Content-Language, else 'und'."""
    for headers, content in parse_records(buf):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        raw_ts = headers.get("warc-date", "1970-01-01T00:00:00Z")
        ts = dt.datetime.strptime(
            raw_ts[:19], "%Y-%m-%dT%H:%M:%S"
        ).replace(tzinfo=dt.timezone.utc)
        lang = headers.get(
            "warc-identified-content-language", "und"
        ).split(",")[0].strip() or "und"
        yield url, ts, _http_body(content), lang


def conversion_rows(
    buf: bytes,
) -> Iterator[tuple[str, dt.datetime, str, str]]:
    """(url, warc_ts, text, lang) for each WARC-Type: conversion record
    -- the WET layout (Common Crawl's extracted-text sidecar files):
    payload is the page's plain text directly, no HTTP wrapper."""
    for headers, content in parse_records(buf):
        if headers.get("warc-type") != "conversion":
            continue
        url = headers.get("warc-target-uri", "")
        raw_ts = headers.get("warc-date", "1970-01-01T00:00:00Z")
        ts = dt.datetime.strptime(
            raw_ts[:19], "%Y-%m-%dT%H:%M:%S"
        ).replace(tzinfo=dt.timezone.utc)
        lang = headers.get(
            "warc-identified-content-language", "und"
        ).split(",")[0].strip() or "und"
        yield url, ts, content.decode("utf-8", "replace"), lang


def read_wet(spark: SparkSession, paths: list[str]) -> DataFrame:
    """WET (extracted-text) files -> the pages shape with html = NULL and
    text straight from the conversion records.  Same per-file streaming
    parallelism as read_warc; the right source when the pipeline starts
    from Common Crawl's own text extraction instead of raw html."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            for path in pdf["path"]:
                rows = list(conversion_rows(_read_file(path)))
                if not rows:
                    continue
                yield pd.DataFrame(
                    {
                        "url": [r[0] for r in rows],
                        "warc_ts": [r[1] for r in rows],
                        "html": [None for _ in rows],
                        "text": [r[2] for r in rows],
                        "lang": [r[3] for r in rows],
                    }
                )

    pdf = spark.createDataFrame([(p,) for p in paths], "path string")
    return pdf.repartition(max(1, len(paths))).mapInPandas(
        gen, PAGES_SCHEMA
    )


def _read_file(path: str) -> bytes:
    with open(path, "rb") as f:
        raw = f.read()
    if path.endswith(".gz") or raw[:2] == b"\x1f\x8b":
        # concatenated gzip members (one per record, the CC convention)
        # decompress transparently
        raw = gzip.decompress(raw)
    return raw


def read_warc(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Parse WARC files into the engine's pages shape.  One task per
    file: each task streams its file from shared storage and emits Arrow
    batches, so memory is bounded by one decompressed file per task and
    a crawl's parallelism is its file count.  text = the deterministic
    extract_text(html) invariant (same UDF the indexer applies)."""
    import pandas as pd

    from probe_spark.extract import extract_text

    def gen(batches):
        for pdf in batches:
            for path in pdf["path"]:
                rows = list(response_rows(_read_file(path)))
                if not rows:
                    continue
                yield pd.DataFrame(
                    {
                        "url": [r[0] for r in rows],
                        "warc_ts": [r[1] for r in rows],
                        "html": [r[2] for r in rows],
                        "text": [extract_text(r[2]) for r in rows],
                        "lang": [r[3] for r in rows],
                    }
                )

    pdf = spark.createDataFrame([(p,) for p in paths], "path string")
    return pdf.repartition(max(1, len(paths))).mapInPandas(
        gen, PAGES_SCHEMA
    )


def write_warc(df: DataFrame, out_dir: str) -> int:
    """Export (url, warc_ts, html[, lang]) rows as one .warc.gz per
    partition under ``out_dir`` (each record its own gzip member, the CC
    layout).  ``out_dir`` must be a path every executor can write
    (shared filesystem); file names are partition-unique so concurrent
    tasks never collide.  Returns rows written.  Plain side-effect files
    (no Spark commit protocol): rerun into a fresh directory rather than
    resuming a half-failed export."""
    import os

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    cols = df.columns

    def dump(batches):
        n = 0
        out = None
        fname = None
        for pdf in batches:
            if out is None:
                fname = os.path.join(
                    out_dir, f"part-{uuid.uuid4().hex}.warc.gz"
                )
                out = open(fname, "wb")
            for r in pdf.itertuples(index=False):
                d = dict(zip(cols, r))
                ts = d["warc_ts"]
                if not isinstance(ts, dt.datetime):
                    ts = pd.Timestamp(ts).to_pydatetime()
                rec = build_record(
                    d["url"], ts, bytes(d["html"]), d.get("lang", "und")
                )
                # one gzip member per record (CC convention)
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                    gz.write(rec)
                out.write(buf.getvalue())
                n += 1
        if out is not None:
            out.close()
        yield pd.DataFrame({"n": [n]})

    parts = df.mapInPandas(dump, "n long").collect()
    return int(sum(r["n"] for r in parts))
