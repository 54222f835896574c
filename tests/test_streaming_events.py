"""Streaming operators over the events table: watermarked windowed aggs
(append mode, event time) and gap sessionization via applyInPandasWithState
-- each verified against batch recomputation of the same semantics."""

import pytest


@pytest.fixture(scope="module")
def event_files(spark, tmp_path_factory):
    """The sf0.001 events table split into 4 time-ordered stream files."""
    from pyspark.sql import functions as F

    d = tmp_path_factory.mktemp("events_stream")
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .orderBy("ts")
        .withColumn("rn", F.monotonically_increasing_id())
    )
    rows = ev.count()
    step = rows // 4 + 1
    pdf = ev.drop("rn").toPandas().sort_values("ts").reset_index(drop=True)
    import time as _t

    for i in range(4):
        chunk = pdf.iloc[i * step : (i + 1) * step]
        if len(chunk):
            spark.createDataFrame(chunk).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(d / f"f{i:02d}"))
            _t.sleep(1.1)  # distinct mtimes => deterministic file order
    return str(d)


def test_windowed_counts_stream_matches_batch(spark, tmp_path, event_files):
    """Append-mode watermarked windows: every emitted row must equal the
    batch computation of the same window, and all windows safely behind
    the final watermark must have been emitted."""
    from pyspark.sql import functions as F

    from probe_spark.streaming.events import (
        read_events_stream,
        windowed_event_counts,
    )

    stream = read_events_stream(spark, f"{event_files}/f*", max_files=1)
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("winagg")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["w_start"], r["event_type"]): (r["n"], r["value_sum"])
        for r in spark.sql("SELECT * FROM winagg").collect()
    }
    batch_events = spark.read.parquet(f"{event_files}/f*")
    exp_rows = windowed_event_counts(batch_events).collect()
    exp = {
        (r["w_start"], r["event_type"]): (r["n"], r["value_sum"])
        for r in exp_rows
    }
    assert got, "stream emitted nothing"
    # everything emitted is exactly the batch value
    for key, (n, s) in got.items():
        assert key in exp, key
        assert n == exp[key][0], key
        assert s == pytest.approx(exp[key][1], rel=1e-9), key
    # completeness behind the watermark: windows ending before the
    # watermark at the LAST trigger (max ts of first 3 files - 10 min)
    import datetime

    pdf3 = spark.read.parquet(*[f"{event_files}/f{i:02d}" for i in range(3)])
    wm = pdf3.agg(F.max("ts")).collect()[0][0] - datetime.timedelta(minutes=10)
    due = {k for k, _ in exp.items() if True}
    due = {
        (r["w_start"], r["event_type"])
        for r in exp_rows
        if r["w_end"] <= wm
    }
    missing = due - set(got)
    assert not missing, f"windows behind the watermark not emitted: {missing}"


def test_sessionize_stream_matches_batch_oracle(spark, tmp_path, event_files):
    """applyInPandasWithState gap sessions: the latest update per
    (user, session_start) must equal the batch window-function oracle."""
    from probe_spark.streaming.events import (
        read_events_stream,
        sessionize_batch,
        sessionize_stream,
    )

    gap = 7200  # 2h of silence ends a session
    stream = read_events_stream(spark, f"{event_files}/f*", max_files=1)
    q = (
        sessionize_stream(stream, gap_seconds=gap)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    updates = spark.sql("SELECT * FROM sessions").collect()
    assert updates
    # last update per (user, session_start) wins (largest n_events)
    final: dict = {}
    for r in updates:
        key = (r["user_id"], r["session_start"])
        if key not in final or r["n_events"] > final[key]["n_events"]:
            final[key] = r

    batch_events = spark.read.parquet(f"{event_files}/f*")
    exp = {
        (r["user_id"], r["session_start"]): r
        for r in sessionize_batch(spark, batch_events, gap_seconds=gap).collect()
    }
    assert len(exp) > batch_events.select("user_id").distinct().count(), (
        "gap too large: no user produced multiple sessions; weak test"
    )
    assert set(final) == set(exp)
    for key, r in final.items():
        e = exp[key]
        assert r["session_end"] == e["session_end"], key
        assert r["n_events"] == e["n_events"], key
        assert r["value_sum"] == pytest.approx(e["value_sum"], rel=1e-9), key


def test_sessionize_batch_microsecond_gap(spark):
    """Batch and stream must use the SAME gap precision: two events
    7200.5s apart split under a 7200s gap (a seconds truncation would
    floor the delta to exactly 7200 and keep them together)."""
    import datetime

    from probe_spark.streaming.events import sessionize_batch

    base = datetime.datetime(2025, 1, 1, 0, 0, 0)
    rows = [
        (1, base, 1.0),
        (1, base + datetime.timedelta(seconds=7200, microseconds=500_000), 2.0),
        # exactly at the gap: NOT split (strict > comparison, both hosts)
        (2, base, 1.0),
        (2, base + datetime.timedelta(seconds=7200), 2.0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = sessionize_batch(spark, ev, gap_seconds=7200).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 2, "7200.5s delta must split the session"
    assert len(by_user[2]) == 1, "exactly-7200s delta must not split"


def test_dedup_stream_replays_match_batch_distinct(spark, tmp_path):
    """At-least-once ingest: three stream files where file B replays the
    back half of A and file C replays rows from B.  The deduped stream
    must equal batch dropDuplicates on the key, with every replayed
    event_id emitted exactly once (watermark spans the fixture so no row
    is late-dropped; at production horizons the state store stays
    bounded by eviction)."""
    import time as _t

    from probe_spark.streaming.events import (
        dedup_events_stream,
        read_events_stream,
    )

    d = tmp_path / "replay_stream"
    d.mkdir()
    pdf = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
        .head(300)
    )
    chunks = [
        pdf.iloc[0:100],
        pdf.iloc[50:200],   # rows 50-99 replayed
        pdf.iloc[150:300],  # rows 150-199 replayed
    ]
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(d / f"f{i:02d}"))
        _t.sleep(1.1)  # distinct mtimes => deterministic file order

    stream = read_events_stream(spark, f"{d}/f*", max_files=1)
    q = (
        dedup_events_stream(stream, watermark="45 days")
        .writeStream.format("memory")
        .queryName("dedupstream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = sorted(
        (r["event_id"], r["ts"], r["user_id"], r["event_type"], r["value"])
        for r in spark.sql("SELECT * FROM dedupstream").collect()
    )
    exp = sorted(
        (r["event_id"], r["ts"], r["user_id"], r["event_type"], r["value"])
        for r in spark.read.parquet(f"{d}/f*")
        .dropDuplicates(["event_id"])
        .collect()
    )
    assert len(got) == 300  # 400 delivered rows -> 300 unique events
    assert got == exp
