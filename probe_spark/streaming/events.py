"""Structured Streaming over the events table: watermarked windowed
aggregation and a custom stateful operator (gap sessionization via
applyInPandasWithState).

The reference is batch-only (SURVEY.md SS2.12); these are the streaming
operators a training-data pipeline needs on top of it.  Both run over a
file-source stream (the sandbox analog of Kafka; on a cluster swap
``readStream.parquet(dir)`` for the real source) and are verified against
batch recomputation of the same semantics in tests/test_streaming.py.

  * windowed_event_counts: event-time tumbling windows with a watermark --
    late events beyond the watermark are dropped by Spark's state store,
    on-time events aggregate exactly once (append mode emits a window only
    after the watermark passes its end).
  * sessionize_stream: per-user gap-based sessions (a session ends after
    ``gap`` of event-time silence).  Spark has no built-in gap session
    windows with custom payloads, so this is applyInPandasWithState: state
    = (session start, last ts, count, value sum); update mode emits the
    running session on every batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(
    spark: SparkSession, events_dir: str, max_files: int = 8
) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(events_dir)
    )


def windowed_event_counts(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Event-time tumbling-window counts/sums per event_type with a
    watermark for late data.  Works on both a stream (append mode: a
    window finalizes once the watermark passes) and a batch frame (same
    expression, watermark is a no-op) -- the test compares the two."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def dedup_events_stream(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Ingest-replay dedup: at-least-once sources (Kafka replays, retried
    crawl fetches, speculative upstream tasks) deliver the same record
    more than once; drop duplicates on the record key WITHIN the
    watermark horizon via ``dropDuplicatesWithinWatermark`` so the
    dedup state store is bounded by the horizon (keys evict once the
    watermark passes their event time + delay) instead of growing with
    the corpus -- plain ``dropDuplicates`` on a stream never evicts.
    Corpus-at-rest exact dedup stays dedup_exact / dedup_incremental;
    this operator is the exactly-once ingestion front of the same
    pipeline.  The batch recomputation of the same semantics (for the
    verification test) is ``dropDuplicates(["event_id"])`` -- replayed
    records are byte-identical, so any survivor equals the batch row."""
    return events.withWatermark(
        "ts", watermark
    ).dropDuplicatesWithinWatermark(["event_id"])


SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("status", StringType()),
    ]
)

SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("vsum", DoubleType()),
    ]
)


def _session_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        rows = []
        if state.exists:
            start_us, last_us, n, vsum = state.get
        else:
            start_us = last_us = -1
            n, vsum = 0, 0.0
        # a large per-user group can arrive as several chunks that are each
        # sorted but not sorted ACROSS chunks; concatenate and sort once so
        # out-of-order chunks can't corrupt session boundaries
        chunks = [pdf for pdf in pdfs]
        if chunks:
            pdf = pd.concat(chunks).sort_values("ts")
            for ts, v in zip(pdf["ts"], pdf["value"]):
                ts_us = int(ts.value // 1000)  # pandas ns -> us
                if start_us < 0:
                    start_us, last_us = ts_us, ts_us
                    n, vsum = 1, float(v)
                elif ts_us - last_us > gap_us:
                    rows.append((start_us, last_us, n, vsum, "closed"))
                    start_us, last_us = ts_us, ts_us
                    n, vsum = 1, float(v)
                else:
                    last_us = max(last_us, ts_us)
                    n += 1
                    vsum += float(v)
        if start_us >= 0:
            state.update((start_us, last_us, n, vsum))
            rows.append((start_us, last_us, n, vsum, "open"))
        out = pd.DataFrame(
            rows, columns=["start_us", "last_us", "n", "vsum", "status"]
        )
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "session_start": pd.to_datetime(out["start_us"], unit="us"),
                "session_end": pd.to_datetime(out["last_us"], unit="us"),
                "n_events": out["n"],
                "value_sum": out["vsum"],
                "status": out["status"],
            }
        )

    return fn


def sessionize_stream(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Gap-based per-user sessions as a custom stateful streaming operator
    (applyInPandasWithState).  Emits every affected session per batch:
    'closed' when a gap ended it, 'open' for the running one (update
    output mode; the final state of each user's last session stays open
    -- on a continuous stream a ProcessingTimeTimeout would flush it)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_seconds),
        SESSION_OUTPUT,
        SESSION_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def sessionize_batch(
    spark: SparkSession, events: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """Batch oracle for sessionize_stream's final sessions: classic
    gap-split via lag() + running session ids (window functions)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    # compare MICROSECOND deltas, same precision as sessionize_stream's
    # state math -- a seconds truncation here would keep two events 7200.7s
    # apart in one session while the stream splits them.  (NTZ timestamps
    # go through a timestamp cast first: identity under the UTC session tz.)
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    epoch_lag = F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    gap_us = int(gap_seconds) * 1_000_000
    gapped = events.withColumn(
        "new_sess",
        (
            F.coalesce(epoch - epoch_lag, F.lit(None)) > gap_us
        ).cast("int"),
    ).withColumn(
        "sess_id", F.sum(F.coalesce("new_sess", F.lit(0))).over(w)
    )
    return gapped.groupBy("user_id", "sess_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("value_sum"),
    )
