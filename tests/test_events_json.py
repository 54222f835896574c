"""events_json_extract: typed from_json parse + per-type rollup.

The entry is under the driver's DuckDB gate (ALL_QUERIES); these pin
hand-computed expectations plus the lenient-parse semantics (malformed /
missing-key rows contribute NULL, aggregates skip them) that the Spark
side must keep when crawl metadata is dirty."""

from __future__ import annotations

import pandas as pd

from probe_spark.entry_queries import events_json_extract


def _write_events(tmp_path, rows):
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf.to_parquet(tmp_path / "events.parquet", index=False)
    return str(tmp_path)


def test_json_extract_hand_computed(tmp_path, spark):
    sf = _write_events(
        tmp_path,
        [
            (0, "2024-01-01", 1, "view", 0.0, '{"k": 10}'),
            (1, "2024-01-01", 1, "view", 0.0, '{"k": 32}'),
            (2, "2024-01-01", 2, "click", 0.0, '{"k": 7}'),
        ],
    )
    got = {
        r["event_type"]: r.asDict()
        for r in events_json_extract(spark, sf).collect()
    }
    assert got["view"] == {
        "event_type": "view", "n": 2, "sum_k": 42, "min_k": 10, "max_k": 32,
    }
    assert got["click"]["sum_k"] == 7 and got["click"]["n"] == 1


def test_json_extract_tolerates_dirty_rows(tmp_path, spark):
    # malformed JSON and missing keys parse to NULL; count counts the
    # ROW, the k-aggregates skip it -- crawl metadata is never clean
    sf = _write_events(
        tmp_path,
        [
            (0, "2024-01-01", 1, "view", 0.0, '{"k": 5}'),
            (1, "2024-01-01", 1, "view", 0.0, "not json at all"),
            (2, "2024-01-01", 1, "view", 0.0, '{"other": 1}'),
        ],
    )
    row = events_json_extract(spark, sf).collect()[0]
    assert row["n"] == 3
    assert row["sum_k"] == 5
    assert row["min_k"] == 5 and row["max_k"] == 5
