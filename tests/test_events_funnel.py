"""events_funnel / events_retention: hand-computed golden semantics.

Both entries are under the driver's DuckDB gate (ALL_QUERIES); these pin
the ordering rules the SQL can't make obvious at a glance -- strict
AFTER for funnel steps (ties and out-of-order events do NOT convert) and
offset-0 self-retention in the cohort triangle.
"""

from __future__ import annotations

import pandas as pd

from probe_spark.entry_queries import events_funnel, events_retention


def _write_events(tmp_path, rows):
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"], format="mixed").astype(
        "datetime64[us]"
    )
    pdf.to_parquet(tmp_path / "events.parquet", index=False)
    return str(tmp_path)


def test_funnel_strict_order(tmp_path, spark):
    sf = _write_events(
        tmp_path,
        [
            # user 1: full ordered funnel -> counts at every step
            (0, "2024-01-01 10:00", 1, "view", 0.0, "{}"),
            (1, "2024-01-01 11:00", 1, "click", 0.0, "{}"),
            (2, "2024-01-01 12:00", 1, "purchase", 0.0, "{}"),
            # user 2: click BEFORE the first view -> stops after view
            (3, "2024-01-01 09:00", 2, "click", 0.0, "{}"),
            (4, "2024-01-01 10:00", 2, "view", 0.0, "{}"),
            # user 3: click ties the view timestamp -> strict >, no convert
            (5, "2024-01-01 10:00", 3, "view", 0.0, "{}"),
            (6, "2024-01-01 10:00", 3, "click", 0.0, "{}"),
            # user 4: purchase without any view -> counts nowhere
            (7, "2024-01-01 10:00", 4, "purchase", 0.0, "{}"),
            # user 5: view, then a LATER click even though an earlier
            # click exists pre-view -> the post-view click converts
            (8, "2024-01-01 08:00", 5, "click", 0.0, "{}"),
            (9, "2024-01-01 09:00", 5, "view", 0.0, "{}"),
            (10, "2024-01-01 10:00", 5, "click", 0.0, "{}"),
        ],
    )
    got = {r["step"]: r["n_users"] for r in events_funnel(spark, sf).collect()}
    assert got == {"view": 4, "click": 2, "purchase": 1}


def test_retention_offsets(tmp_path, spark):
    sf = _write_events(
        tmp_path,
        [
            # user 1: first seen Jan 1, active again Jan 2 and Jan 9
            # (offset 8 -> outside the 0..7 triangle, dropped)
            (0, "2024-01-01", 1, "view", 0.0, "{}"),
            (1, "2024-01-02", 1, "view", 0.0, "{}"),
            (2, "2024-01-02 23:00", 1, "click", 0.0, "{}"),  # same day, distinct-once
            (3, "2024-01-09", 1, "view", 0.0, "{}"),
            # user 2: same cohort, day-0 only
            (4, "2024-01-01", 2, "view", 0.0, "{}"),
            # user 3: later cohort
            (5, "2024-01-03", 3, "view", 0.0, "{}"),
            (6, "2024-01-05", 3, "view", 0.0, "{}"),
        ],
    )
    got = {
        (r["cohort_day"], r["day_offset"]): r["n_active"]
        for r in events_retention(spark, sf).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-03", 0): 1,
        ("2024-01-03", 2): 1,
    }
