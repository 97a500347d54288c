"""Daily resample with gap fill + forward fill (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

from wistia_data_pipeline_project_spark.operators.timeseries import (
    resample_daily_ffill,
)


def test_gapfill_and_forward_fill(spark):
    T = dt.datetime
    rows = [
        # user 1: events on day 1 and day 4 → grid must add days 2,3
        (1, T(2024, 1, 1, 9), 100, 10.0),
        (1, T(2024, 1, 1, 17), 101, 20.0),  # day-closing value
        (1, T(2024, 1, 4, 8), 102, 30.0),
        # user 2: a single day → one row, no gaps
        (2, T(2024, 1, 2, 12), 200, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    got = {
        (r.user_id, r.day.day): (r.n_events, r.value_ffill)
        for r in resample_daily_ffill(df).collect()
    }
    assert got == {
        (1, 1): (2, 20.0),  # closing value of the 2-event day
        (1, 2): (0, 20.0),  # gap day, carried forward
        (1, 3): (0, 20.0),
        (1, 4): (1, 30.0),
        (2, 2): (1, 5.0),
    }


def test_day_closing_value_breaks_ties_on_event_id(spark):
    T = dt.datetime
    rows = [
        (1, T(2024, 1, 1, 9), 7, 1.0),
        (1, T(2024, 1, 1, 9), 8, 2.0),  # same ts: higher event_id wins
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    [r] = resample_daily_ffill(df).collect()
    assert (r.n_events, r.value_ffill) == (2, 2.0)


def test_last_touch_attribution_pre_epoch_timestamps(spark):
    """Pre-1970 timestamps pack to NEGATIVE bigints; the decode must
    floor-divide (pmod), not truncate toward zero, or both the touch
    time and the channel code come out wrong (ADVICE r03)."""
    from wistia_data_pipeline_project_spark.operators.timeseries import (
        last_touch_attribution,
    )

    T = dt.datetime
    rows = [
        # user 1: click 6h before the purchase -> 'click', lag 6h
        {"event_id": 0, "user_id": 1, "ts": T(1969, 12, 31, 12), "event_type": "click"},
        {"event_id": 1, "user_id": 1, "ts": T(1969, 12, 31, 18), "event_type": "purchase"},
        # user 2: view 11 days before -> outside 7-day lookback -> organic
        {"event_id": 2, "user_id": 2, "ts": T(1969, 12, 20), "event_type": "view"},
        {"event_id": 3, "user_id": 2, "ts": T(1969, 12, 31), "event_type": "purchase"},
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        r["event_id"]: (r["channel"], r["lag_us"])
        for r in last_touch_attribution(df).collect()
    }
    assert got == {1: ("click", 6 * 3600 * 1_000_000), 3: ("organic", None)}
