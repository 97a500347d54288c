"""Daily resample with gap fill + forward fill (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

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


def test_time_decay_quantized_overflow_gates_at_decimal_capacity(spark):
    """decimal(38,6) holds weights only to ~10^32 (≈105 doublings) —
    far below the double path's 900-doubling bound. A touch past the
    decimal capacity NULLs on the cast and SUM would skip it, so the
    overflow gate must fire at the decimal bound: the purchase
    reports NULL credit with decay_overflow=true instead of silently
    mis-attributing (or masquerading as organic)."""
    from wistia_data_pipeline_project_spark.operators.timeseries import (
        time_decay_attribution,
    )

    T = dt.datetime
    base = T(2024, 1, 1)
    rows = [
        # user 1: base event pins B; the in-window click sits 119
        # doublings past B (halflife 24h) -> beyond decimal(38,6)
        # capacity but well under the double path's 900
        {"event_id": 0, "user_id": 1, "ts": base, "event_type": "click"},
        {
            "event_id": 1,
            "user_id": 1,
            "ts": base + dt.timedelta(days=119),
            "event_type": "click",
        },
        {
            "event_id": 2,
            "user_id": 1,
            "ts": base + dt.timedelta(days=119, hours=1),
            "event_type": "purchase",
        },
        # user 2: same shape, 10-doubling span -> quantized path fine
        {"event_id": 3, "user_id": 2, "ts": base, "event_type": "click"},
        {
            "event_id": 4,
            "user_id": 2,
            "ts": base + dt.timedelta(days=10),
            "event_type": "click",
        },
        {
            "event_id": 5,
            "user_id": 2,
            "ts": base + dt.timedelta(days=10, hours=1),
            "event_type": "purchase",
        },
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )

    got = {
        r["event_id"]: r
        for r in time_decay_attribution(df, quantize=6).collect()
    }
    # past-capacity window: flagged, no numbers, and NOT 'organic'
    # with credit 1.0 (the silent failure this test pins)
    bad = got[2]
    assert bad["decay_overflow"] is True
    assert bad["credit"] is None and bad["weight"] is None
    # healthy window on the same run: exact single-channel credit
    ok = got[5]
    assert ok["decay_overflow"] is False
    assert ok["channel"] == "click" and ok["credit"] == 1.0

    # the double path is NOT capacity-limited at 119 doublings
    got_d = {
        r["event_id"]: r for r in time_decay_attribution(df).collect()
    }
    assert got_d[2]["decay_overflow"] is False
    assert got_d[2]["channel"] == "click" and got_d[2]["credit"] == 1.0


@pytest.mark.parametrize("days", [90, 105])
def test_time_decay_quantized_sum_overflow_headroom(spark, days):
    """The window SUM must not overflow even when every individual
    weight fits decimal(38,6). At 105 days (expo ~105 < the old
    per-row gate of ~105.3) each of three weights passed the cast at
    ~4.1e31 and their window SUM of ~1.2e32 crashed the ANSI window
    aggregate (review r04) — the 'must not raise' below pins that on
    revert. The gate now reserves 6 digits of summation headroom
    (~85 doublings), so both the 90-day band (newly flagged) and the
    105-day band (previously crashing) report decay_overflow instead
    of wrong numbers or a SparkArithmeticException."""
    from wistia_data_pipeline_project_spark.operators.timeseries import (
        time_decay_attribution,
    )

    T = dt.datetime
    base = T(2024, 1, 1)
    rows = [{"event_id": 0, "user_id": 1, "ts": base, "event_type": "view"}]
    # three clicks `days` past B, 1h apart, purchase 1h later
    for i, hrs in enumerate((0, 1, 2)):
        rows.append(
            {
                "event_id": 1 + i,
                "user_id": 1,
                "ts": base + dt.timedelta(days=days, hours=hrs),
                "event_type": "click",
            }
        )
    rows.append(
        {
            "event_id": 4,
            "user_id": 1,
            "ts": base + dt.timedelta(days=days, hours=3),
            "event_type": "purchase",
        }
    )
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    # must not raise
    out = {r["event_id"]: r for r in time_decay_attribution(df, quantize=6).collect()}
    assert out[4]["decay_overflow"] is True
    assert out[4]["credit"] is None and out[4]["weight"] is None


def test_time_decay_entry_matches_oracle_in_gated_band(spark, tmp_path):
    """The 85-105-doubling band is where the operator's quantized
    gate fires but every individual weight still fits decimal(38,6):
    the entry's DuckDB oracle must replay the gate or it computes
    real credits where Spark reports flagged NULLs (review r04).
    Micro-fixture parity: one user in the gated band, one healthy."""
    import duckdb
    import pandas as pd

    from wistia_data_pipeline_project_spark.plans import QUERIES
    from __spark_entry__ import oracle_sql
    from tools.check_oracle import compare

    T = dt.datetime
    base = T(2024, 1, 1)
    rows = []

    def ev(eid, uid, ts, typ):
        rows.append(
            {
                "event_id": eid,
                "ts": ts,
                "user_id": uid,
                "event_type": typ,
                "value": 1.0,
                "props": "{}",
            }
        )

    # user 1: span ~90 doublings -> gated on Spark, must also gate in SQL
    ev(0, 1, base, "view")
    ev(1, 1, base + dt.timedelta(days=90), "click")
    ev(2, 1, base + dt.timedelta(days=90, hours=3), "purchase")
    # user 2: healthy 3-day window with two channels
    ev(3, 2, base, "click")
    ev(4, 2, base + dt.timedelta(days=1), "view")
    ev(5, 2, base + dt.timedelta(days=2), "purchase")
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    sf_dir = str(tmp_path)
    pdf.to_parquet(f"{sf_dir}/events.parquet")

    sdf = QUERIES["events_time_decay_attribution"](spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    ddf = con.sql(oracle_sql()["events_time_decay_attribution"]).df()
    assert not compare("events_time_decay_attribution", sdf, ddf)
    # the gated purchase lands in 'organic' with a NULL (skipped)
    # credit contribution on BOTH engines
    by_ch = {r["channel"]: r for _, r in sdf.iterrows()}
    assert by_ch["organic"]["n_purchases"] == 1


def test_time_weighted_avg_micro_fixture(spark):
    """Hand-computed LOCF integral: user 1 holds 10.0 for 4s then 30.0
    for 6s → twa = (10*4 + 30*6)/10 = 22.0; user 2 has one event → NULL
    span and twa."""
    from wistia_data_pipeline_project_spark.operators.timeseries import (
        time_weighted_avg,
    )

    T = dt.datetime
    rows = [
        (1, T(2024, 1, 1, 0, 0, 0), 1, 10.0),
        (1, T(2024, 1, 1, 0, 0, 4), 2, 30.0),
        (1, T(2024, 1, 1, 0, 0, 10), 3, 99.0),  # last value holds 0s
        (2, T(2024, 1, 2), 4, 7.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    got = {r.user_id: r for r in time_weighted_avg(df).collect()}
    assert got[1].n_events == 3
    assert got[1].span_us == 10_000_000
    assert got[1].twa == pytest.approx(22.0)
    assert got[2].n_events == 1
    assert got[2].span_us is None and got[2].twa is None


def test_time_weighted_avg_null_values_locf(spark):
    """True LOCF (ADVICE r07): a NULL-valued observation anchors its
    segment but the PREVIOUS non-NULL value holds across it — user 1:
    10.0 for 4s, then a NULL row (10.0 carries for 6s), then 30.0 for
    10s → twa = (10*4 + 10*6 + 30*10)/20 = 20.0, span 20s, n_events 4.
    Leading-NULL segments (no defined value yet) are excluded from
    both the weight and the span: user 2's first 5s (NULL) drop, the
    remaining 8.0-for-3s segment gives twa 8.0 over span 3s. User 3
    is all-NULL → NULL span and twa but n_events still counts."""
    from wistia_data_pipeline_project_spark.operators.timeseries import (
        time_weighted_avg,
    )

    T = dt.datetime
    rows = [
        (1, T(2024, 1, 1, 0, 0, 0), 1, 10.0),
        (1, T(2024, 1, 1, 0, 0, 4), 2, None),
        (1, T(2024, 1, 1, 0, 0, 10), 3, 30.0),
        (1, T(2024, 1, 1, 0, 0, 20), 4, 99.0),  # holds 0s
        (2, T(2024, 1, 2, 0, 0, 0), 5, None),
        (2, T(2024, 1, 2, 0, 0, 5), 6, 8.0),
        (2, T(2024, 1, 2, 0, 0, 8), 7, 1.0),  # holds 0s
        (3, T(2024, 1, 3, 0, 0, 0), 8, None),
        (3, T(2024, 1, 3, 0, 0, 9), 9, None),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    got = {r.user_id: r for r in time_weighted_avg(df).collect()}
    assert got[1].n_events == 4
    assert got[1].span_us == 20_000_000
    assert got[1].twa == pytest.approx(20.0)
    assert got[2].span_us == 3_000_000
    assert got[2].twa == pytest.approx(8.0)
    assert got[3].n_events == 2
    assert got[3].span_us is None and got[3].twa is None


def test_time_weighted_avg_duplicate_ts_tiebreak(spark):
    """Two events at the same instant: the zero-length segment
    contributes nothing and the (ts, event_id) order pins which value
    holds the following interval — higher event_id, deterministically."""
    from wistia_data_pipeline_project_spark.operators.timeseries import (
        time_weighted_avg,
    )

    T = dt.datetime
    rows = [
        (1, T(2024, 1, 1, 0, 0, 0), 1, 100.0),
        (1, T(2024, 1, 1, 0, 0, 0), 2, 10.0),  # same ts, later id → holds
        (1, T(2024, 1, 1, 0, 0, 2), 3, 0.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    [r] = time_weighted_avg(df).collect()
    assert r.span_us == 2_000_000
    assert r.twa == pytest.approx(10.0)


def test_open_interval_backlog_micro_fixture(spark):
    """Three intervals: [d1,d3], [d2,d2], [d2,d5] → backlog by day:
    d1:1 d2:3 d3:2(first expiry lands d3) d4:1 d6:0."""
    from wistia_data_pipeline_project_spark.operators.timeseries import (
        open_interval_backlog,
    )

    D = dt.date
    rows = [
        (D(2024, 1, 1), D(2024, 1, 3)),
        (D(2024, 1, 2), D(2024, 1, 2)),
        (D(2024, 1, 2), D(2024, 1, 5)),
    ]
    df = spark.createDataFrame(rows, "open_d date, close_d date")
    got = {
        r.day.isoformat(): (r.n_opened, r.n_expired, r.open_backlog)
        for r in open_interval_backlog(df).collect()
    }
    assert got == {
        "2024-01-01": (1, 0, 1),
        "2024-01-02": (2, 0, 3),
        "2024-01-03": (0, 1, 2),
        "2024-01-04": (0, 1, 1),
        "2024-01-06": (0, 1, 0),
    }
    # the sweep-line invariant: the final backlog is zero (every
    # interval that opened also expired)
    assert list(got.values())[-1][2] == 0


def test_open_interval_backlog_null_close_means_still_open(spark):
    """An open-ended interval (NULL close) contributes +1 forever and
    never expires; a NULL open row is dropped. Without the guard the
    NULL expiry day would sort FIRST in the running-sum window and
    understate every real day (review r06)."""
    from wistia_data_pipeline_project_spark.operators.timeseries import (
        open_interval_backlog,
    )

    D = dt.date
    rows = [
        (D(2024, 1, 1), None),          # still open
        (D(2024, 1, 2), D(2024, 1, 2)),
        (None, D(2024, 1, 5)),          # unknown open: dropped
    ]
    df = spark.createDataFrame(rows, "open_d date, close_d date")
    got = {
        r.day.isoformat(): (r.n_opened, r.n_expired, r.open_backlog)
        for r in open_interval_backlog(df).collect()
    }
    assert got == {
        "2024-01-01": (1, 0, 1),
        "2024-01-02": (1, 0, 2),
        "2024-01-03": (0, 1, 1),  # the still-open interval persists
    }


def test_counter_delta_micro_fixture(spark):
    """Hand-computed counter with one reset: 10 → 25 → 5 → 12.
    Increases: anchor 0, +15, reset (+5), +7 → delta 27; invariant
    delta - (last - first) == mass restored by the reset (25)."""
    from wistia_data_pipeline_project_spark.operators.timeseries import (
        counter_delta,
    )

    T = dt.datetime
    rows = [
        (1, T(2024, 1, 1, 0), 1, 10.0),
        (1, T(2024, 1, 1, 1), 2, 25.0),
        (1, T(2024, 1, 1, 2), 3, 5.0),  # reset
        (1, T(2024, 1, 1, 3), 4, 12.0),
        (2, T(2024, 1, 1, 0), 5, 3.0),  # single sample: no increase
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    got = {
        r.user_id: (
            r.n_samples,
            r.n_resets,
            r.delta,
            r.first_reading,
            r.last_reading,
        )
        for r in counter_delta(df).collect()
    }
    assert got == {
        1: (4, 1, 27.0, 10.0, 12.0),
        2: (1, 0, 0.0, 3.0, 3.0),
    }
    # the counter sanity invariant on the resetting key
    n, k, delta, first, last = got[1]
    assert delta - (last - first) == pytest.approx(25.0)


def test_counter_delta_duplicate_ts_orders_on_event_id(spark):
    from wistia_data_pipeline_project_spark.operators.timeseries import (
        counter_delta,
    )

    T = dt.datetime
    rows = [  # same ts: event_id breaks the tie → 1 then 4 (no reset)
        (1, T(2024, 1, 1), 10, 1.0),
        (1, T(2024, 1, 1), 11, 4.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    [r] = counter_delta(df).collect()
    assert (r.n_resets, r.delta, r.first_reading, r.last_reading) == (
        0,
        3.0,
        1.0,
        4.0,
    )


def test_state_durations_micro_fixture(spark):
    """a(0s) → b(10s) → a(25s, open tail): a held 10s then re-entered
    open (no duration); b held 15s."""
    from wistia_data_pipeline_project_spark.operators.timeseries import (
        state_durations,
    )

    T = dt.datetime
    rows = [
        (1, T(2024, 1, 1, 0, 0, 0), 1, "a"),
        (1, T(2024, 1, 1, 0, 0, 10), 2, "b"),
        (1, T(2024, 1, 1, 0, 0, 25), 3, "a"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = {
        (r.user_id, r.event_type): (r.n_entries, r.held_us)
        for r in state_durations(df).collect()
    }
    assert got == {(1, "a"): (2, 10_000_000), (1, "b"): (1, 15_000_000)}
    # held time sums to the key's closed span (first → last observation)
    assert sum(h for _, h in got.values()) == 25_000_000


def test_ohlc_bars_micro_fixture(spark):
    from wistia_data_pipeline_project_spark.operators.timeseries import (
        ohlc_bars,
    )

    T = dt.datetime
    rows = [
        ("x", T(2024, 1, 1, 9), 1, 10.0),
        ("x", T(2024, 1, 1, 12), 2, 40.0),
        ("x", T(2024, 1, 1, 17), 3, 5.0),
        ("x", T(2024, 1, 2, 9), 4, 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, value double"
    ).withColumn("bar_day", F.date_trunc("DAY", F.col("ts")))
    got = {
        r.bar_day.day: (r.n_ticks, r.open, r.high, r.low, r.close)
        for r in ohlc_bars(df).collect()
    }
    assert got == {1: (3, 10.0, 40.0, 5.0, 5.0), 2: (1, 7.0, 7.0, 7.0, 7.0)}


def test_m4_downsample_bucket_bounds_and_extrema(spark):
    """Buckets stay in [0, n); per-bucket min<=first/last<=max; the
    global extremum is preserved (the M4 error-free guarantee)."""
    from wistia_data_pipeline_project_spark.operators.timeseries import (
        m4_downsample,
    )

    T = dt.datetime
    rows = [
        ("x", T(2024, 1, 1, h, m), h * 60 + m, float((h * 7 + m) % 50))
        for h in range(24)
        for m in range(0, 60, 7)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, value double"
    )
    out = m4_downsample(df, n_buckets=10).collect()
    assert all(0 <= r.bucket < 10 for r in out)
    assert sum(r.n_points for r in out) == len(rows)
    for r in out:
        assert r.min_v <= min(r.first_v, r.last_v)
        assert r.max_v >= max(r.first_v, r.last_v)
    assert max(r.max_v for r in out) == max(v for *_, v in rows)
    assert min(r.min_v for r in out) == min(v for *_, v in rows)
    # the right edge (max ts) lands in the LAST bucket, not bucket n
    assert max(r.bucket for r in out) == 9


def test_interpolate_daily_linear_blend(spark):
    """Observed 10.0 on day 1 and 40.0 on day 4 → days 2,3 blend to
    20.0, 30.0; observed days carry their own (last-of-day) value."""
    from wistia_data_pipeline_project_spark.operators.timeseries import (
        interpolate_daily,
    )

    T = dt.datetime
    rows = [
        ("u", T(2024, 1, 1, 9), 1, 9.0),
        ("u", T(2024, 1, 1, 18), 2, 10.0),  # last of day wins
        ("u", T(2024, 1, 4, 12), 3, 40.0),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, value double"
    )
    got = {
        r.day.day: (r.n_obs, r.value, r.interpolated)
        for r in interpolate_daily(df).collect()
    }
    assert got == {
        1: (2, 10.0, False),
        2: (0, 20.0, True),
        3: (0, 30.0, True),
        4: (1, 40.0, False),
    }


def test_heartbeat_uptime_union_semantics(spark):
    """Beats at 0s, 100s (overlap), 1000s (gap, island break) with
    300s tolerance: union = min(100,300) + min(900,300) + 300 = 700s,
    2 islands, span = 1000s + 300s."""
    from wistia_data_pipeline_project_spark.operators.timeseries import (
        heartbeat_uptime,
    )

    T = dt.datetime
    rows = [
        (1, T(2024, 1, 1, 0, 0, 0), 1),
        (1, T(2024, 1, 1, 0, 1, 40), 2),
        (1, T(2024, 1, 1, 0, 16, 40), 3),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long"
    )
    [r] = heartbeat_uptime(df, tolerance_us=300_000_000).collect()
    assert (r.n_beats, r.uptime_us, r.n_islands, r.span_us) == (
        3,
        700_000_000,
        2,
        1_300_000_000,
    )
    assert r.coverage == pytest.approx(700 / 1300)


def test_heartbeat_uptime_duplicate_ts_zero_length(spark):
    from wistia_data_pipeline_project_spark.operators.timeseries import (
        heartbeat_uptime,
    )

    T = dt.datetime
    rows = [(1, T(2024, 1, 1), 1), (1, T(2024, 1, 1), 2)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long"
    )
    [r] = heartbeat_uptime(df, tolerance_us=300_000_000).collect()
    # duplicate beat adds a zero-length step: union stays one tolerance
    assert (r.uptime_us, r.n_islands, r.span_us) == (
        300_000_000,
        1,
        300_000_000,
    )


def test_psi_drift_identical_distributions_near_zero(spark, sf_dir):
    """PSI of a distribution against itself is ~0 (exactly 0 up to the
    6-decimal term quantization); the entry's smoothed estimator must
    also be symmetric-ish and non-explosive on the driver corpus."""
    from wistia_data_pipeline_project_spark.plans import QUERIES

    out = {r.event_type: r.psi for r in
           QUERIES["events_psi_drift"](spark, sf_dir).collect()}
    assert out  # every type produced a row
    # every PSI term (p-q)*ln(p/q) is >= 0 (factors share sign), so
    # PSI >= 0 up to the 6-decimal term quantization
    assert all(v >= -1e-5 for v in out.values())
    # same generator both periods: inside the PSI<0.25 "no drift"
    # band even at this corpus's ~50-sample baseline noise
    assert all(v < 0.25 for v in out.values())


def test_trend_robust_known_series(spark, tmp_path):
    """Daily counts 1,2,4 on three consecutive days: pairwise slopes
    {1, 1.5, 2} -> Theil-Sen median 1.5; all pairs increasing ->
    Mann-Kendall S = 3. Verified through the catalog entry AND its
    DuckDB oracle on the same fixture."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from __spark_entry__ import oracle_sql
    from tools.check_oracle import compare
    from wistia_data_pipeline_project_spark.plans import QUERIES

    rows = []
    eid = 0
    for day, n in (("2024-01-01", 1), ("2024-01-02", 2), ("2024-01-03", 4)):
        for _ in range(n):
            rows.append((eid, f"{day}T0{eid % 8}:00:00"))
            eid += 1
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(
            [dt.datetime.fromisoformat(r[1]) for r in rows],
            pa.timestamp("us"),
        ),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array(["view"] * len(rows)),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows)),
    })
    sf_dir = str(tmp_path)
    pq.write_table(tbl, f"{sf_dir}/events.parquet")
    sdf = QUERIES["events_trend_robust"](spark, sf_dir).toPandas()
    [r] = sdf.to_dict("records")
    assert (r["n_pairs"], r["mk_s"], r["theil_sen_slope"]) == (3, 3, 1.5)
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    ddf = con.sql(oracle_sql()["events_trend_robust"]).df()
    assert not compare("events_trend_robust", sdf, ddf)


def test_holt_linear_micro_fixture(spark):
    """Hand-computed Holt fold (alpha = beta = 1/2): x = [1.0, 2.0]
    dollars -> l2 = 1.5, b2 = 0.25, forecast 1.75; a single-day user
    degenerates to level = x, trend = 0."""
    import datetime as dt

    from wistia_data_pipeline_project_spark.operators.timeseries import (
        holt_linear,
    )

    T = dt.datetime
    from decimal import Decimal as D

    rows = [
        (1, T(2024, 1, 1), D(100)),
        (1, T(2024, 1, 2), D(200)),
        (2, T(2024, 1, 5), D(500)),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, day timestamp, cents decimal(18,0)"
    )
    out = {
        r["user_id"]: r
        for r in holt_linear(df, "user_id", "day", "cents").collect()
    }
    assert out[1]["level"] == 1.5
    assert out[1]["trend"] == 0.25
    assert out[1]["forecast"] == 1.75
    assert out[1]["n_days"] == 2 and out[1]["n_used"] == 2
    assert out[2]["level"] == 5.0
    assert out[2]["trend"] == 0.0
    assert out[2]["forecast"] == 5.0
    assert out[2]["last_day"] == T(2024, 1, 5)


def test_holt_linear_truncates_to_last_24_and_clamps(spark):
    """A 30-day constant series folds only its last 24 days (constant
    input is a fixed point: level = x, trend = 0), and a daily total
    beyond +-1e9 cents clamps BY DECLARATION before folding."""
    import datetime as dt

    from wistia_data_pipeline_project_spark.operators.timeseries import (
        HOLT_CLAMP_CENTS,
        HOLT_MAX_OBS,
        holt_linear,
    )

    T = dt.datetime
    from decimal import Decimal as D

    rows = [(1, T(2024, 1, 1 + i), D(100)) for i in range(30)]
    # user 2: one day at 100x the clamp -> folds as exactly the clamp
    rows.append((2, T(2024, 1, 1), D(100 * HOLT_CLAMP_CENTS)))
    df = spark.createDataFrame(
        rows, "user_id long, day timestamp, cents decimal(18,0)"
    )
    out = {
        r["user_id"]: r
        for r in holt_linear(df, "user_id", "day", "cents").collect()
    }
    assert out[1]["n_days"] == 30
    assert out[1]["n_used"] == HOLT_MAX_OBS
    assert out[1]["level"] == 1.0 and out[1]["trend"] == 0.0
    assert out[2]["level"] == HOLT_CLAMP_CENTS / 100.0


def test_holt_linear_entry_matches_oracle_micro(spark, tmp_path):
    """Micro-fixture parity incl. the clamp branch: the entry's DuckDB
    oracle must replay the clamp, the 24-obs truncation and the
    micro-dollar HALF-UP quantization bit-for-bit."""
    import datetime as dt

    import duckdb
    import pandas as pd

    from __spark_entry__ import oracle_sql
    from tools.check_oracle import compare
    from wistia_data_pipeline_project_spark.plans import QUERIES

    T = dt.datetime
    rows = []
    eid = 0

    def ev(uid, ts, value):
        nonlocal eid
        rows.append(
            {
                "event_id": eid,
                "ts": ts,
                "user_id": uid,
                "event_type": "view",
                "value": value,
                "props": "{}",
            }
        )
        eid += 1

    # user 1: 30 days ramping (exercises truncation + negative trend
    # states), user 2: one huge day (clamp branch on BOTH engines),
    # user 3: single tiny day (degenerate), user 4: NaN-ish domain
    for i in range(30):
        ev(1, T(2024, 1, 1 + i) + dt.timedelta(hours=3), 100.0 - 3.0 * i)
    ev(2, T(2024, 2, 1), 5e8)  # 5e10 cents -> clamps at 1e9
    ev(2, T(2024, 2, 2), 1.25)
    ev(3, T(2024, 3, 1), 0.07)
    ev(4, T(2024, 3, 1), float("nan"))  # excluded in both engines
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    sf_dir = str(tmp_path)
    pdf.to_parquet(f"{sf_dir}/events.parquet")

    sdf = QUERIES["events_holt_linear"](spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    ddf = con.sql(oracle_sql()["events_holt_linear"]).df()
    assert not compare("events_holt_linear", sdf, ddf)
    by_u = {r["user_id"]: r for _, r in sdf.iterrows()}
    assert by_u[2]["n_days"] == 2
    assert 4 not in by_u  # NaN-only user excluded


def test_holt_backtest_hand_computed(spark):
    """x = [1.00, 2.00, 1.50] dollars: day-2 forecast 1.00 (err 1.00),
    day-3 forecast l2+b2 = 1.75 (err 0.25) -> mae 0.625, worst 1.00.
    Single-day users are excluded."""
    import datetime as dt
    from decimal import Decimal as D

    from wistia_data_pipeline_project_spark.operators.timeseries import (
        holt_backtest,
    )

    T = dt.datetime
    rows = [
        (1, T(2024, 1, 1), D(100)),
        (1, T(2024, 1, 2), D(200)),
        (1, T(2024, 1, 3), D(150)),
        (2, T(2024, 1, 5), D(500)),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, day timestamp, cents decimal(18,0)"
    )
    out = {
        r["user_id"]: r
        for r in holt_backtest(df, "user_id", "day", "cents").collect()
    }
    assert set(out) == {1}
    assert out[1]["n_steps"] == 2
    assert out[1]["mae"] == 0.625
    assert out[1]["worst_err"] == 1.0
