"""Streaming volume-anomaly monitor vs its batch twin: the tumbling
windows that CLOSE during the run must report exactly the batch
per-day counts and z-scores against the same static baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from wistia_data_pipeline_project_spark.sources.io import load_table
from wistia_data_pipeline_project_spark.streaming.pipeline import (
    run_stream_to_memory,
    streaming_volume_anomaly,
    volume_baseline,
)

def test_streaming_volume_anomaly_matches_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = str(tmp_path / "events_src")
    events.write.parquet(src)
    schema = events.schema

    baseline = volume_baseline(events)
    assert baseline.filter(F.col("std_daily") <= 0).count() == 0

    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_volume_anomaly(
        stream, baseline, window="1 day", watermark="1 hour", z_threshold=2.0
    )
    q = run_stream_to_memory(out, "vol_anomaly", output_mode="append")
    try:
        got = {
            (r["window_start"], r["event_type"]): r
            for r in spark.table("vol_anomaly").collect()
        }
    finally:
        q.stop()

    # batch recomputation against the same baseline
    daily = events.filter(F.col("ts").isNotNull()).groupBy(
        F.date_trunc("day", "ts").alias("window_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    expected = {
        (r["window_start"], r["event_type"]): r
        for r in daily.join(baseline, "event_type").collect()
    }

    # append mode: only windows the watermark closed emit — all but
    # the stream's last open day(s)
    n_types = events.select("event_type").distinct().count()
    assert len(got) >= len(expected) - 2 * n_types  # ≤2 trailing days open
    assert set(got) <= set(expected)
    for key, r in got.items():
        e = expected[key]
        assert r["n_events"] == e["n_events"], key
        z = (e["n_events"] - e["mean_daily"]) / e["std_daily"]
        assert abs(r["zscore"] - z) < 1e-12, key
        assert r["is_anomaly"] == (abs(z) > 2.0), key


def test_streaming_anomaly_flags_planted_spike(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    baseline = volume_baseline(events)

    # plant a 10x spike on one mid-stream day, then a quiet final day
    # so the watermark closes the spike window
    spike_day = "2024-01-15"
    spike = (
        events.filter(
            (F.date_trunc("day", "ts") == F.lit(spike_day).cast("timestamp"))
            & (F.col("event_type") == "error")
        )
        .crossJoin(spark.range(9).select(F.col("id").alias("_r")))
        .drop("_r")
    )
    src = str(tmp_path / "events_spiked")
    events.unionByName(spike).write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = streaming_volume_anomaly(
        stream, baseline, window="1 day", watermark="1 hour", z_threshold=3.0
    )
    q = run_stream_to_memory(out, "vol_spike", output_mode="append")
    try:
        rows = spark.table("vol_spike").collect()
    finally:
        q.stop()
    flagged = {
        (r["window_start"].strftime("%Y-%m-%d"), r["event_type"])
        for r in rows
        if r["is_anomaly"]
    }
    assert (spike_day, "error") in flagged


def test_streaming_anomaly_flags_unknown_event_type(spark, sf_dir, tmp_path):
    """An event type absent from the baseline is the bad-feed case —
    it must page (baseline_missing), not be coalesced to quiet."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    baseline = volume_baseline(events)
    renamed = events.withColumn(
        "event_type",
        F.when(F.col("event_type") == "click", "clicks").otherwise(
            F.col("event_type")
        ),
    )
    src = str(tmp_path / "events_renamed")
    renamed.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = streaming_volume_anomaly(stream, baseline, watermark="1 hour")
    q = run_stream_to_memory(out, "vol_unknown", output_mode="append")
    try:
        rows = spark.table("vol_unknown").collect()
    finally:
        q.stop()
    unknown = [r for r in rows if r["event_type"] == "clicks"]
    assert unknown  # at least one closed window for the renamed feed
    for r in unknown:
        assert r["baseline_missing"] is True
        assert r["is_anomaly"] is True
        assert r["zscore"] is None


def test_streaming_anomaly_scales_baseline_to_window(spark, tmp_path):
    """A non-day window must z-score against the baseline SCALED to
    the window length (mean x f, std x sqrt(f)), and a known type
    with a degenerate (NULL-std) baseline must surface its own flag
    instead of reading quietly not-anomalous (ADVICE r03)."""
    import datetime as dt

    baseline = spark.createDataFrame(
        [("click", 5, 48.0, 4.0), ("error", 5, 10.0, None)],
        "event_type string, n_days long, mean_daily double, std_daily double",
    )
    T = dt.datetime
    rows = []
    eid = 0
    # 40 clicks + 3 errors inside the 00:00-12:00 window of 2024-01-10
    for m in range(40):
        rows.append((eid, T(2024, 1, 10, 1, m), 1, "click", 1.0)); eid += 1
    for m in range(3):
        rows.append((eid, T(2024, 1, 10, 2, m), 1, "error", 1.0)); eid += 1
    # late sentinel advances the watermark past the window end
    rows.append((eid, T(2024, 1, 12, 0, 0), 1, "click", 1.0))
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    src = str(tmp_path / "events_halfday")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = streaming_volume_anomaly(
        stream, baseline, window="12 hours", watermark="1 hour", z_threshold=3.0
    )
    q = run_stream_to_memory(out, "vol_halfday", output_mode="append")
    try:
        got = {
            (r["window_start"], r["event_type"]): r
            for r in spark.table("vol_halfday").collect()
        }
    finally:
        q.stop()
    w0 = T(2024, 1, 10, 0, 0)
    click = got[(w0, "click")]
    # f = 0.5: mean 48*0.5 = 24, std 4*sqrt(0.5); z = (40-24)/2.8284...
    z = (40 - 24.0) / (4.0 * 0.5**0.5)
    assert abs(click["zscore"] - z) < 1e-12
    assert click["is_anomaly"] is True
    assert click["baseline_degenerate"] is False
    err = got[(w0, "error")]
    assert err["zscore"] is None
    assert err["baseline_missing"] is False
    assert err["baseline_degenerate"] is True
    assert err["is_anomaly"] is False


def test_streaming_anomaly_rejects_unsizable_window(spark):
    import pytest as _pytest

    from wistia_data_pipeline_project_spark.streaming.pipeline import (
        _window_seconds,
    )

    assert _window_seconds("1 day") == 86400.0
    assert _window_seconds("12 hours") == 43200.0
    assert _window_seconds("30 minutes") == 1800.0
    for bad in ("1 fortnight", "day", "0 hours", "-1 days", "x hours"):
        with _pytest.raises(ValueError):
            _window_seconds(bad)
