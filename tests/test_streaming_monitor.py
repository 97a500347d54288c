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
