"""Named scalar-function API tests (F1-F12): each helper against
known values on one small DataFrame round-trip."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from wistia_data_pipeline_project_spark import functions as FX


def test_scalar_functions_known_values(spark):
    df = spark.range(1).select(
        F.lit("2025-05-12T11:45:19Z").alias("iso"),
        F.lit("2025-05-12T11:45:19+00:00").alias("iso_offset"),
        F.lit("  tok-123  ").alias("token"),
        F.lit("My Facebook Promo").alias("title_fb"),
        F.lit("Launch YT short").alias("title_yt"),
        F.lit("Plain Demo").alias("title_none"),
        F.lit(3.14159).alias("val"),
        F.lit(250.0).alias("watch"),
        F.lit(120.0).alias("dur"),
        F.lit(None).cast("double").alias("maybe"),
        F.lit('{"k": 7}').alias("js"),
    )
    row = df.select(
        FX.parse_iso_ts("iso").alias("ts"),
        FX.parse_iso_ts("iso_offset").alias("ts2"),
        FX.ts_to_date(FX.parse_iso_ts("iso")).alias("d"),
        FX.iso_format(FX.parse_iso_ts("iso")).alias("iso_out"),
        FX.hwm_buffer(FX.parse_iso_ts("iso")).alias("ts_plus1"),
        FX.channel_of("title_fb").alias("ch_fb"),
        FX.channel_of("title_yt").alias("ch_yt"),
        FX.channel_of("title_none").alias("ch_none"),
        FX.clean_token("token").alias("tok"),
        FX.round2("val").alias("r2"),
        FX.clamp_to("watch", "dur").alias("clamped"),
        FX.null_default("maybe", 0.0).alias("dflt"),
        FX.from_json_str("js", "k int").alias("parsed"),
        FX.run_id_col(FX.parse_iso_ts("iso")).alias("rid"),
    ).collect()[0]

    assert row["ts"] == dt.datetime(2025, 5, 12, 11, 45, 19)
    assert row["ts2"] == row["ts"]
    assert str(row["d"]) == "2025-05-12"
    assert row["iso_out"] == "2025-05-12T11:45:19Z"
    assert row["ts_plus1"] == dt.datetime(2025, 5, 12, 11, 45, 20)
    assert row["ch_fb"] == "Facebook"
    assert row["ch_yt"] == "YouTube"
    assert row["ch_none"] is None
    assert row["tok"] == "tok-123"
    assert row["r2"] == 3.14
    assert row["clamped"] == 120.0
    assert row["dflt"] == 0.0
    assert row["parsed"]["k"] == 7
    assert row["rid"] == "20250512_114519"
    assert FX.run_id(dt.datetime(2025, 5, 12, 11, 45, 19)) == "20250512_114519"


def test_to_json_roundtrip(spark):
    df = spark.range(1).select(
        F.struct(F.lit(1).alias("a"), F.lit("x").alias("b")).alias("s")
    )
    row = df.select(
        FX.from_json_str(FX.to_json_str("s"), "a int, b string").alias("back")
    ).collect()[0]
    assert row["back"]["a"] == 1 and row["back"]["b"] == "x"
