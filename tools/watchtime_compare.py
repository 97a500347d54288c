"""Fifth-decade plan-of-record measurement (VERDICT r07 item 6): the
watch-time fold's three formulations timed side-by-side on the same
Wistia-shaped derivation of the driver events table —

- ``fact_media_engagement`` (fact.py window-lag formulation: one
  window exchange + hash aggregate, pure codegen, no Python),
- ``fact_media_engagement_fold`` (grouped-map ``applyInPandas``: one
  group exchange into Arrow batches, Python fold per group),
- ``fact_media_engagement_fold_scan`` (``mapInPandas`` partition
  scan with cross-batch carry — the catalog entry's path).

All three are pinned equivalent by pytest (dual-impl cross-checks);
this tool records which one is the 100-TB plan of record by MEASURED
cost as the corpus decades up.

Usage: python tools/watchtime_compare.py [sf_dir ...]
Env: SPARK_GRAFT_REHEARSAL_PARTITIONS / _MEM / _REPS as in
scale_rehearsal.py.
"""

from __future__ import annotations

import datetime as dt
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def wistia_shaped(spark, sf_dir):
    """The events_stateful_watch_time derivation (kept in lockstep
    with plans/catalog_windows.py — regenerate together)."""
    from pyspark.sql import functions as F

    from wistia_data_pipeline_project_spark.sources.io import load_table

    et = F.col("event_type")
    return (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("user_id").isNotNull()
            & (F.col("user_id") >= 0)
            & F.col("ts").isNotNull()
            & F.col("event_id").isNotNull()
            & (F.col("value").isNull() | ~F.isnan(F.col("value")))
        )
        .select(
            F.concat(F.lit("m"), (F.col("user_id") % 7).cast("string")).alias(
                "media_id"
            ),
            F.concat(F.lit("v"), F.col("user_id").cast("string")).alias(
                "visitor_key"
            ),
            F.col("ts").alias("received_at"),
            F.concat(F.lit("e"), F.col("event_id").cast("string")).alias(
                "event_key"
            ),
            ((F.col("value") % 100) / F.lit(100.0)).alias("percent_viewed"),
            F.when(et == "click", "play")
            .when(et == "view", "percent")
            .when(et == "purchase", "pause")
            .when(et == "signup", "seek")
            .otherwise("end")
            .alias("name"),
            F.lit(None).cast("string").alias("ip"),
            F.lit(None).cast("string").alias("country"),
        )
    )


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from wistia_data_pipeline_project_spark.operators.fact import (
        fact_media_engagement,
        fact_media_engagement_fold,
        fact_media_engagement_fold_scan,
    )

    dirs = sys.argv[1:] or ["/tmp/sf10", "/tmp/sf30"]
    spark = (
        SparkSession.builder.master("local[32]")
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_REHEARSAL_PARTITIONS", "128"),
        )
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_REHEARSAL_MEM", "16g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_REHEARSAL_REPS", "1")))
    run_ts = dt.datetime(2024, 2, 1, tzinfo=dt.timezone.utc)
    impls = {
        "window-lag": fact_media_engagement,
        "grouped-map fold": fact_media_engagement_fold,
        "partition-scan fold": fact_media_engagement_fold_scan,
    }
    # WT_IMPLS=window-lag,partition-scan fold  -> subset (the
    # grouped-map formulation is the known per-group-overhead loser;
    # at sf30's ~9M visitor-day groups it is minutes of pure Arrow
    # slicing — skip it once its curve is established)
    chosen = os.environ.get("WT_IMPLS")
    if chosen:
        keep = {c.strip() for c in chosen.split(",")}
        impls = {k: v for k, v in impls.items() if k in keep}
    print(f"{'impl':22} " + " ".join(f"{d:>14}" for d in dirs) + "   rows")
    for label, fn in impls.items():
        cells, rows = [], None
        for d in dirs:
            dim = spark.range(7).select(
                F.concat(F.lit("m"), F.col("id").cast("string")).alias(
                    "media_id"
                ),
                (F.lit(120.0) + F.lit(60.0) * F.col("id")).alias("duration"),
            )
            w = wistia_shaped(spark, d)
            times = []
            for _ in range(reps):
                t0 = time.monotonic()
                rows = fn(w, dim, run_ts).count()
                times.append(time.monotonic() - t0)
            cells.append(statistics.median(times))
        print(
            f"{label:22} "
            + " ".join(f"{c:14.1f}" for c in cells)
            + f"   {rows}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
