"""End-to-end pipeline rehearsal at volume (VERDICT r09 next-round 7).

The catalog measures QUERIES; this measures the OPERATIONAL loop —
``run_incremental_pipeline`` (rollback → HWM probe → increment filter
→ dedup → dim transforms/merge → atomic manifest-committed fact
append → run-scoped expectation contract), the production shape of
the reference's scheduled run (``process_wistia_data.py:364-542``) —
at an sf1-scale synthetic Wistia corpus (default 1M events, 10x the
bench corpus).

Events are generated SPARK-SIDE (deterministic column expressions
over ``spark.range`` — no driver-side row list at any scale) in the
full ``WISTIA_EVENT_SCHEMA`` shape, split into two increments by
``received_at`` so the second run exercises the HWM cut + visitor
merge at volume. Prints one JSON line per run: wall seconds, rows
appended, dim sizes, contract verdict.

Usage: python tools/pipeline_rehearsal.py [n_events] [out_dir]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = dt.datetime(2025, 5, 1, tzinfo=dt.timezone.utc)
SPAN_DAYS = 20
N_MEDIA = 200


def synth_events(spark, n: int):
    """Deterministic Wistia-shaped events, generated distributed.

    Visitor count scales with n (one visitor per ~40 events), media
    fixed at N_MEDIA; percent_viewed walks an arithmetic pattern so
    per-(media, visitor) folds see increasing/decreasing/flat paths;
    ~2% of rows are exact event_key redeliveries (dedup surface) and
    ~1% carry a NULL-ish pct=0 'play' (conditional-count quirk).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from wistia_data_pipeline_project_spark.schemas import WISTIA_EVENT_SCHEMA

    n_visitors = max(25, n // 40)
    base_us = int(BASE.timestamp() * 1_000_000)
    span_us = SPAN_DAYS * 86_400_000_000
    i = F.col("id")
    # redelivered keys: rows where id % 50 == 1 reuse the previous
    # id's key (same payload timestamp arithmetic -> near-duplicate)
    key_id = F.when(i % 50 == 1, i - 1).otherwise(i)
    cols = {
        "received_at": F.timestamp_micros(
            base_us + (i * 7_919_777_123) % span_us
        ),
        "event_key": F.format_string("ev%012d", key_id),
        "percent_viewed": ((i * 13) % 101).cast("double"),
        "visitor_key": F.format_string("vis%09d", i % n_visitors),
        "media_id": F.format_string("hash%04d", (i * 31) % N_MEDIA),
        "name": F.when(i % 11 == 0, F.lit("play")).otherwise(
            F.lit(None).cast("string")
        ),
        "country": F.when(i % 3 == 0, F.lit("US")).otherwise(F.lit("DE")),
        "ip": F.format_string(
            "10.0.%d.%d",
            (i % 250).cast("int"),
            ((i / 250).cast("long") % 250).cast("int"),
        ),
    }
    e = spark.range(n)
    fields = []
    for f in WISTIA_EVENT_SCHEMA.fields:
        if f.name in cols:
            fields.append(cols[f.name].alias(f.name))
        else:
            fields.append(F.lit(None).cast(f.dataType).alias(f.name))
    return e.select(*fields)


def synth_media(spark, run_ts):
    from wistia_data_pipeline_project_spark.schemas import (
        WISTIA_MEDIA_SCHEMA,
        nullable_copy,
    )

    rows = []
    for k in range(N_MEDIA):
        rows.append(
            {
                "id": 1000 + k,
                "name": ["Launch Video FB", "Tutorial Youtube", "Plain Demo"][k % 3]
                + f" {k}",
                "type": "Video",
                "archived": False,
                "created": BASE - dt.timedelta(days=30 + k),
                "updated": BASE - dt.timedelta(days=k % 9),
                "duration": None if k == N_MEDIA - 1 else 30.0 + (k * 7) % 570,
                "hashed_id": f"hash{k:04d}",
                "description": None,
                "project": {"id": 1, "name": "proj"},
                "thumbnail": None,
            }
        )
    return spark.createDataFrame(rows, nullable_copy(WISTIA_MEDIA_SCHEMA))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pipeline_sf1"
    from wistia_data_pipeline_project_spark.operators.incremental import (
        run_incremental_pipeline,
    )
    from wistia_data_pipeline_project_spark.session import get_spark

    spark = get_spark(app_name="pipeline-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)

    cut = BASE + dt.timedelta(days=SPAN_DAYS // 2)
    events = synth_events(spark, n)
    media = synth_media(spark, BASE)
    from pyspark.sql import functions as F

    for run_no, (pred, run_ts) in enumerate(
        [
            (events.filter(F.col("received_at") < F.lit(cut)), cut),
            (events, cut + dt.timedelta(days=SPAN_DAYS)),
        ],
        start=1,
    ):
        t0 = time.monotonic()
        counts = run_incremental_pipeline(spark, pred, media, out_dir, run_ts)
        wall = time.monotonic() - t0
        print(
            json.dumps(
                {
                    "run": run_no,
                    "wall_sec": round(wall, 1),
                    **counts,
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
