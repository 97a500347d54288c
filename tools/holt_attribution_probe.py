"""Attribution probe for events_holt_backtest's sixth-decade exponent
(VERDICT r10 next-round 8): split the entry's wall-clock into its two
physical stages at each scale —

  prep  = daily pre-agg + clamp + observed-day windows + key shuffle
          (``_holt_prepared(with_meta=False)`` materialized via count)
  fold  = the partition-scan mapInPandas pass (full entry minus prep,
          measured as full - prep on the same warm session)

and, inside the fold, separate the per-key emission volume from the
backtest's per-STEP work by timing the FIT fold (``holt_linear`` —
one big-int halfup per key at the end) against the BACKTEST fold
(one big-int halfup per step: ~365 divisions of a number whose bit
length grows 2 bits/day). Since the r10 refactor there is NO
fold→next-day join anywhere in the backtest — the candidate the
verdict asked to rule out — so whatever the fold side shows IS the
attribution.

Usage: python tools/holt_attribution_probe.py [sf_dir ...]
(defaults /tmp/sf10 /tmp/sf100; reps via SPARK_GRAFT_REHEARSAL_REPS,
default 2, min-of-reps — bench.py's estimator under spiky host noise.)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    dirs = sys.argv[1:] or ["/tmp/sf10", "/tmp/sf100"]
    reps = max(1, int(os.environ.get("SPARK_GRAFT_REHEARSAL_REPS", "2")))

    from wistia_data_pipeline_project_spark.operators import (
        timeseries as TS,
    )
    from wistia_data_pipeline_project_spark.session import get_spark
    from wistia_data_pipeline_project_spark.sources.io import load_table

    spark = get_spark(app_name="holt-attribution-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def prepared_input(sf_dir: str):
        e = load_table(spark, sf_dir, "events").filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("value").isNotNull()
            & ~F.isnan(F.col("value"))
            & (F.abs(F.col("value")) < F.lit(1e9))
        )
        cents = F.col("value").cast("decimal(12,2)") * 100
        return e.select(
            "user_id",
            F.date_trunc("DAY", F.col("ts")).alias("day"),
            cents.cast("decimal(18,0)").alias("cents"),
        )

    def best(fn) -> tuple[float, int]:
        ts, n = [], 0
        for _ in range(reps):
            t0 = time.monotonic()
            n = fn()
            ts.append(time.monotonic() - t0)
        return min(ts), n

    print(f"{'sf_dir':<14} {'stage':<10} {'sec':>8} {'rows':>10}")
    for d in dirs:
        src = prepared_input(d)
        prep = TS._holt_prepared(
            src, "user_id", "day", "cents", TS.HOLT_MAX_OBS, with_meta=False
        )
        t_prep, n_prep = best(prep.count)
        t_fit, n_fit = best(
            lambda: TS.holt_linear(
                src, key_col="user_id", day_col="day", cents_col="cents"
            ).count()
        )
        t_back, n_back = best(
            lambda: TS.holt_backtest(
                src, key_col="user_id", day_col="day", cents_col="cents"
            ).count()
        )
        for stage, sec, rows in (
            ("prep", t_prep, n_prep),
            ("fit_full", t_fit, n_fit),
            ("back_full", t_back, n_back),
            ("fit_fold", t_fit - t_prep, n_fit),
            ("back_fold", t_back - t_prep, n_back),
        ):
            print(f"{os.path.basename(d):<14} {stage:<10} {sec:>8.2f} {rows:>10}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
