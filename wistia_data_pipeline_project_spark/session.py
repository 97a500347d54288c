"""SparkSession factory.

The reference runs a single-threaded Python process (see
``/root/reference/process_wistia_data.py:364-542``); here the session is
the engine. Config choices:

- ``spark.sql.session.timeZone=UTC``: the reference standardizes on UTC
  timestamps (ISO-8601 ``Z``); also required for DuckDB-oracle parity
  (DuckDB timestamps are UTC-naive).
- AQE on (coalesce + skew join): at 100 TB the visitor/media key space
  is skewed (a hot video dominates events); AQE splits skewed shuffle
  partitions at runtime.
- ``spark.sql.shuffle.partitions`` defaults to the local core count —
  200 is wrong in both directions (tiny local runs over-parallelize;
  cluster deployments should set ~2-3x total cores via env).
- Arrow enabled: all Pandas-UDF paths (watch-time fold, multimodal
  decode) transfer via Arrow batches, not pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "wistia-data-pipeline-project-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine session.

    In local mode the driver is the only JVM, so ``driver_memory`` is
    the sole memory knob; it must be set before the JVM starts (it is
    ignored on an already-running session).
    """
    cpus = cpus or default_parallelism()
    shuffle_partitions = shuffle_partitions or cpus
    # Partitions-scale-with-data (SCALE.md r07-r09): a fixed reducer
    # count is wrong in both directions — 32 spills at the sf10
    # decade (market-basket exp 1.18@128p -> 0.66@256p, three decades
    # of evidence), while hundreds of partitions over-schedule tiny
    # exchanges. The engine rule: START every exchange wide
    # (initialPartitionNum, default max(256, 8x cores)) and let AQE
    # coalesce DOWN per-exchange from runtime sizes — reducer width
    # then tracks the exchange's actual bytes, which is what "derive
    # partitions from input volume" means when volume is only known
    # at runtime. shuffle.partitions stays the static floor for
    # non-AQE paths.
    initial = int(
        os.environ.get(
            "SPARK_GRAFT_INITIAL_PARTITIONS",
            str(max(256, 8 * cpus, shuffle_partitions)),
        )
    )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(initial),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # TIMESTAMP(NANOS) parquet columns (driver events table) read
        # as raw nanos longs; load_table floors them to micros. Set at
        # build time so query builders never have to mutate a live
        # session's conf.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
