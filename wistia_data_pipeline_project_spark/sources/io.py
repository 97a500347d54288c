"""File sources (S3/S5 in SURVEY.md §2.1) and the driver-table loader.

Reference behaviors re-expressed:

- JSON-array staging files (``/root/reference/ingest_wistia.py:330-337``
  writes ``json.dump`` arrays; read back whole-file at
  ``process_wistia_data_v2.py:170-186``) → ``spark.read.json`` with
  ``multiLine=True`` and a declared schema.
- Latest-run discovery (``process_wistia_data_v2.py:192-237`` regexes
  ``_(\\d{8}_\\d{6})\\.json$`` out of filenames and keeps the max) →
  ``input_file_name()`` + ``regexp_extract`` + a top-1 window, executed
  on the file listing, not the data.

Scale notes (100 TB): parquet scans here rely on Catalyst pushing
filters/projections into the scan (verified via ``explain`` in
tests/bench). Driver tables are read with declared schemas so the
vectorized parquet reader never pays an inference pass.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import DRIVER_TABLE_SCHEMAS, WISTIA_EVENT_SCHEMA, WISTIA_MEDIA_SCHEMA

from ..functions.scalars import RUN_TS_FILE_RE as RUN_TS_RE  # one copy of the rule


def spread(df: DataFrame) -> DataFrame:
    """Restore scan parallelism for under-partitioned inputs.

    The driver's test parquet files are single-row-group, so Spark's
    byte-range splitting yields ONE task and the entire pipeline runs
    on one core regardless of ``local[N]`` (measured: the sf0.1
    catalog is ~2-4× slower end-to-end without this). A real 100 TB
    table arrives as thousands of splits, in which case this is a
    no-op — the repartition fires only when the scan produced fewer
    partitions than the cluster has cores, i.e. exactly the regime
    where one extra small shuffle buys N-way parallelism for every
    downstream operator.

    Applied only to tables whose operators are CPU-dense per row
    (documents/embeddings: hashing, shingling, vector math — measured
    2-6× wins). Shuffle-bound relational queries are NOT spread: AQE
    already right-sizes their exchanges, and pre-shuffling small scans
    just adds task overhead (measured 2-3× slower on the sf0.1 joins).
    """
    sc = df.sparkSession.sparkContext
    if _scan_partitions(df) < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


_SCAN_PARTS: dict[tuple[str, str], int] = {}


def _scan_partitions(df: DataFrame, cache_key: str | None = None) -> int:
    """Partition count of a scan, cached per (session, source path) —
    the DataFrame→RDD conversion behind getNumPartitions costs ~130 ms
    per call, which multiplies across the bench; split counts depend
    on the file layout AND session confs, so the cache is scoped to
    the application (a second session with different cores must not
    reuse stale counts), and frames with no input files are never
    cached (they'd all share one key)."""
    files = cache_key or ",".join(df.inputFiles())
    if not files:
        return df.rdd.getNumPartitions()
    key = (df.sparkSession.sparkContext.applicationId, files)
    if key not in _SCAN_PARTS:
        _SCAN_PARTS[key] = df.rdd.getNumPartitions()
    return _SCAN_PARTS[key]


def _events_ts_is_nanos(path: str) -> bool:
    """True when ``events.ts`` is physically TIMESTAMP(NANOS) in the
    parquet footer. The driver has generated both variants across
    rounds (nanos in round 1, micros later), so the reader branches on
    the footer instead of assuming either. Footer-only read: no data
    pages are touched. Cached by (path, mtime, size) so a regenerated
    file with the other unit invalidates the verdict instead of being
    read 1000x off; pyarrow is a baked dependency of this environment,
    so the defensive except only covers unreadable paths (directory
    datasets etc.) — those fall through to Spark's own reader error."""
    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        key = (path, 0, 0)
    if key not in _TS_UNIT:
        try:
            import pyarrow.parquet as pq

            unit = getattr(pq.read_schema(path).field("ts").type, "unit", None)
            _TS_UNIT[key] = unit == "ns"
        except Exception:
            _TS_UNIT[key] = False
    return _TS_UNIT[key]


_TS_UNIT: dict[tuple[str, int, int], bool] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated parquet table with its declared schema.

    ``events.ts`` has been physically TIMESTAMP(NANOS) in some driver
    generations, which Spark's vectorized reader rejects; that variant
    is read as raw nanos (``spark.sql.legacy.parquet.nanosAsLong``)
    and floored to a microsecond TimestampType with integer arithmetic
    (``div`` — a double division would lose precision at 1e18 nanos).
    Micros-generation files read natively.
    """
    from ..session import autoscale_exchange_width

    # Exchange width tracks the corpus size the moment it is known
    # (clamp(dir_bytes/4MiB, cores, 2048)); see session.py docstring.
    autoscale_exchange_width(spark, sf_dir)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events" and _events_ts_is_nanos(path):
        # session-level legacy conf (no per-read option exists for it);
        # get_spark() sets it at build time — this set covers vanilla
        # sessions (the driver's) and is a no-op on engine sessions.
        # Caveat: on a session shared with non-engine workloads this
        # changes how THEIR nanos-parquet scans read.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = T.StructType(
            [
                f if f.name != "ts" else T.StructField("ts", T.LongType())
                for f in DRIVER_TABLE_SCHEMAS["events"].fields
            ]
        )
        df = spark.read.schema(schema).parquet(path)
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    schema = DRIVER_TABLE_SCHEMAS.get(name)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(path)
    if name in ("documents", "embeddings"):
        df = spread(df)
    return df


def read_wistia_events_json(spark: SparkSession, path: str) -> DataFrame:
    """Raw viewing events: JSON *array* files → multiLine read, fixed schema."""
    return spark.read.schema(WISTIA_EVENT_SCHEMA).json(path, multiLine=True)


def read_wistia_media_json(spark: SparkSession, path: str) -> DataFrame:
    """Raw media catalog: JSON array files → multiLine read, fixed schema."""
    return spark.read.schema(WISTIA_MEDIA_SCHEMA).json(path, multiLine=True)


def read_events_jsonl_audited(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Line-delimited event read with corrupt-record auditing: returns
    ``(good, corrupt, raw)`` where corrupt rows carry the raw line in
    ``_corrupt_record`` instead of being silently nulled out (the
    default PERMISSIVE behavior loses the evidence; the reference logs
    and skips bad records — ``process_wistia_data.py:345-356``).

    Scale: one scan serves both frames (the reader tags rows at parse
    time; no second pass). Quarantine the ``corrupt`` side to a
    dead-letter sink and alert on its count. ``raw`` is the CACHED
    parsed frame backing both sides — call ``raw.unpersist()`` once
    both are consumed, or the cache outlives the read.
    """
    from ..schemas import nullable_copy

    schema = T.StructType(
        nullable_copy(WISTIA_EVENT_SCHEMA).fields
        + [T.StructField("_corrupt_record", T.StringType())]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    # Spark disallows plans that reference ONLY the corrupt column on a
    # raw read (QUERY_ONLY_CORRUPT_RECORD_COLUMN); caching the parsed
    # frame is the documented pattern — one scan serves both sides.
    df = df.cache()
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    corrupt = df.filter(F.col("_corrupt_record").isNotNull()).select(
        "_corrupt_record"
    )
    return good, corrupt, df


def latest_run_ts(filenames: list[str]) -> str | None:
    """Max run-timestamp across staged filenames (S5, top-1 over metadata)."""
    stamps = [m.group(1) for f in filenames if (m := re.search(RUN_TS_RE, f))]
    return max(stamps) if stamps else None


def latest_run_files(directory: str, prefix: str) -> list[str]:
    """Select the files belonging to the most recent run.

    Mirrors ``process_wistia_data_v2.py:192-237``: extract the run
    timestamp from each filename, keep files carrying the max stamp.
    Pure file-listing metadata operation — no data scan.
    """
    names = [f for f in os.listdir(directory) if f.startswith(prefix)]
    ts = latest_run_ts(names)
    if ts is None:
        return []
    # match on the EXTRACTED stamp, not substring containment — a stray
    # file merely containing the stamp (backup copies etc.) must not
    # join the run
    return sorted(
        os.path.join(directory, f)
        for f in names
        if (m := re.search(RUN_TS_RE, f)) and m.group(1) == ts
    )


def with_run_ts_column(df: DataFrame) -> DataFrame:
    """Attach the run timestamp parsed from each row's source file (F6)."""
    return df.withColumn(
        "run_ts", F.regexp_extract(F.input_file_name(), RUN_TS_RE, 1)
    )


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """Schema-enforced CSV read with corrupt-record auditing — the
    delimited-text twin of ``read_events_jsonl_audited`` (same
    PERMISSIVE + ``_corrupt_record`` dead-letter contract): returns
    ``(good, corrupt)``. No inference pass; the declared schema is the
    contract, exactly like the parquet/JSON readers.
    """
    from ..schemas import nullable_copy

    full = T.StructType(
        nullable_copy(schema).fields + [T.StructField("_corrupt_record", T.StringType())]
    )
    df = (
        spark.read.schema(full)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    ).cache()
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    corrupt = df.filter(F.col("_corrupt_record").isNotNull())
    return good, corrupt


def build_date_dim(spark: SparkSession, start: str, end: str) -> DataFrame:
    """Calendar dimension [start, end] — the standard warehouse date
    spine (the reference derives dates per-row and has no calendar
    table). One row per day with the usual attributes; generated
    entirely JVM-side from a sequence, no driver loop.

    Scale: |days| rows — decades fit in one partition; broadcast it.
    """
    return (
        spark.sql(
            f"SELECT explode(sequence(DATE'{start}', DATE'{end}')) AS date"
        )
        .select(
            "date",
            F.year("date").cast("int").alias("year"),
            F.quarter("date").cast("int").alias("quarter"),
            F.month("date").cast("int").alias("month"),
            F.dayofmonth("date").cast("int").alias("day_of_month"),
            F.dayofweek("date").cast("int").alias("day_of_week"),
            F.weekofyear("date").cast("int").alias("iso_week"),
            F.date_format("date", "yyyy-MM").alias("year_month"),
            F.dayofweek("date").isin(1, 7).alias("is_weekend"),
            F.last_day("date").alias("month_end"),
        )
    )
