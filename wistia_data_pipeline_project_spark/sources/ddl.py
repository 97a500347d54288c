"""Warehouse provisioning (SURVEY §2.2 K5): idempotent database +
table creation, the Spark-catalog re-expression of the reference's
``create_bigquery_tables`` (``process_wistia_data_v2.py:88-128``,
``ingest_wistia.py:95-124``): create the dataset, then each warehouse
table from its declared schema, treating "already exists" as a benign
no-op (the reference catches ``Conflict`` per object).

Re-expression notes:
- BigQuery dataset → Spark database; BigQuery table + explicit
  SchemaField list → ``CREATE TABLE IF NOT EXISTS`` with the DDL
  rendered from ``schemas.py`` StructTypes (never inferred).
- The reference's commented-out date partitioning + clustering on the
  fact (``process_wistia_data_v2.py:107-112``) is realized for real:
  the fact table is ``PARTITIONED BY (date)`` so incremental appends
  create new partitions and date-range queries prune.
- At scale the catalog is Hive-metastore/Unity-alike; everything here
  is plain ANSI DDL through ``spark.sql`` so it works on any catalog
  implementation (tests run on the in-memory catalog).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import (
    DIM_MEDIA_SCHEMA,
    DIM_VISITOR_SCHEMA,
    FACT_MEDIA_ENGAGEMENT_SCHEMA,
)

WAREHOUSE_TABLES: dict[str, tuple[T.StructType, tuple[str, ...]]] = {
    "dim_media": (DIM_MEDIA_SCHEMA, ()),
    "dim_visitor": (DIM_VISITOR_SCHEMA, ()),
    "fact_media_engagement": (FACT_MEDIA_ENGAGEMENT_SCHEMA, ("date",)),
}


def schema_to_ddl(schema: T.StructType) -> str:
    """Column-list DDL from a declared StructType (NOT NULL modes are
    intentionally dropped: the write path enforces validity — the
    reference likewise drops REQUIRED violations at transform time,
    not at the table boundary)."""
    return ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)


def write_bucketed(
    df,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed (and optionally sorted) on its join
    key — the co-located-join primitive: two tables bucketed the same
    way join WITHOUT any exchange (and without even a sort, when
    sorted on the key), because matching buckets are read side by
    side. At 100 TB this converts the nightly fact-dim or fact-fact
    join from the dominant shuffle into a local merge per bucket.

    Bucket metadata lives in the catalog, so this writes a saved table
    (``saveAsTable``), not a bare path. Pick ``n_buckets`` ~ the
    steady-state parallelism of downstream joins; both sides must
    match on (cols, n_buckets) for the exchange to be elided.
    """
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else bucket_cols
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else sort_cols
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def provision_warehouse(
    spark: SparkSession,
    database: str = "wistia",
    location: str | None = None,
) -> dict[str, bool]:
    """Create the database and the three warehouse tables if absent.

    Returns ``{object_name: created}`` — ``False`` means it already
    existed (the reference's ``Conflict`` → info-log branch). Safe to
    call on every scheduled run; a second call is a complete no-op and
    never touches existing data.
    """
    created: dict[str, bool] = {}

    created[database] = not spark.catalog.databaseExists(database)
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS `{database}`{loc}")

    for name, (schema, partition_cols) in WAREHOUSE_TABLES.items():
        fq = f"`{database}`.`{name}`"
        created[name] = not spark.catalog.tableExists(f"{database}.{name}")
        part = (
            " PARTITIONED BY (" + ", ".join(f"`{c}`" for c in partition_cols) + ")"
            if partition_cols
            else ""
        )
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {fq} ({schema_to_ddl(schema)}) "
            f"USING PARQUET{part}"
        )
    return created


def zorder_key(c1: Column, c2: Column, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of two non-negative int columns —
    the multi-dimensional clustering key behind data-skipping layouts:
    sorting by the interleaved key co-locates rows that are close in
    BOTH dimensions, so parquet per-file min/max stats stay narrow on
    both columns and a selective filter on EITHER prunes most files
    (a lexicographic sort only prunes its leading column).

    Pure codegen bit arithmetic (2·bits shift/or terms, same unrolled
    pattern as the flat vector kernels); values are clamped into
    [0, 2^bits) so outliers cannot invert the ordering.
    """
    cap = (1 << bits) - 1
    a = F.least(F.greatest(c1.cast("long"), F.lit(0)), F.lit(cap))
    b = F.least(F.greatest(c2.cast("long"), F.lit(0)), F.lit(cap))
    # disjoint bit positions, so + is exactly bitwise OR (and stays on
    # the arithmetic fast path; Column `|` is boolean OR in PySpark)
    k = F.lit(0).cast("long")
    for i in range(bits):
        k = (
            k
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return k


def write_zordered(
    df: DataFrame,
    path: str,
    col1: str,
    col2: str,
    n_files: int = 8,
    bits: int = 16,
    method: str = "minmax",
) -> None:
    """Rewrite a table Z-ordered on two columns: range-partition by the
    Morton key (contiguous key ranges per file — the property that
    makes min/max stats tight), sort within each file, write one file
    per range.

    Both columns are normalized into the same [0, 2^bits) domain
    BEFORE interleaving: with raw values, the wider column's high bits
    dominate the key and the curve degenerates to a lexicographic sort
    on that column (measured: zero pruning on the narrow column).
    ``method="minmax"`` (default) is the one-pass choice for
    uniform-ish columns; ``method="rank"`` buckets by approx-quantile
    boundaries instead — under heavy skew (e.g. Zipfian keys) min-max
    crams most rows into a few cells and per-file ranges stay wide,
    while equal-frequency buckets keep every cell populated.

    At 100 TB this is the compaction/clustering job that turns a
    full-scan table into a data-skipping one; Spark's parquet reader
    then prunes row groups via the footer stats that this layout makes
    selective. The key is computed once per row and dropped before
    write; the min/max pre-pass is a 1-row aggregate.
    """
    out = df
    if method == "rank":
        # equal-frequency bucketing: approx-quantile boundaries per
        # column (one sketch pass), bucket id = boundary index via
        # pyspark.ml Bucketizer — a JVM binary search per row, NOT a
        # per-row filter over a boundary array literal (an interpreted
        # higher-order function: the CodegenFallback trap this repo
        # removed from the dot-product and minhash kernels).
        # The quantile pass is capped at 2^8 buckets per column: the
        # curve only needs enough cells to spread n_files file ranges
        # (256² cells >> any sane n_files), a 65k-probability
        # approx_percentile literal is ~1 MB of SQL text with
        # accuracy 4*2^16, and boundary-array size is what both the
        # sketch cost and the lookup depth scale with.
        rank_bits = min(bits, 8)
        nb = 1 << rank_bits
        probs = [i / nb for i in range(1, nb)]
        bounds = df.selectExpr(
            f"approx_percentile({col1}, array({','.join(map(str, probs))}), {4 * nb}) AS b1",
            f"approx_percentile({col2}, array({','.join(map(str, probs))}), {4 * nb}) AS b2",
        ).collect()[0]
        if bounds["b1"] is None or bounds["b2"] is None:
            df.write.mode("overwrite").parquet(path)
            return

        def _splits(bs) -> list[float]:
            # Bucketizer needs strictly increasing splits; duplicate
            # quantile boundaries (a heavy value spanning buckets)
            # collapse into one bucket — still equal-frequency-ish
            uniq = sorted({float(b) for b in bs})
            return [float("-inf"), *uniq, float("inf")]

        from pyspark.ml.feature import Bucketizer

        out = Bucketizer(
            splitsArray=[_splits(bounds["b1"]), _splits(bounds["b2"])],
            inputCols=["_v1", "_v2"],
            outputCols=["_k1", "_k2"],
            handleInvalid="keep",  # NULL/NaN keys land in one extra cell
        ).transform(
            df.withColumn("_v1", F.col(col1).cast("double")).withColumn(
                "_v2", F.col(col2).cast("double")
            )
        )
        zk = zorder_key(F.col("_k1"), F.col("_k2"), rank_bits)
    else:
        lo1, hi1, lo2, hi2 = (
            df.agg(
                F.min(col1), F.max(col1), F.min(col2), F.max(col2)
            ).collect()[0]
        )
        if lo1 is None or lo2 is None:
            # empty input (or all-NULL keys): nothing to cluster — write
            # the empty dataset instead of crashing on int(None)
            df.write.mode("overwrite").parquet(path)
            return

        def scaled(c: str, lo, hi) -> Column:
            span = max(int(hi) - int(lo), 0) + 1
            return F.floor(
                (F.col(c).cast("long") - F.lit(int(lo))) * F.lit(1 << bits) / F.lit(span)
            ).cast("long")

        zk = zorder_key(scaled(col1, lo1, hi1), scaled(col2, lo2, hi2), bits)
    (
        out.withColumn("_zk", zk)
        .repartitionByRange(n_files, "_zk")
        .sortWithinPartitions("_zk")
        .drop("_zk", "_v1", "_v2", "_k1", "_k2")
        .write.mode("overwrite")
        .parquet(path)
    )
