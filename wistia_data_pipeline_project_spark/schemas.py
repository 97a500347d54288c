"""Declared schemas.

The reference declares fixed BigQuery schemas and never infers
(``/root/reference/process_wistia_data_v2.py:40-84`` for the warehouse
tables; ``autodetect=False`` + live-table schema reuse at
``process_wistia_data_v2.py:567-571``). The engine keeps that
discipline: every source read passes an explicit StructType; schema
inference never runs in the hot path (at 100 TB an inference pass is a
full extra scan).

Shapes observed in ``/root/reference/raw_data/`` (934 events, 96 media
records) — see SURVEY.md §1.3 and FIXTURES.md.
"""

from __future__ import annotations

from pyspark.sql import types as T


def nullable_copy(schema: T.StructType) -> T.StructType:
    """All-nullable variant of a schema: raw feeds may violate the
    declared REQUIRED modes (the reference drops such rows at transform
    time, process_wistia_data_v2.py:374 — so the ingest schema must
    admit them)."""
    return T.StructType(
        [T.StructField(f.name, f.dataType, True, f.metadata) for f in schema.fields]
    )

# ---------------------------------------------------------------------------
# Raw Wistia shapes (source of truth: raw_data/events_*.json /
# all_media_metadata_*.json; field-by-field provenance in SURVEY.md §1.3)
# ---------------------------------------------------------------------------

USER_AGENT_STRUCT = T.StructType(
    [
        T.StructField("browser", T.StringType()),
        T.StructField("browser_version", T.StringType()),
        T.StructField("platform", T.StringType()),
        T.StructField("mobile", T.BooleanType()),
    ]
)

THUMBNAIL_STRUCT = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("fileSize", T.LongType()),
        T.StructField("contentType", T.StringType()),
        T.StructField("type", T.StringType()),
    ]
)

ASSET_STRUCT = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("fileSize", T.LongType()),
        T.StructField("contentType", T.StringType()),
        T.StructField("type", T.StringType()),
    ]
)

PROJECT_STRUCT = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("hashed_id", T.StringType()),
    ]
)

# One row per viewing-session event (raw_data/events_*.json, JSON arrays).
# ``percent_viewed`` is a 0..1 FRACTION in the observed data (SURVEY §2.6 Q2).
# ``name`` (event type) is ABSENT from all observed samples (SURVEY §2.6 Q1)
# but branched on by the reference — kept nullable.
WISTIA_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("received_at", T.TimestampType(), False),
        T.StructField("event_key", T.StringType(), False),
        T.StructField("ip", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("region", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("org", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("percent_viewed", T.DoubleType(), False),
        T.StructField("embed_url", T.StringType()),
        T.StructField("conversion_type", T.StringType()),
        T.StructField("conversion_data", T.MapType(T.StringType(), T.StringType())),
        T.StructField("iframe_heatmap_url", T.StringType()),
        T.StructField("visitor_key", T.StringType(), False),
        T.StructField("user_agent_details", USER_AGENT_STRUCT),
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_name", T.StringType()),
        T.StructField("media_url", T.StringType()),
        T.StructField("thumbnail", THUMBNAIL_STRUCT),
        T.StructField("name", T.StringType()),
    ]
)

# One row per video (raw_data/all_media_metadata_*.json).
WISTIA_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("archived", T.BooleanType()),
        T.StructField("created", T.TimestampType()),
        T.StructField("updated", T.TimestampType()),
        T.StructField("duration", T.DoubleType()),
        T.StructField("hashed_id", T.StringType(), False),
        T.StructField("description", T.StringType()),
        T.StructField("progress", T.DoubleType()),
        T.StructField("status", T.StringType()),
        T.StructField("section", T.StringType()),
        T.StructField("thumbnail", THUMBNAIL_STRUCT),
        T.StructField("project", PROJECT_STRUCT),
        T.StructField("assets", T.ArrayType(ASSET_STRUCT)),
    ]
)

# ---------------------------------------------------------------------------
# Warehouse (star schema) shapes — mirror of the reference's BigQuery DDL
# (process_wistia_data_v2.py:40-84) with BIGNUMERIC resolved per SURVEY §1.2:
# JSON-float sourced columns stay DOUBLE.
# ---------------------------------------------------------------------------

DIM_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("wistia_id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("updated_at", T.TimestampType()),
        T.StructField("duration", T.DoubleType()),
        T.StructField("description", T.StringType()),
        T.StructField("project_id", T.LongType()),
        T.StructField("project_name", T.StringType()),
        T.StructField("channel", T.StringType()),
        T.StructField("ingestion_timestamp", T.TimestampType()),
    ]
)

DIM_VISITOR_SCHEMA = T.StructType(
    [
        T.StructField("visitor_id", T.StringType(), False),
        T.StructField("first_seen_at", T.TimestampType()),
        T.StructField("ip", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("browser", T.StringType()),
        T.StructField("platform", T.StringType()),
        T.StructField("mobile", T.BooleanType()),
        T.StructField("ingestion_timestamp", T.TimestampType()),
    ]
)

FACT_MEDIA_ENGAGEMENT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("visitor_id", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("play_count", T.LongType()),
        T.StructField("total_watch_time", T.DoubleType()),
        T.StructField("max_percent_viewed", T.DoubleType()),
        T.StructField("play_rate", T.DoubleType()),
        T.StructField("event_timestamp", T.TimestampType()),
        # engine addition over the reference DDL: the HWM reads the
        # group's LAST event ts (read_high_water_mark docstring) — the
        # reference's first-event HWM re-ingests tail events
        T.StructField("last_event_timestamp", T.TimestampType()),
        T.StructField("ip", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("ingestion_timestamp", T.TimestampType()),
    ]
)

# ---------------------------------------------------------------------------
# Driver-generated synthetic tables (/root/testdata/sf*/; TESTDATA.md).
# Declared so scans never infer and column pruning is explicit.
# ---------------------------------------------------------------------------

DRIVER_TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}
