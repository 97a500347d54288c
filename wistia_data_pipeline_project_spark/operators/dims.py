"""Dimension transforms (SURVEY §2.3 P1-P6, §2.5 A6).

Spark re-expression of the reference's dim builders:
- ``transform_media_data`` ← /root/reference/process_wistia_data_v2.py:244-311
  (select/rename 12 columns, nested project.* extraction, channel
  inference from title substrings, ingestion timestamp stamp)
- ``transform_visitor_data`` ← /root/reference/process_wistia_data_v2.py:314-344
  (unique visitors, first-occurrence-wins). The reference's "first"
  is file-iteration order; here it is deterministic:
  (received_at, event_key) ascending — SURVEY §7 hard-part 2.

Every column is a native expression; the ingestion timestamp is a
run-level literal (P6): ``current_timestamp()`` per-row would make
re-runs non-reproducible and break the DuckDB oracle.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def infer_channel(title: F.Column) -> F.Column:
    """Channel from title substrings (process_wistia_data_v2.py:274-278):
    Facebook/FB → 'Facebook'; Youtube/YT → 'YouTube'; else NULL.
    Thin alias over the named scalar API (one copy of the rule)."""
    from ..functions.scalars import channel_of

    return channel_of(title)


def transform_media_data(media: DataFrame, run_ts: dt.datetime) -> DataFrame:
    """media catalog → dim_media: projection + rename + nested struct
    extraction + derived channel + audit stamp."""
    return media.select(
        F.col("hashed_id").alias("media_id"),
        F.col("id").alias("wistia_id"),
        F.col("name").alias("title"),
        F.col("type").alias("media_type"),
        F.col("created").alias("created_at"),
        F.col("updated").alias("updated_at"),
        F.col("duration").cast("double").alias("duration"),
        F.col("description"),
        F.col("project.id").alias("project_id"),
        F.col("project.name").alias("project_name"),
        infer_channel(F.col("name")).alias("channel"),
        F.lit(run_ts).cast("timestamp").alias("ingestion_timestamp"),
    )


def filter_media_by_ids(media: DataFrame, hashed_ids: list[str]) -> DataFrame:
    """IN-list media filter (P3; process_wistia_data.py:149-161). For a
    literal list Catalyst folds `isin` into the parquet scan; a dynamic
    list would become a broadcast left-semi join."""
    if not hashed_ids:
        return media
    return media.filter(F.col("hashed_id").isin(hashed_ids))


def transform_media_stats(media: DataFrame, run_ts: dt.datetime) -> DataFrame:
    """v0 ``media_stats`` warehouse shape
    (cloud-run-job/media_stats_schema.json:1-110): the raw nested
    media record persisted nested — the thumbnail/project structs and
    the repeated ``assets`` array survive into the sink unchanged
    (parquet stores them natively; BigQuery did the same with RECORD/
    REPEATED) — plus per-row asset summaries and the audit stamp.

    Scale: pure narrow projection; the per-row asset fold runs over
    arrays of a handful of elements, so the interpreted-HOF penalty is
    irrelevant here (unlike corpus-wide folds)."""
    asset_bytes = F.coalesce(
        F.aggregate(
            "assets",
            F.lit(0).cast("bigint"),
            lambda acc, a: acc + F.coalesce(a["fileSize"], F.lit(0)),
        ),
        F.lit(0).cast("bigint"),
    )
    return media.select(
        "id",
        "name",
        "type",
        "archived",
        "created",
        "updated",
        F.col("duration").cast("double").alias("duration"),
        "hashed_id",
        "section",
        "description",
        "progress",
        "status",
        "thumbnail",
        "project",
        "assets",
        F.coalesce(F.size("assets"), F.lit(0)).alias("n_assets"),
        asset_bytes.alias("total_asset_bytes"),
        F.lit(run_ts).cast("timestamp").alias("ingestion_timestamp"),
    )


def explode_media_assets(media: DataFrame) -> DataFrame:
    """``media.assets`` array → one row per asset (P2 nested extraction
    over the reference's only true multimodal column:
    cloud-run-job/media_stats_schema.json:96-109).

    ``explode_outer`` keeps asset-less media visible as a NULL-asset
    row (the raw feed has media with ``assets: null``). Scale: explode
    is a narrow per-row generator — no shuffle; the asset structs are
    column-pruned at the scan when downstream selects a subset.
    """
    return media.select(
        F.col("hashed_id").alias("media_id"),
        F.explode_outer("assets").alias("asset"),
    ).select(
        "media_id",
        F.col("asset.url").alias("url"),
        F.col("asset.width").alias("width"),
        F.col("asset.height").alias("height"),
        F.col("asset.fileSize").alias("file_size"),
        F.col("asset.contentType").alias("content_type"),
        F.col("asset.type").alias("asset_type"),
    )


def asset_inventory(media: DataFrame) -> DataFrame:
    """Per-contentType asset rollup (counts / bytes / max geometry)
    over the exploded ``media.assets``. One shuffle on the low-
    cardinality content_type key; map-side combine does the heavy
    lifting. ``n_assets`` counts real assets; ``n_rows`` additionally
    counts the NULL-asset placeholder rows so asset-less media stay
    auditable."""
    # a REAL asset may carry a null fileSize — asset presence is "any
    # field non-null"; only the explode_outer placeholder is all-null
    return explode_media_assets(media).groupBy("content_type").agg(
        F.count(F.coalesce("url", "content_type", "asset_type")).alias("n_assets"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("media_id").alias("n_media"),
        F.sum("file_size").alias("total_bytes"),
        F.max("width").alias("max_width"),
    )


def transform_visitor_data(events: DataFrame, run_ts: dt.datetime) -> DataFrame:
    """events → dim_visitor: one row per visitor_key, attributes from
    that visitor's earliest event (deterministic first-wins).

    Implemented as a lexicographic struct-min aggregation: one shuffle
    on visitor_key, map-side combinable — no window sort. At 100 TB
    visitor cardinality is huge but each group is small; the hash agg
    spills gracefully and AQE coalesces the output.
    """
    first = F.min(
        F.struct(
            "received_at",
            "event_key",
            "ip",
            "country",
            F.col("user_agent_details.browser").alias("browser"),
            F.col("user_agent_details.platform").alias("platform"),
            F.col("user_agent_details.mobile").alias("mobile"),
        )
    ).alias("f")
    return (
        # received_at null would sort before every real timestamp in the
        # struct-min and poison first_seen_at — such rows are invalid
        # for an ordering defined by (received_at, event_key)
        events.filter(F.col("visitor_key").isNotNull() & F.col("received_at").isNotNull())
        .groupBy(F.col("visitor_key").alias("visitor_id"))
        .agg(first)
        .select(
            "visitor_id",
            F.col("f.received_at").alias("first_seen_at"),
            F.col("f.ip").alias("ip"),
            F.col("f.country").alias("country"),
            F.col("f.browser").alias("browser"),
            F.col("f.platform").alias("platform"),
            F.col("f.mobile").alias("mobile"),
            F.lit(run_ts).cast("timestamp").alias("ingestion_timestamp"),
        )
    )
