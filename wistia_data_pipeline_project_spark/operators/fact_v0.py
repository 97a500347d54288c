"""v0 pipeline generation: nested event shape + per-event fact rows.

Behavioral source (what to compute, not how):
``/root/reference/process_wistia_data.py:314-360`` — the production
variant's ``aggregate_fact_data``. It consumes the *nested* Wistia
stats-API event shape (``event['media']['hashed_id']``,
``occurred_at`` ISO-8601 string, ``visitor['key']``, ``type``) and
emits ONE fact row per event:

- ``play_count`` = 1 for ``type == 'play'`` else NULL (:321),
- ``total_watch_time`` = full media duration when
  ``type == 'percent:100'`` and the duration is known (:324-330) —
  the simple "completed → credit the whole video" semantics,
- rows missing a parseable timestamp or media id are dropped
  (:345-356); a missing visitor is kept as NULL,
- ``play_rate`` is always NULL (:353, "cannot accurately calculate").

SURVEY §1.3 marks the nested shape as an alternate source mapping for
the same engine; ``normalize_events`` is that mapping — it lifts the
nested shape onto the flat ``WISTIA_EVENT_SCHEMA`` column set so BOTH
fact generations (this module's v0 and ``fact.fact_media_engagement``)
run on either feed.

Plan shape: pure narrow projection + one broadcast dim join; no
shuffle at all, so the operator is scan-bound at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Nested Wistia stats-API event (process_wistia_data.py:314-324; only
# the consumed fields are REQUIRED to exist, all nullable).
V0_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("occurred_at", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("engagement", T.DoubleType()),
        T.StructField(
            "media",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("hashed_id", T.StringType()),
                    T.StructField("name", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "visitor",
            T.StructType([T.StructField("key", T.StringType())]),
        ),
        T.StructField("ip", T.StringType()),
        T.StructField("country", T.StringType()),
    ]
)

FACT_V0_SCHEMA = (
    "media_hashed_id string, event_timestamp timestamp, visitor_id string, "
    "play_count bigint, play_rate double, total_watch_time double"
)


def normalize_events(df: DataFrame, shape: str = "flat") -> DataFrame:
    """Adapter from either observed event feed shape to the flat
    engine columns (SURVEY §1.3 alternate mapping).

    ``shape="flat"``: identity (the v2 JSON-array feed already matches
    ``WISTIA_EVENT_SCHEMA``).

    ``shape="nested"``: the stats-API shape of
    ``process_wistia_data.py:314-324``. ``occurred_at`` is an ISO-8601
    string with offset — ``try_cast`` to timestamp applies the same
    parse-else-NULL behavior as the reference's ``fromisoformat`` +
    warning path (:336-343); unparseable strings become NULL and are
    dropped by the validity filter downstream (plain ``cast`` would
    throw under ANSI mode). Fields the nested feed
    does not carry (ip/country may be absent too) surface as NULLs so
    every downstream operator of the flat shape still runs. A
    deterministic ``event_key`` is synthesized from the payload for
    stable ordering (the feed has no key).
    """
    if shape == "flat":
        return df
    if shape != "nested":
        raise ValueError(f"unknown event shape: {shape!r}")
    cols = set(df.columns)
    opt = lambda name: (  # noqa: E731
        F.col(name) if name in cols else F.lit(None).cast("string")
    )
    return df.select(
        F.col("occurred_at").try_cast("timestamp").alias("received_at"),
        # the synthesized key must separate DISTINCT events that share a
        # second-resolution timestamp (e.g. two progress ticks in one
        # second): engagement and ip join the hash so downstream
        # event_key dedup only collapses true re-deliveries
        F.format_string(
            "v0-%016x",
            F.xxhash64(
                "occurred_at",
                F.col("media.hashed_id"),
                F.col("visitor.key"),
                "type",
                (F.col("engagement") if "engagement" in cols else F.lit(None)).cast(
                    "double"
                ),
                opt("ip"),
            ),
        ).alias("event_key"),
        opt("ip").alias("ip"),
        opt("country").alias("country"),
        # engagement is the percent-complete fraction when present
        (F.col("engagement") if "engagement" in cols else F.lit(None))
        .cast("double")
        .alias("percent_viewed"),
        F.col("visitor.key").alias("visitor_key"),
        F.col("media.hashed_id").alias("media_id"),
        F.col("media.name").alias("media_name"),
        F.col("type").alias("name"),
    )


def fact_media_engagement_v0(
    events_nested: DataFrame, dim_media: DataFrame
) -> DataFrame:
    """Per-event v0 fact (process_wistia_data.py:314-360).

    One output row per valid input event; ``total_watch_time`` credits
    the full duration on ``percent:100`` via a broadcast duration
    lookup (the reference's ``media_duration_map`` dict,
    :324-330). No aggregation and no shuffle — the operator is a
    narrow map over the event scan at any scale.
    """
    e = normalize_events(events_nested, "nested")
    valid = e.filter(
        F.col("media_id").isNotNull() & F.col("received_at").isNotNull()
    )
    dur = dim_media.select("media_id", F.col("duration").cast("double").alias("_dur"))
    return (
        valid.join(F.broadcast(dur), "media_id", "left")
        .select(
            F.col("media_id").alias("media_hashed_id"),
            F.col("received_at").alias("event_timestamp"),
            F.col("visitor_key").alias("visitor_id"),
            F.when(F.col("name") == "play", F.lit(1))
            .cast("bigint")
            .alias("play_count"),
            F.lit(None).cast("double").alias("play_rate"),
            F.when(
                (F.col("name") == "percent:100")
                & F.col("_dur").isNotNull(),
                F.col("_dur"),
            ).alias("total_watch_time"),
        )
    )
