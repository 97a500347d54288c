"""Structured Streaming variant of the incremental fact rollup
(SURVEY §2.10): the reference's scheduler-driven micro-batching
(Cloud Scheduler → hourly job, hand-rolled HWM) becomes a real stream
with watermarks and exactly-once state.

Mapping:
- hand-rolled HWM + ``since`` refetch  → ``withWatermark`` (late-data
  bound) + checkpointed offsets (no re-read at all)
- re-run duplicate risk (+1 s overlap) → ``dropDuplicatesWithinWatermark``
  on the unique event key
- daily grain of the fact             → tumbling ``F.window(ts, '1 day')``
- per-group sequential watch-time     → planned as
  ``transformWithStateInPandas`` (lag-1 state per key, event-time
  timeout at watermark + 1 day); round-2 item — the batch fold is the
  semantic spec.

Scale: the streaming agg state is keyed by (media, visitor, day);
the watermark bounds state size (day windows close 1 day after the
watermark passes). Source-side, a file stream lists incrementally;
production would swap in Kafka with identical plan shape.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_daily_engagement(
    events_stream: DataFrame,
    watermark: str = "1 day",
) -> DataFrame:
    """events stream → per (media, visitor, day) engagement aggregates.

    Append-mode compatible: results emit once the day window closes
    under the watermark — the streaming twin of the batch fact rollup's
    non-stateful aggregates.
    """
    e = events_stream.filter(
        F.col("media_id").isNotNull()
        & F.col("visitor_key").isNotNull()
        & F.col("received_at").isNotNull()
    )
    e = e.withWatermark("received_at", watermark)
    e = e.dropDuplicatesWithinWatermark(["event_key"])
    return (
        e.groupBy(
            F.window("received_at", "1 day").alias("day_window"),
            "media_id",
            F.col("visitor_key").alias("visitor_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("percent_viewed").alias("max_percent_viewed"),
            F.min("received_at").alias("event_timestamp"),
            F.max("received_at").alias("last_event_timestamp"),
        )
        .select(
            F.col("day_window.start").cast("date").alias("date"),
            "media_id",
            "visitor_id",
            "n_events",
            "max_percent_viewed",
            "event_timestamp",
            "last_event_timestamp",
        )
    )


def streaming_session_windows(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session-window rollup per visitor (the streaming-native
    equivalent of the batch lag+cumsum sessionization)."""
    e = events_stream.filter(
        F.col("visitor_key").isNotNull() & F.col("received_at").isNotNull()
    ).withWatermark("received_at", watermark)
    return (
        e.groupBy(
            F.session_window("received_at", gap).alias("session"),
            F.col("visitor_key").alias("visitor_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "visitor_id",
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# Stateful watch-time (SURVEY §2.6 streaming variant)
# ---------------------------------------------------------------------------

WATCH_STATE_SCHEMA = (
    "last_time timestamp, last_pct double, total double, n_play bigint, "
    "any_progress boolean, max_pct double, first_ts timestamp, "
    "last_ts timestamp, duration double"
)

WATCH_OUTPUT_SCHEMA = (
    "media_id string, visitor_id string, date date, play_count bigint, "
    "total_watch_time double, max_percent_viewed double, "
    "event_timestamp timestamp, last_event_timestamp timestamp"
)


def streaming_watch_time(
    events_stream: DataFrame,
    dim_media: DataFrame,
    watermark: str = "1 day",
    legacy_percent_semantics: bool = False,
) -> DataFrame:
    """Per-(media, visitor, day) watch-time over an event stream:
    ``applyInPandasWithState`` carrying the batch fold's lag-1 state
    (anchor timestamp + last percent + running credit) across
    micro-batches.

    Semantics match ``fact.fact_media_engagement_fold`` when events
    arrive time-ordered per key (each batch is sorted; cross-batch
    order is the stream's arrival order — the same assumption the
    reference's incremental refetch makes). Emits the updated
    aggregate for every key touched by a batch (update mode); state
    evicts via event-time timeout once the watermark passes the key's
    day + 1, bounding the store to ~2 days of active keys.

    Scale: state is one fixed-width row per (media, visitor, day) —
    the same key space as the batch shuffle — and the stream-static
    duration join is broadcast per micro-batch.
    """
    e = (
        events_stream.filter(
            F.col("media_id").isNotNull()
            & F.col("visitor_key").isNotNull()
            & F.col("received_at").isNotNull()
        )
        .withWatermark("received_at", watermark)
        .join(
            F.broadcast(dim_media.select("media_id", "duration")),
            "media_id",
            "left",
        )
        .select(
            "media_id",
            F.col("visitor_key").alias("visitor_id"),
            F.to_date("received_at").alias("date"),
            "received_at",
            "event_key",
            F.col("percent_viewed").cast("double").alias("pct"),
            F.col("name").alias("event_name"),
            F.col("duration").cast("double").alias("duration"),
        )
    )
    legacy = legacy_percent_semantics

    def step(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            (last_time, last_pct, total, n_play, any_progress, max_pct,
             first_ts, last_ts, duration) = state.get
        else:
            last_time, last_pct, total = None, 0.0, 0.0
            n_play, any_progress, max_pct = 0, False, 0.0
            first_ts, last_ts, duration = None, None, None

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["received_at", "event_key"], kind="mergesort")
        for ts, pct, name, dur in zip(
            rows["received_at"], rows["pct"], rows["event_name"], rows["duration"]
        ):
            if pd.isna(ts) or pd.isna(pct):
                continue
            pct = float(pct)
            if duration is None and pd.notna(dur):
                duration = float(dur)
            if name == "play":
                n_play += 1
            if pct > 0:
                any_progress = True
            max_pct = max(max_pct, pct)
            first_ts = ts if first_ts is None else min(first_ts, ts)
            last_ts = ts if last_ts is None else max(last_ts, ts)
            if duration is None or duration <= 0:
                continue
            if last_time is None and (pct > 0 or name == "play"):
                last_time, last_pct = ts, pct
            elif last_time is not None:
                elapsed = (ts - last_time).total_seconds()
                if elapsed > 0 and pct > last_pct:
                    if name not in ("pause", "end"):
                        change = pct - last_pct
                        expected = (change / 100.0 if legacy else change) * duration
                        total += min(elapsed, expected)
                    last_pct, last_time = pct, ts
                elif pct > last_pct + 0.01:
                    last_pct, last_time = pct, ts
                elif elapsed > 0 and pct <= last_pct:
                    last_pct, last_time = pct, ts

        state.update(
            (last_time, last_pct, total, n_play, any_progress, max_pct,
             first_ts, last_ts, duration)
        )
        # evict when the watermark passes the key's day + 2 days
        day = key[2]
        evict_at = dt.datetime.combine(day, dt.time()) + dt.timedelta(days=2)
        state.setTimeoutTimestamp(int(evict_at.timestamp() * 1000))

        play_count = n_play if n_play > 0 else (1 if any_progress else 0)
        capped = min(total, duration) if duration is not None else total
        if play_count == 0:
            capped = 0.0
        yield pd.DataFrame(
            [
                {
                    "media_id": key[0],
                    "visitor_id": key[1],
                    "date": day,
                    "play_count": play_count,
                    "total_watch_time": round(capped, 2),
                    "max_percent_viewed": max_pct,
                    "event_timestamp": first_ts,
                    "last_event_timestamp": last_ts,
                }
            ]
        )

    return e.groupBy("media_id", "visitor_id", "date").applyInPandasWithState(
        step,
        WATCH_OUTPUT_SCHEMA,
        WATCH_STATE_SCHEMA,
        "update",
        GroupStateTimeout.EventTimeTimeout,
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
):
    """Drive a streaming DataFrame to completion against the memory
    sink (local smoke path: processAllAvailable is synchronous)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    return q
