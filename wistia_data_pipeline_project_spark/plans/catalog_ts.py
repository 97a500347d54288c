"""Time-series hyperfunction family (round 7): reset-aware counter
aggregation, time-in-state, OHLC bars, M4 downsampling, and linear
gapfill interpolation — the TimescaleDB-hyperfunction shapes a
telemetry/observability pipeline runs next to the reference's
engagement rollups (north_star: the per-day fact build,
``/root/reference/process_wistia_data_v2.py:402-465``, generalized to
the standard continuous-aggregate operators).

Every entry follows the catalog determinism rules: 2-decimal readings
scale to INTEGER cents before any sum (integer-valued decimals cast
to double correctly rounded in both engines); time arithmetic in
exact integer microseconds/days; every order-dependent pick resolves
on the total order ``(ts, event_id)``; interpolation is ONE double
division of two exact integers — never a decimal division (the
engines do not share decimal rounding rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import timeseries as TS
from ..sources.io import load_table
from .catalog import query

# Shared oracle CTE: the cleaned events stream with cent-scaled
# readings on the catalog's total order.
_E_CENTS = """
    WITH e AS (
      SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS DECIMAL(18,0))
               AS cents,
             value
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
    )
"""


@query(
    "events_counter_delta",
    oracle=_E_CENTS
    + """,
    s AS (
      SELECT user_id, cents, ts, event_id,
             lag(cents) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM e WHERE value IS NOT NULL
    )
    SELECT user_id,
           COUNT(*) AS n_samples,
           CAST(SUM(CASE WHEN prev IS NOT NULL AND cents < prev
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
           CAST(SUM(CAST(CASE WHEN prev IS NULL THEN 0
                              WHEN cents >= prev THEN cents - prev
                              ELSE cents END AS DECIMAL(38,0)))
                AS DOUBLE) / 100.0 AS delta,
           CAST(MIN(CASE WHEN rn_a = 1 THEN cents END) AS DOUBLE) / 100.0
             AS first_reading,
           CAST(MIN(CASE WHEN rn_d = 1 THEN cents END) AS DOUBLE) / 100.0
             AS last_reading
    FROM s GROUP BY user_id
    """,
)
def events_counter_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reset-aware counter aggregation per user (TimescaleDB
    ``counter_agg`` / PromQL ``increase``): total growth with
    down-steps treated as counter resets. The driver corpus's gauge
    readings are deliberately adversarial inputs (≈half the steps go
    down), exercising BOTH branches on every key.

    Scale: one key shuffle + lag-1 window + map-combinable aggregate —
    the watch-time fold shape, O(events) with no grid fan-out.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    return TS.counter_delta(e)


@query(
    "events_state_durations",
    oracle=_E_CENTS
    + """,
    s AS (
      SELECT user_id, event_type,
             epoch_us(lead(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id))
               - epoch_us(ts) AS dur_us
      FROM e WHERE event_type IS NOT NULL
    )
    SELECT user_id, event_type,
           COUNT(*) AS n_entries,
           CAST(COALESCE(SUM(dur_us), 0) AS BIGINT) AS held_us
    FROM s GROUP BY 1, 2
    """,
)
def events_state_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-in-state per (user, event_type) (TimescaleDB
    ``state_agg``): each event holds its type until the user's next
    event; the open tail contributes an entry but no duration.

    Scale: lead-1 window on the key shuffle, then a combinable
    (key, state) aggregate — output is |users| x |states| rows at any
    event volume.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
    )
    return TS.state_durations(e)


@query(
    "events_ohlc_daily",
    oracle="""
    WITH e AS (
      SELECT event_type, event_id, value, CAST(ts AS TIMESTAMP) AS ts
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL
        AND value IS NOT NULL
    ),
    r AS (
      SELECT *, date_trunc('day', ts) AS bar_day,
             row_number() OVER (PARTITION BY event_type,
                                  date_trunc('day', ts)
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type,
                                  date_trunc('day', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM e
    )
    SELECT event_type, bar_day,
           COUNT(*) AS n_ticks,
           MIN(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MIN(CASE WHEN rn_d = 1 THEN value END) AS close
    FROM r GROUP BY 1, 2
    """,
)
def events_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC candlestick bars per event type (TimescaleDB
    ``ohlc`` rollup). Open/close resolve on the total order; every
    output is a PICKED reading — no summation, raw doubles exact.

    Scale: ONE map-side-combinable aggregate keyed (type, day); the
    min_by/max_by partials carry one pair per group per mapper — no
    window, no sort, at any corpus size.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    return TS.ohlc_bars(
        e.withColumn("bar_day", F.date_trunc("DAY", F.col("ts"))),
        key_cols=("event_type",),
        bucket_col="bar_day",
    )


@query(
    "events_m4_downsample",
    oracle="""
    WITH e AS (
      SELECT event_type, event_id, value, CAST(ts AS TIMESTAMP) AS ts,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL
        AND value IS NOT NULL
    ),
    sp AS (
      SELECT event_type, MIN(us) AS t0, MAX(us) + 1 AS t1
      FROM e GROUP BY 1
    ),
    b AS (
      SELECT e.*, ((e.us - sp.t0) * 100) // (sp.t1 - sp.t0) AS bucket
      FROM e JOIN sp USING (event_type)
    ),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM b
    )
    SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
           COUNT(*) AS n_points,
           MIN(CASE WHEN rn_a = 1 THEN value END) AS first_v,
           MIN(CASE WHEN rn_d = 1 THEN value END) AS last_v,
           MIN(value) AS min_v,
           MAX(value) AS max_v
    FROM r GROUP BY 1, 2
    """,
)
def events_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling (Jugel et al., VLDB'14): per event
    type, 100 equal-width time buckets each keeping the four
    error-free rendering extrema (first/last by time, min/max by
    value). Bucket index in PURE integer-microsecond division — both
    engines share it exactly at any span (a double floor diverges
    past 2^52).

    Scale: |keys|-row span table broadcast back + one combinable
    (key, bucket) aggregate — output bounded at 4 points x buckets x
    keys regardless of corpus size, which is the point of M4.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    return TS.m4_downsample(e, n_buckets=100)


@query(
    "events_interp_daily",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS DECIMAL(18,0))
               AS cents
      FROM events
      WHERE event_type = 'purchase' AND user_id IS NOT NULL
        AND ts IS NOT NULL AND value IS NOT NULL
    ),
    d AS (
      SELECT user_id, day, COUNT(*) AS n_obs,
             MIN(CASE WHEN rn = 1 THEN cents END) AS cents
      FROM (
        SELECT *, date_trunc('day', ts) AS day,
               row_number() OVER (PARTITION BY user_id,
                                    date_trunc('day', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM e
      ) GROUP BY 1, 2
    ),
    sp AS (
      SELECT user_id,
             unnest(generate_series(MIN(day), MAX(day),
                                    INTERVAL 1 DAY)) AS day
      FROM d GROUP BY user_id
    ),
    g AS (
      SELECT sp.user_id, sp.day, d.n_obs, d.cents,
             date_diff('day', DATE '1970-01-01', sp.day) AS dnum,
             last_value(d.cents IGNORE NULLS) OVER (
               PARTITION BY sp.user_id ORDER BY sp.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pc,
             last_value(CASE WHEN d.cents IS NOT NULL THEN
                 date_diff('day', DATE '1970-01-01', sp.day) END
               IGNORE NULLS) OVER (
               PARTITION BY sp.user_id ORDER BY sp.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
             first_value(d.cents IGNORE NULLS) OVER (
               PARTITION BY sp.user_id ORDER BY sp.day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nc,
             first_value(CASE WHEN d.cents IS NOT NULL THEN
                 date_diff('day', DATE '1970-01-01', sp.day) END
               IGNORE NULLS) OVER (
               PARTITION BY sp.user_id ORDER BY sp.day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM sp LEFT JOIN d USING (user_id, day)
    )
    SELECT user_id, day,
           CAST(COALESCE(n_obs, 0) AS BIGINT) AS n_obs,
           (CASE WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE)
                 ELSE CAST(pc * (nd - dnum) + nc * (dnum - pd) AS DOUBLE)
                      / CAST(nd - pd AS DOUBLE)
            END) / 100.0 AS value,
           cents IS NULL AS interpolated
    FROM g
    """,
)
def events_interp_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation onto each event type's daily grid
    (TimescaleDB ``interpolate`` gapfill — the LOCF resampler's
    sibling; ``events_daily_gapfill`` carries forward, this one
    blends between the surrounding observed days).

    Scale: dailies collapse map-side to |keys| x |days| rows before
    the spine explode and the two LOCF/NOCB windows — one key-shuffle
    family, never a window over raw events.
    """
    e = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase")
        & F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    return TS.interpolate_daily(e, key_col="user_id")
