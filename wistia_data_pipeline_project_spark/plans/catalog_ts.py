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
# readings on the catalog's total order. The cents cast is CASE-guarded
# by the declared value domain (non-NULL, non-NaN, |v| < 1e9): DuckDB
# evaluates the projection BEFORE any downstream CTE's WHERE, and a
# bare CAST raises "value is out of range" on a NaN or huge reading
# instead of letting the consumer exclude the row. The guard keeps the
# CTE usable both by value-domain entries (events_counter_delta, which
# re-filters in its own WHERE) and by entries that never read cents
# (events_state_durations).
_E_CENTS = """
    WITH e AS (
      SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN value IS NOT NULL AND NOT isnan(value)
                       AND abs(value) < 1000000000.0
                  THEN CAST(CAST(value AS DECIMAL(12,2)) * 100
                            AS DECIMAL(18,0))
             END AS cents,
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
      FROM e WHERE value IS NOT NULL AND NOT isnan(value)
               AND abs(value) < 1000000000.0
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
        # declared domain: NaN / ±Inf / |value| >= 1e9 excluded in
        # BOTH engines (NaN- or overflow->decimal is NULL in Spark
        # but an ERROR in DuckDB — the time_weighted_avg precedent)
        & F.col("value").isNotNull()
        & ~F.isnan(F.col("value"))
        & (F.abs(F.col("value")) < F.lit(1e9))
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
        AND value IS NOT NULL AND NOT isnan(value)
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
        # NaN excluded: the engines agree NaN sorts greatest, but a
        # NaN high/low is useless and hash-fragile — out of domain
        & F.col("value").isNotNull()
        & ~F.isnan(F.col("value"))
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
        AND value IS NOT NULL AND NOT isnan(value)
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
        & ~F.isnan(F.col("value"))
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
        AND NOT isnan(value) AND abs(value) < 1000000000.0
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
    """Linear interpolation onto each USER's daily purchase-value
    grid (TimescaleDB ``interpolate`` gapfill — the LOCF resampler's
    sibling; ``events_daily_gapfill`` carries forward, this one
    blends between the surrounding observed days). Keyed per user on
    the sparse purchase stream so the grid actually has gaps to
    interpolate (~60% of grid days at sf0.01); per-type grids are
    fully observed on this corpus and would never exercise the blend.

    Scale: dailies collapse map-side to |keys| x |days| rows before
    the spine explode and the two LOCF/NOCB windows — one key-shuffle
    family, never a window over raw events.
    """
    e = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase")
        & F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        # declared domain (decimal quantize): the counter_delta guard
        & F.col("value").isNotNull()
        & ~F.isnan(F.col("value"))
        & (F.abs(F.col("value")) < F.lit(1e9))
    )
    return TS.interpolate_daily(e, key_col="user_id")


@query(
    "events_heartbeat_uptime",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    s AS (
      SELECT user_id, epoch_us(ts) AS us,
             epoch_us(lead(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id))
               - epoch_us(ts) AS gap_us
      FROM e
    ),
    a AS (
      SELECT user_id,
             COUNT(*) AS n_beats,
             SUM(CASE WHEN gap_us IS NULL THEN 300000000
                      ELSE LEAST(gap_us, 300000000) END) AS uptime_us,
             SUM(CASE WHEN gap_us IS NOT NULL
                           AND gap_us > 300000000
                      THEN 1 ELSE 0 END) + 1 AS n_islands,
             MAX(us) - MIN(us) + 300000000 AS span_us
      FROM s GROUP BY user_id
    )
    SELECT user_id, n_beats,
           CAST(uptime_us AS BIGINT) AS uptime_us,
           CAST(n_islands AS BIGINT) AS n_islands,
           CAST(span_us AS BIGINT) AS span_us,
           CAST(uptime_us AS DOUBLE) / CAST(span_us AS DOUBLE) AS coverage
    FROM a
    """,
)
def events_heartbeat_uptime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-of-intervals liveness per user (TimescaleDB
    ``heartbeat_agg``, 5-minute tolerance): uptime as the union length
    of ``[ts, ts+5min)`` heartbeats — overlaps never double-count —
    plus maximal live-stretch count and coverage of the key's span.

    Scale: the union telescopes to one lead-1 window + a combinable
    aggregate (uniform interval width makes the sweep line a per-row
    ``least``); O(events), no interval join.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    return TS.heartbeat_uptime(e, tolerance_us=300_000_000)


@query(
    "events_psi_drift",
    oracle="""
    WITH e AS (
      SELECT event_type, value,
             CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-08 00:00:00'
               AS is_base,
             CAST(LEAST(5, GREATEST(0, FLOOR(value / 20.0))) AS INT)
               AS bin
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL
        AND value IS NOT NULL AND NOT isnan(value)
    ),
    obs AS (
      SELECT event_type, bin,
             SUM(CASE WHEN is_base THEN 1 ELSE 0 END) AS cb,
             SUM(CASE WHEN is_base THEN 0 ELSE 1 END) AS cc
      FROM e GROUP BY 1, 2
    ),
    -- the FULL 6-bin grid per type: a bin observed in neither window
    -- still carries a nonzero smoothed term (p != q whenever the two
    -- denominators differ) — dropping it understates PSI exactly when
    -- the window sizes differ most (review r07)
    grid AS (
      SELECT t.event_type, b.bin
      FROM (SELECT DISTINCT event_type FROM e) t
      CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS bin) b
    ),
    cnts AS (
      SELECT g.event_type, g.bin,
             COALESCE(o.cb, 0) AS cb, COALESCE(o.cc, 0) AS cc
      FROM grid g LEFT JOIN obs o USING (event_type, bin)
    ),
    tots AS (
      SELECT event_type, SUM(cb) AS nb, SUM(cc) AS nc
      FROM cnts GROUP BY 1
    ),
    terms AS (
      SELECT c.event_type, t.nb, t.nc,
             (CAST(c.cb + 1 AS DOUBLE) / CAST(t.nb + 6 AS DOUBLE))
               AS p,
             (CAST(c.cc + 1 AS DOUBLE) / CAST(t.nc + 6 AS DOUBLE))
               AS q
      FROM cnts c JOIN tots t USING (event_type)
    )
    SELECT event_type,
           CAST(MIN(nb) AS BIGINT) AS n_base,
           CAST(MIN(nc) AS BIGINT) AS n_comp,
           CAST(SUM(CAST(ROUND((p - q) * LN(p / q), 6)
                         AS DECIMAL(18,6))) AS DOUBLE) AS psi
    FROM terms GROUP BY event_type
    """,
)
def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift detection per event type: the
    ``value`` distribution of the first week (baseline) vs everything
    after, over six fixed-width bins with Laplace(+1) smoothing —
    PSI = Σ (p−q)·ln(p/q) over the FULL bin grid — bins observed in
    neither window still contribute their smoothed term, which is
    nonzero whenever the two window sizes differ. The standard
    ML-telemetry drift monitor (PSI < 0.1 stable, > 0.25 drifted).

    Determinism: p and q are single divisions of exact integers
    (bit-identical doubles); each PSI term is quantized to
    DECIMAL(18,6) before the sum — the docs_token_entropy pattern,
    absorbing any 1-ulp libm ln() divergence between JVM and C.

    Scale: bin counts collapse map-side to ≤ 6 rows per (type, side);
    everything after the first aggregate is arithmetic on a
    types × bins table.
    """
    e = (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("event_type").isNotNull()
            & F.col("ts").isNotNull()
            # NaN floor->int is NULL in Spark but an ERROR in DuckDB
            & F.col("value").isNotNull()
            & ~F.isnan(F.col("value"))
        )
        .select(
            "event_type",
            (F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp"))
            .alias("is_base"),
            F.least(
                F.lit(5),
                F.greatest(F.lit(0), F.floor(F.col("value") / 20.0)),
            )
            .cast("int")
            .alias("bin"),
        )
    )
    obs = e.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("is_base"), 1).otherwise(0)).alias("cb"),
        F.sum(F.when(F.col("is_base"), 0).otherwise(1)).alias("cc"),
    )
    # full 6-bin grid per type: unobserved bins still carry a nonzero
    # smoothed term when the window sizes differ (review r07); the
    # grid is |types| x 6 rows, broadcast-joined
    grid = (
        e.select("event_type")
        .distinct()
        .crossJoin(
            e.sparkSession.range(6).select(
                F.col("id").cast("int").alias("bin")
            )
        )
    )
    cnts = grid.join(obs, ["event_type", "bin"], "left").select(
        "event_type",
        "bin",
        F.coalesce("cb", F.lit(0)).alias("cb"),
        F.coalesce("cc", F.lit(0)).alias("cc"),
    )
    tots = cnts.groupBy("event_type").agg(
        F.sum("cb").alias("nb"), F.sum("cc").alias("nc")
    )
    p = (F.col("cb") + 1).cast("double") / (F.col("nb") + 6).cast("double")
    q = (F.col("cc") + 1).cast("double") / (F.col("nc") + 6).cast("double")
    terms = cnts.join(tots, "event_type").select(
        "event_type",
        "nb",
        "nc",
        F.round((p - q) * F.log(p / q), 6).cast("decimal(18,6)").alias("_t"),
    )
    return terms.groupBy("event_type").agg(
        F.min("nb").cast("long").alias("n_base"),
        F.min("nc").cast("long").alias("n_comp"),
        F.sum("_t").cast("double").alias("psi"),
    )


@query(
    "events_cusum_changepoint",
    oracle="""
    WITH e AS (
      SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
      FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
    ),
    daily AS (
      SELECT event_type, day, COUNT(*) AS cnt FROM e GROUP BY 1, 2
    ),
    base AS (
      SELECT event_type,
             SUM(CASE WHEN day < TIMESTAMP '2024-01-08 00:00:00'
                      THEN cnt ELSE 0 END) AS sum_base,
             SUM(CASE WHEN day < TIMESTAMP '2024-01-08 00:00:00'
                      THEN 1 ELSE 0 END) AS n_base
      FROM daily GROUP BY 1
    ),
    y AS (
      SELECT d.event_type, d.day, d.cnt, b.n_base,
             d.cnt * b.n_base - b.sum_base AS dev
      FROM daily d JOIN base b USING (event_type)
      WHERE b.n_base > 0
    ),
    cumd AS (
      SELECT event_type, day, cnt, n_base,
             SUM(dev) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cum
      FROM y
    ),
    c AS (
      SELECT event_type, day, cnt, n_base, cum,
             LEAST(0, MIN(cum) OVER (PARTITION BY event_type ORDER BY day
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND CURRENT ROW)) AS low
      FROM cumd
    ),
    exc AS (
      SELECT event_type, day, n_base,
             cum - low AS excursion,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cum - low DESC, day) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n_days
      FROM c
    )
    SELECT event_type,
           CAST(n_days AS BIGINT) AS n_days,
           CAST(excursion AS DOUBLE) / CAST(n_base AS DOUBLE)
             AS max_cusum,
           day AS peak_day
    FROM exc WHERE rn = 1
    """,
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan per event type: the classic sequential
    recursion S_t = max(0, S_{t-1} + (x_t − μ)) over daily counts (μ =
    the first week's mean) has the exact CLOSED FORM
    S_t = cumsum_t − min(0, running-min of cumsum) — two stacked
    windows, no recursion, no UDF. Reports each type's maximum
    excursion and the first day attaining it (the drift onset
    candidate) — the temporal twin of ``events_psi_drift``'s
    distributional test.

    Determinism: deviations are scaled by ``n_base`` so every window
    value is an exact INTEGER (cnt·n_base − sum_base); the single
    double division at the end de-scales. Peak ties resolve to the
    earlier day in both engines.

    Scale: the daily pre-agg is the only event-volume shuffle (the
    anomaly-zscore shape); both windows and the rank run over
    types × days rows.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    daily = e.groupBy(
        "event_type", F.date_trunc("DAY", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    cutoff = F.lit("2024-01-08 00:00:00").cast("timestamp")
    base = daily.groupBy("event_type").agg(
        F.sum(F.when(F.col("day") < cutoff, F.col("cnt")).otherwise(0)).alias(
            "sum_base"
        ),
        F.sum(F.when(F.col("day") < cutoff, 1).otherwise(0)).alias("n_base"),
    )
    y = (
        daily.join(base, "event_type")
        .filter(F.col("n_base") > 0)
        .withColumn(
            "dev", F.col("cnt") * F.col("n_base") - F.col("sum_base")
        )
    )
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum("dev").over(w)
    c = y.select(
        "event_type",
        "day",
        "n_base",
        cum.alias("cum"),
    ).withColumn("low", F.least(F.lit(0), F.min("cum").over(w)))
    exc = c.select(
        "event_type",
        "day",
        "n_base",
        (F.col("cum") - F.col("low")).alias("excursion"),
        F.row_number()
        .over(
            W.partitionBy("event_type").orderBy(
                (F.col("cum") - F.col("low")).desc(), F.col("day")
            )
        )
        .alias("rn"),
        F.count(F.lit(1))
        .over(W.partitionBy("event_type"))
        .alias("n_days"),
    )
    return exc.filter(F.col("rn") == 1).select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        (
            F.col("excursion").cast("double") / F.col("n_base").cast("double")
        ).alias("max_cusum"),
        F.col("day").alias("peak_day"),
    )


@query(
    "events_trend_robust",
    oracle="""
    WITH e AS (
      SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
      FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
    ),
    daily AS (
      SELECT event_type, day,
             date_diff('day', DATE '1970-01-01', day) AS dnum,
             COUNT(*) AS cnt
      FROM e GROUP BY 1, 2
    ),
    p AS (
      SELECT a.event_type,
             a.dnum AS d1, b.dnum AS d2,
             CAST(b.cnt AS BIGINT) - CAST(a.cnt AS BIGINT) AS dy,
             b.dnum - a.dnum AS dx
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.dnum < b.dnum
    ),
    sl AS (
      SELECT event_type, d1, d2, dy, dx,
             CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE) AS slope,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY CAST(dy AS DOUBLE)
                                           / CAST(dx AS DOUBLE),
                                         d1, d2) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
      FROM p
    )
    SELECT event_type,
           CAST(MIN(n_pairs) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN dy > 0 THEN 1
                         WHEN dy < 0 THEN -1 ELSE 0 END) AS BIGINT)
             AS mk_s,
           MIN(CASE WHEN rn = (n_pairs + 1) // 2 THEN slope END)
             AS theil_sen_slope
    FROM sl GROUP BY event_type
    """,
)
def events_trend_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust trend detection per event type over the daily-count
    series: the Mann-Kendall S statistic (Σ sign(cnt_j − cnt_i) over
    ordered day pairs — a pure INTEGER, the classic non-parametric
    monotone-trend test) and the Theil-Sen slope (median of pairwise
    slopes — the 29%-breakdown robust regression a drift monitor
    pairs with PSI/CUSUM).

    Determinism: every slope is one double division of two exact
    integers (bit-identical cross-engine); the median is the DISCRETE
    pick at rank ceil(n/2) on the total order (slope, d1, d2) — never
    an interpolating percentile (Spark's ``median``/``percentile``
    average the two middle elements on even counts; a 30-day series
    has 435 = odd pairs, but the rank pick stays exact for ANY
    parity).

    Scale: pairs are O(days²) PER SERIES over the DAILY pre-aggregate
    — bounded by the day domain, independent of event volume (the
    anomaly-zscore shape). For decade-long series the documented swap
    is the repeated-median or a deterministic pair sample; the
    statistic's shape is unchanged.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    daily = e.groupBy(
        "event_type", F.date_trunc("DAY", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    daily = daily.select(
        "event_type",
        F.datediff("day", F.lit("1970-01-01")).alias("dnum"),
        F.col("cnt").cast("long").alias("cnt"),
    )
    a = daily.alias("a")
    b = daily.alias("b")
    p = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.dnum") < F.col("b.dnum")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.dnum").alias("d1"),
        F.col("b.dnum").alias("d2"),
        (F.col("b.cnt") - F.col("a.cnt")).alias("dy"),
        (F.col("b.dnum") - F.col("a.dnum")).alias("dx"),
    )
    from pyspark.sql import Window as W

    slope = F.col("dy").cast("double") / F.col("dx").cast("double")
    sl = p.select(
        "event_type",
        "d1",
        "d2",
        "dy",
        slope.alias("slope"),
    ).withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("event_type").orderBy("slope", "d1", "d2")
        ),
    ).withColumn(
        "n_pairs", F.count(F.lit(1)).over(W.partitionBy("event_type"))
    )
    mk = F.sum(
        F.when(F.col("dy") > 0, 1).when(F.col("dy") < 0, -1).otherwise(0)
    )
    pick = F.min(
        F.when(
            F.col("rn") == F.floor((F.col("n_pairs") + 1) / 2),
            F.col("slope"),
        )
    )
    return sl.groupBy("event_type").agg(
        F.min("n_pairs").cast("long").alias("n_pairs"),
        mk.cast("long").alias("mk_s"),
        pick.alias("theil_sen_slope"),
    )


@query(
    "events_ewma_smoothed",
    oracle=_E_CENTS
    + """,
    d AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             CAST(SUM(cents) AS DECIMAL(20,0)) AS x
      FROM e WHERE cents IS NOT NULL GROUP BY 1, 2
    ),
    r AS (
      SELECT user_id, day, x,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY day DESC) AS rn_d,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM d
    ),
    w AS (
      SELECT user_id, day, x, n, rn_d,
             CASE WHEN rn = 1 THEN n - 1 ELSE n - rn + 1 END AS ex
      FROM r
    )
    SELECT user_id,
           CAST(MAX(n) AS BIGINT) AS n_days,
           MAX(day) AS last_day,
           CAST(MIN(CASE WHEN rn_d = 1 THEN x END) AS DOUBLE) / 100.0
             AS last_total,
           CAST(SUM(CASE WHEN ex <= 24
                         THEN x * CAST(pow(2.0, 24 - ex)
                                       AS DECIMAL(18,0))
                         ELSE 0 END) AS DOUBLE) / 1677721600.0 AS ewma
    FROM w GROUP BY user_id
    """,
)
def events_ewma_smoothed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially smoothed daily spend (alpha = 1/2 EWMA
    over the observed-day sequence — the smoothing hyperfunction a
    monitoring stack keeps beside raw rollups; reference north-star
    rollup generalized the same way as the counter/state entries).
    Reports each user's final smoothed daily total next to the raw
    last-day total and the day count.

    Determinism (see ``TS.ewma_last``): alpha = 1/2 makes every
    weight an exact power of two; terms past 24 halvings truncate to
    zero BY DECLARATION, so the smoothed value is one exact
    DECIMAL(38,0) integer sum and ONE final IEEE division — no double
    summation order, no ROUND-on-double, both engines bit-identical.
    The 30-day corpus exercises the truncation branch (n - 1 > 24 for
    most users) AND the degenerate n = 1 and full-weight branches.

    Scale: daily pre-agg collapses events map-side; ONE user_id
    shuffle then serves the row_number window and the final
    combinable aggregate. O(events) with the window over collapsed
    daily rows only — the closed form replaces the sequential fold,
    so no mapInPandas state pass is needed.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        # declared domain, as events_counter_delta: NaN / +-Inf /
        # |value| >= 1e9 excluded in BOTH engines
        & F.col("value").isNotNull()
        & ~F.isnan(F.col("value"))
        & (F.abs(F.col("value")) < F.lit(1e9))
    )
    cents = F.col("value").cast("decimal(12,2)") * 100
    prepared = e.select(
        "user_id",
        F.date_trunc("DAY", F.col("ts")).alias("day"),
        cents.cast("decimal(18,0)").alias("cents"),
    )
    return TS.ewma_last(
        prepared, key_col="user_id", day_col="day", cents_col="cents"
    )


# The Holt fold oracle is recursive: reuse the shared cents CTE under a
# WITH RECURSIVE head (DuckDB scopes RECURSIVE to the whole chain; only
# the fold member actually recurses).
_E_CENTS_REC = _E_CENTS.replace("WITH e AS", "WITH RECURSIVE e AS", 1)
assert "WITH RECURSIVE e AS" in _E_CENTS_REC


@query(
    "events_holt_linear",
    oracle=_E_CENTS_REC
    + """,
    d AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             CAST(SUM(cents) AS HUGEINT) AS x0
      FROM e WHERE cents IS NOT NULL GROUP BY 1, 2
    ),
    dc AS (
      SELECT user_id, day,
             GREATEST(LEAST(x0, CAST(1000000000 AS HUGEINT)),
                      CAST(-1000000000 AS HUGEINT)) AS x
      FROM d
    ),
    r AS (
      SELECT user_id, day, x,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY day DESC) AS rd,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM dc
    ),
    w AS (
      SELECT user_id, day, x, n,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS m
      FROM r WHERE rd <= 24
    ),
    fold AS (
      SELECT user_id, rn,
             CAST(4 AS HUGEINT) * x AS L,
             CAST(0 AS HUGEINT) AS B,
             CAST(4 AS HUGEINT) AS p
      FROM w WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.rn,
             2 * s.x * f.p + 2 * f.L + 2 * f.B,
             s.x * f.p - f.L + 3 * f.B,
             f.p * 4
      FROM fold f JOIN w s
        ON s.user_id = f.user_id AND s.rn = f.rn + 1
    ),
    g AS (
      SELECT user_id, MAX(n) AS n_days, MAX(m) AS n_used,
             MAX(day) AS last_day
      FROM w GROUP BY 1
    ),
    -- micro-dollar quantization: halfup(V * 10^4, p) in pure integer
    -- arithmetic (floormod via double-%, floor-div exact on the
    -- mod-subtracted numerator); the micro ints stay < 2^53 by the
    -- clamp declaration, so the final cast is exact
    q AS (
      SELECT g.user_id, g.n_days, g.n_used, g.last_day,
             f.L * 10000 AS ln, f.B * 10000 AS bn,
             (f.L + f.B) * 10000 AS fn, f.p AS p
      FROM g JOIN fold f ON f.user_id = g.user_id AND f.rn = g.n_used
    ),
    z AS (
      SELECT user_id, n_days, n_used, last_day, p,
             ((ln % p) + p) % p AS lr,
             ((bn % p) + p) % p AS br,
             ((fn % p) + p) % p AS fr,
             ln, bn, fn
      FROM q
    )
    SELECT user_id,
           CAST(n_days AS BIGINT) AS n_days,
           CAST(n_used AS BIGINT) AS n_used,
           last_day,
           CAST((ln - lr) // p
                + CASE WHEN 2 * lr >= p THEN 1 ELSE 0 END AS DOUBLE)
             / 1000000.0 AS level,
           CAST((bn - br) // p
                + CASE WHEN 2 * br >= p THEN 1 ELSE 0 END AS DOUBLE)
             / 1000000.0 AS trend,
           CAST((fn - fr) // p
                + CASE WHEN 2 * fr >= p THEN 1 ELSE 0 END AS DOUBLE)
             / 1000000.0 AS forecast
    FROM z
    """,
)
def events_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Holt linear-trend (double exponential) smoothing of
    daily spend — the trend-aware sibling of ``events_ewma_smoothed``
    (Holt-Winters family without seasonality): final level, trend and
    one-step forecast per user over the observed-day sequence.

    Determinism (see ``TS.holt_linear``): alpha = beta = 1/2 makes
    every state dyadic; the fold runs in exact integers (Python ints /
    HUGEINT) scaled by 4^t, and every output is micro-dollar
    quantized by an exact integer HALF-UP division — the only float
    ops are one EXACT (< 2^53) int->double conversion and one
    division by 1e6 per output, identical on both engines. Unlike
    the EWMA there is NO closed form (the Holt transition matrix has
    complex eigenvalues 5/8 +- i*sqrt(7)/8), so this entry exercises
    the sequential-fold path over the window-sum path by necessity.
    Declared domain: last 24 observed days per user (warm-start
    l = x, b = 0), daily totals clamped to +-1e9 cents, micro-dollar
    output resolution — all replayed in the oracle.

    Scale: daily pre-agg collapses events map-side; ONE user_id
    shuffle serves the ordering windows and the Arrow-batched grouped
    fold over <= 24 rows per key (the stateful-watch-time envelope,
    O(1) state per key). The recursive-CTE formulation exists only on
    the oracle side; Spark never iterates driver-side.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        # declared domain, as events_ewma_smoothed: NaN / +-Inf /
        # |value| >= 1e9 excluded in BOTH engines
        & F.col("value").isNotNull()
        & ~F.isnan(F.col("value"))
        & (F.abs(F.col("value")) < F.lit(1e9))
    )
    cents = F.col("value").cast("decimal(12,2)") * 100
    prepared = e.select(
        "user_id",
        F.date_trunc("DAY", F.col("ts")).alias("day"),
        cents.cast("decimal(18,0)").alias("cents"),
    )
    return TS.holt_linear(
        prepared, key_col="user_id", day_col="day", cents_col="cents"
    )


@query(
    "events_holt_backtest",
    oracle=_E_CENTS_REC
    + """,
    d AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             CAST(SUM(cents) AS HUGEINT) AS x0
      FROM e WHERE cents IS NOT NULL GROUP BY 1, 2
    ),
    dc AS (
      SELECT user_id, day,
             GREATEST(LEAST(x0, CAST(1000000000 AS HUGEINT)),
                      CAST(-1000000000 AS HUGEINT)) AS x
      FROM d
    ),
    r AS (
      SELECT user_id, day, x,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY day DESC) AS rd
      FROM dc
    ),
    w AS (
      SELECT user_id, day, x,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM r WHERE rd <= 24
    ),
    fold AS (
      SELECT user_id, rn,
             CAST(4 AS HUGEINT) * x AS L,
             CAST(0 AS HUGEINT) AS B,
             CAST(4 AS HUGEINT) AS p
      FROM w WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.rn,
             2 * s.x * f.p + 2 * f.L + 2 * f.B,
             s.x * f.p - f.L + 3 * f.B,
             f.p * 4
      FROM fold f JOIN w s
        ON s.user_id = f.user_id AND s.rn = f.rn + 1
    ),
    bt AS (
      SELECT f.user_id,
             s.x * 10000 AS actual,
             (f.L + f.B) * 10000 AS fn, f.p AS p
      FROM fold f JOIN w s
        ON s.user_id = f.user_id AND s.rn = f.rn + 1
    ),
    e2 AS (
      SELECT user_id,
             abs(actual - (((fn - (((fn % p) + p) % p)) // p)
                 + CASE WHEN 2 * (((fn % p) + p) % p) >= p
                        THEN 1 ELSE 0 END)) AS err
      FROM bt
    )
    SELECT user_id,
           COUNT(*) AS n_steps,
           CAST(SUM(err) AS DOUBLE) / (COUNT(*) * 1000000.0) AS mae,
           CAST(MAX(err) AS DOUBLE) / 1000000.0 AS worst_err
    FROM e2 GROUP BY 1
    """,
)
def events_holt_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step-ahead backtest of the Holt fold: per user, the MAE and
    worst absolute error of forecasting each day from the previous
    day's state — the forecast-eval surface beside
    ``events_holt_linear`` (the way recall self-evals sit beside the
    ANN entries). Same declared window/clamp; per-step errors are
    EXACT integers (both the actual and the forecast quantize to
    micro-dollars by the same HALF-UP integer division), so the only
    float ops are two <2^53 casts and two divisions by exact doubles.
    Single-day users have no step and are excluded in both engines.

    Scale: identical to ``events_holt_linear`` — daily pre-agg, one
    key shuffle, partition-scan mapInPandas fold.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & ~F.isnan(F.col("value"))
        & (F.abs(F.col("value")) < F.lit(1e9))
    )
    cents = F.col("value").cast("decimal(12,2)") * 100
    prepared = e.select(
        "user_id",
        F.date_trunc("DAY", F.col("ts")).alias("day"),
        cents.cast("decimal(18,0)").alias("cents"),
    )
    return TS.holt_backtest(
        prepared, key_col="user_id", day_col="day", cents_col="cents"
    )
