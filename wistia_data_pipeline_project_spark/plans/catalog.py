"""Query catalog — the driver contract behind ``__spark_entry__.py``.

Every operator family from SURVEY.md §2 gets at least one named query
here, implemented Spark-first (DataFrame API, Catalyst-optimizable) and
paired with an ANSI-SQL oracle that DuckDB executes over the same
parquet tables. The driver hash-compares both at sf0.01.

Cross-engine determinism rules used throughout (this is why results
hash-match bit-for-bit):

- **Money/metric sums go through DECIMAL.** Double summation order
  differs between engines; decimal arithmetic is exact and associative.
  Pattern: cast each operand to a small-precision decimal, do the
  arithmetic in decimal, ``CAST(... AS DOUBLE)`` only at the very end
  (one deterministic conversion).
- **Order-sensitive "first/last" aggregates get a total order.** The
  reference relied on file-iteration order (SURVEY §2 A5/A6); here
  every first/last is ordered by ``(ts, unique_key)``. Spark side uses
  the lexicographic min/max of a struct (JVM-native, no UDF); the
  oracle uses a ``row_number()`` subquery.
- **No ROUND on doubles** (half-up vs half-even ambiguity); rounding
  only after decimal arithmetic, or via integer math.
- **Top-K always tie-breaks on a unique key.**
- **Decimal→double casts are only safe while the decimal is
  integer-valued OR its unscaled value stays below ~2^52** (round-6
  lesson, `operators/timeseries.py:time_weighted_avg`): below that
  bound both engines compute (double)unscaled / 10^scale; above it
  the JVM switches to a correctly-rounded conversion while DuckDB
  keeps the two-rounding int128 path and the last ulp drifts. When a
  decimal sum can grow past 2^52 unscaled, keep it integer-valued
  (scale money to cents) and divide by the scale factor as a separate
  IEEE op in both engines.
- **Raw doubles entering a decimal cast need a domain guard in BOTH
  engines** (`value IS NULL OR (NOT isnan(value) AND abs(value) <
  capacity)`): NaN or overflow → NULL in Spark but ERROR in DuckDB.

Spark-side scale notes are on each query (broadcast choices, shuffle
keys, AQE reliance) — see also SCALE.md.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import incremental as INC
from ..sources.io import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

# Entry-local cache registry (ADVICE r09/r10: bare ``.cache()`` inside a
# catalog entry pinned executor storage for the rest of a 206-entry
# session — the doc-family bench regressions of r10 tracked back to
# exactly this). ``shared()`` caches an intermediate that several
# branches of ONE entry consume; the registry releases every such cache
# when the NEXT entry builds (the driver/bench/tests all run
# build→materialize per entry, so by then the previous entry's collect
# is done). Unpersisting a never-materialized plan is a no-op in Spark,
# so an unusual build-all-then-collect driver merely loses the shared
# scan, never correctness. Cross-entry caches (the scored-pair
# checkpoints) stay on ``_pair_cache`` and are NOT registered here.
_ENTRY_CACHES: list[DataFrame] = []
_BUILD_DEPTH = 0


def shared(df: DataFrame) -> DataFrame:
    """Cache an intermediate consumed by multiple branches of the
    CURRENT catalog entry; released automatically when the next entry
    builds."""
    df = df.cache()
    _ENTRY_CACHES.append(df)
    return df


def release_entry_caches() -> None:
    """Unpersist every entry-local cache (called at entry build)."""
    while _ENTRY_CACHES:
        df = _ENTRY_CACHES.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:  # session already stopped — nothing to free
            pass


def query(name: str, oracle: str | None = None):
    def deco(fn):
        # duplicate registration is ALWAYS a bug: the later decorator
        # would silently shadow an established (driver-green) entry in
        # both dicts, and the oracle gate would keep passing against
        # the wrong implementation (caught live in round 9 when a new
        # entry reused an existing name)
        assert name not in QUERIES, f"duplicate catalog entry: {name}"

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Re-entrancy guard: recall/eval entries compose other
            # entries via QUERIES — only the top-level build reaps,
            # or the nested call would drop the outer entry's caches
            # mid-build.
            global _BUILD_DEPTH
            if _BUILD_DEPTH == 0:
                release_entry_caches()
            _BUILD_DEPTH += 1
            try:
                return fn(spark, sf_dir)
            finally:
                _BUILD_DEPTH -= 1

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def dec(col: str, prec: int = 12, scale: int = 2) -> F.Column:
    """Exact decimal view of a 2-decimal double column."""
    return F.col(col).cast(f"decimal({prec},{scale})")


def one() -> F.Column:
    """Literal 1 as a small decimal (built lazily — F.lit needs a live session)."""
    return F.lit(1).cast("decimal(3,2)")


# ---------------------------------------------------------------------------
# Aggregation family (SURVEY §2.5 A1-A3, A8-A10) on the TPC-H-ish tables
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2)))
               * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style wide hash aggregation (A1 grain agg + A9 ratios).

    Scale: single shuffle on the 2-value grouping key; partial
    aggregation (map-side combine) does almost all the work, so the
    shuffle carries ~|groups|×partitions rows. Filter + 7-column
    projection push into the parquet scan.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02 00:00:00"))
    )
    qty, price, disc, tax = (
        dec("l_quantity"),
        dec("l_extendedprice"),
        dec("l_discount", 4, 2),
        dec("l_tax", 4, 2),
    )
    n = F.count(F.lit(1))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        F.sum(price * (one() - disc)).cast("double").alias("sum_disc_price"),
        F.sum(price * (one() - disc) * (one() + tax)).cast("double").alias("sum_charge"),
        (F.sum(qty).cast("double") / n).alias("avg_qty"),
        (F.sum(price).cast("double") / n).alias("avg_price"),
        (F.sum(disc).cast("double") / n).alias("avg_disc"),
        n.alias("count_order"),
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.03 AND l_discount <= 0.07
      AND l_quantity < 25
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-style scan-filter-aggregate; the pushdown showcase.

    Scale: no shuffle at all (global agg = partials + single reduce);
    all four predicates land in PushedFilters on the parquet scan.
    """
    l = load_table(spark, sf_dir, "lineitem")
    f = l.filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 25)
    )
    return f.agg(
        F.sum(dec("l_extendedprice") * dec("l_discount", 4, 2))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "rollup_returnflag_status",
    oracle="""
    SELECT
      COALESCE(l_returnflag, 'ALL') AS returnflag,
      COALESCE(l_linestatus, 'ALL') AS linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def rollup_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals via ROLLUP (A10 family — grouping sets).

    The driver data has no NULL keys, so subtotal rows are identified by
    COALESCE to a sentinel (portable across engines, no grouping_id()).
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_lines",
        )
    )


# ---------------------------------------------------------------------------
# Join family (SURVEY §2.4 J1-J3, §2.3 P3)
# ---------------------------------------------------------------------------


@query(
    "q3_top_orders",
    oracle="""
    SELECT
      l.l_orderkey,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      o.o_orderdate,
      o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-style 3-way join + agg + deterministic top-K.

    Scale: customer (filtered to one segment) is broadcast — the
    orders->lineitem join is the only shuffle, on the natural key
    l_orderkey. Tie-break on l_orderkey keeps LIMIT deterministic
    because revenue is decimal-exact in both engines.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    joined = l.join(
        o, l.l_orderkey == o.o_orderkey, "inner"
    ).join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(dec("l_extendedprice") * (one() - dec("l_discount", 4, 2)))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_region_revenue",
    oracle="""
    SELECT
      n.n_name AS nation,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_lines
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style star join: dims broadcast, fact shuffles once.

    Scale: region/nation/customer are dimension-sized → broadcast
    chain; lineitem->orders is the single big shuffle join on
    l_orderkey. Catalyst prunes lineitem to 3 columns at scan.
    """
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name")
    )
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == dims.c_custkey)
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.sum(dec("l_extendedprice") * (one() - dec("l_discount", 4, 2)))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "customers_with_orders",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (J2/P3: EXISTS-style filter) + agg."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "customers_without_recent_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    )
    """,
)
def customers_without_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): churn cohort — customers with no
    order since 2000 (date filter keeps the result non-vacuous)."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01 00:00:00")))
        .select("o_custkey")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# ---------------------------------------------------------------------------
# Events family — the Wistia-surface operators on the driver's events
# table (user_id↔visitor, event_id↔event_key, ts↔received_at,
# event_type↔name, value↔percent-ish metric)
# ---------------------------------------------------------------------------


@query(
    "events_daily_engagement",
    oracle="""
    WITH e0 AS (
      -- ts is TIMESTAMP_NS in the parquet; truncate to microseconds to
      -- match Spark's TimestampType exactly
      SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts)
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    e AS (
      -- deterministic event_id dedup mirroring the Spark min-struct
      SELECT * EXCLUDE (rn) FROM (
        SELECT *, row_number() OVER (PARTITION BY event_id
                                     ORDER BY ts, event_type, value) AS rn
        FROM e0
      ) WHERE rn = 1
    ),
    agg AS (
      SELECT
        user_id,
        date_trunc('day', ts) AS event_date,
        COUNT(*) AS n_events,
        COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
        COUNT(DISTINCT event_type) AS n_event_types,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        MAX(value) AS max_value,
        MIN(ts) AS first_ts
      FROM e GROUP BY 1, 2
    ),
    fst AS (
      SELECT user_id, date_trunc('day', ts) AS event_date, event_type AS first_event_type,
             row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                ORDER BY ts, event_id) AS rn
      FROM e
    )
    SELECT agg.user_id, agg.event_date, agg.n_events, agg.n_purchases,
           agg.n_event_types, agg.total_value, agg.max_value, agg.first_ts,
           fst.first_event_type
    FROM agg
    JOIN fst ON agg.user_id = fst.user_id AND agg.event_date = fst.event_date
            AND fst.rn = 1
    """,
)
def events_daily_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP: daily per-user engagement rollup.

    Re-expression of the reference's fact aggregation
    (``/root/reference/process_wistia_data_v2.py:350-531``): null-key
    filter (P4), dedup by unique event key (late/duplicate guard,
    §2.10), group at (user, day) grain (A1), conditional count (A2),
    max metric (A3), first-event timestamp (A4), and a deterministic
    order-sensitive "first value" (A5) expressed as the lexicographic
    MIN of a (ts, event_id, event_type) struct — JVM-native, no UDF,
    and exactly one shuffle shared by all aggregates.

    Scale: one hash-aggregate shuffle on (user_id, date); all
    aggregates including the struct-min fold map-side. The date grain
    bounds group cardinality; a hot user on one day is AQE-skew-split.
    """
    e = load_table(spark, sf_dir, "events")
    e = e.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
    # DETERMINISTIC event_id dedup: dropDuplicates keeps an arbitrary
    # partition-dependent survivor; min_by a total order instead (and
    # the oracle mirrors it), per this file's determinism contract
    cols = e.columns
    e = (
        e.groupBy("event_id")
        .agg(
            F.min_by(
                F.struct(*cols), F.struct("ts", "event_type", "value")
            ).alias("_r")
        )
        .select("_r.*")
    )
    return e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("event_date")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.sum(dec("value", 18, 2)).cast("double").alias("total_value"),
        F.max("value").alias("max_value"),
        F.min("ts").alias("first_ts"),
        F.min(F.struct("ts", "event_id", "event_type"))
        .getField("event_type")
        .alias("first_event_type"),
    )


@query(
    "events_high_water_mark",
    oracle="""
    SELECT MAX(CAST(ts AS TIMESTAMP)) AS high_water_mark
    FROM events WHERE ts IS NOT NULL
    """,
)
def events_high_water_mark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's single declarative query (SURVEY §2.12/A7):
    incremental-load high-water mark."""
    e = load_table(spark, sf_dir, "events")
    return e.filter(F.col("ts").isNotNull()).agg(
        F.max("ts").alias("high_water_mark")
    )


@query(
    "events_latest_per_user",
    oracle="""
    SELECT user_id, ts AS last_ts, event_type AS last_event_type
    FROM (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def events_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1-per-key (S5/W3 latest-run discovery, generalized).

    Implemented as a lexicographic struct MAX — a full agg with
    map-side combine, which at 100 TB beats the window row_number
    formulation (no per-key sort, no skew cliff on hot keys).
    """
    e = load_table(spark, sf_dir, "events")
    top = F.max(F.struct("ts", "event_id", "event_type")).alias("top")
    return e.groupBy("user_id").agg(top).select(
        "user_id",
        F.col("top.ts").alias("last_ts"),
        F.col("top.event_type").alias("last_event_type"),
    )


@query(
    "events_incremental_upsert",
    oracle="""
    SELECT user_id, ts AS last_ts, event_type AS last_type,
           value AS last_value
    FROM (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP) DESC,
                                         event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def events_incremental_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD1 upsert (K2/K3 generalized): build the keyed
    snapshot state as of a cutoff, apply the post-cutoff delta with
    ``merge_upsert`` (latest-wins, updates win ties), and return the
    merged per-user state. The oracle recomputes the same state from
    the FULL history — hash-matching it proves the incremental
    equivalence ``merge(snapshot(t0), delta(t0..)) == recompute()``,
    the property that lets the reference's append-based loads
    (``process_wistia_data.py:528`` WRITE_APPEND + high-water mark)
    be replaced by idempotent merges.

    Scale: both the snapshot build and the merge are single
    ``max_by(struct)`` hash aggregates keyed on user_id — map-side
    combinable, no window sort; the delta side is a pushed-down
    timestamp range scan.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    cutoff = F.lit("2024-01-02 00:00:00").cast("timestamp")
    before = e.filter(F.col("ts") < cutoff)
    after = e.filter(F.col("ts") >= cutoff)
    row = F.struct("user_id", "ts", "event_id", "event_type", "value")
    snap = (
        before.groupBy("user_id")
        .agg(F.max_by(row, F.struct("ts", "event_id")).alias("_r"))
        .select("_r.*")
    )
    merged = INC.merge_upsert(snap, after, ["user_id"], ["ts", "event_id"])
    return merged.select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
    )


# ---------------------------------------------------------------------------
# Relational breadth: the remaining classic TPC-H shapes, adapted to the
# driver's narrower synthetic schema (no shipmode/commitdate/container
# columns — each query keeps the SHAPE that makes the original a
# canonical plan test and swaps in the columns that exist).
# ---------------------------------------------------------------------------


@query(
    "q4_priority_returns",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q4_priority_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shape EXISTS decorrelation: count one quarter's orders
    per priority that have at least one returned line (the synthetic
    schema has no commit/receipt dates, so ``l_returnflag = 'R'``
    plays the late-line predicate — same correlated-EXISTS plan).

    Scale: EXISTS becomes a LEFT SEMI join — the probe side never
    duplicates orders however many lines match, and the lineitem side
    is pre-filtered and projected to the join key only before the
    shuffle. Both date predicates push into the orders scan.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-04-01 00:00:00")))
    )
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q12_priority_by_status",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
)
def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-shape join + conditional pivot counts: one year of
    shipped lines, split per line status into high- vs low-priority
    order counts (CASE aggregates — the A2 conditional-count family
    over a join).

    Scale: the date filter prunes lineitem BEFORE the join; the
    orders side carries only (key, priority). One shuffle join on
    l_orderkey, then a 2-group map-side-combined aggregate.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
    ).select("l_orderkey", "l_linestatus")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT
      CAST(SUM(CASE WHEN p.p_type = 'PROMO'
            THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
            ELSE CAST(0 AS DECIMAL(12,2)) END) * 100 AS DOUBLE)
        / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        AS promo_revenue_pct,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        AS total_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shape promo revenue share: one month of lines joined
    to the part dim, ratio of PROMO-type revenue to total. Both sums
    are decimal-exact; only the final percent division is double, so
    the hash is stable in both engines.

    Scale: part is a broadcast dim (no shuffle); the month filter
    prunes lineitem at the scan; the global agg is partials + one
    reduce — zero exchanges beyond the broadcast.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-02-01 00:00:00")))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = dec("l_extendedprice") * (one() - dec("l_discount", 4, 2))
    zero = F.lit(0).cast("decimal(12,2)")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    return j.agg(
        (
            (
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
                * F.lit(100)  # ×100 in DECIMAL (exact) — a double ×100
                # after the cast drifts an ulp vs the oracle's order
            ).cast("double")
            / F.sum(rev).cast("double")
        ).alias("promo_revenue_pct"),
        F.sum(rev).cast("double").alias("total_revenue"),
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-shape disjunctive predicate join: revenue over an
    OR-of-ANDs across both join sides (three brand/size/quantity
    bands). The optimizer splits the disjunction: per-side
    implied predicates (brand IN (...), size/quantity hull ranges)
    are inferred and pushed below the join, and the full residual
    evaluates after it.

    Scale: part is broadcast; the inferred single-side conjuncts
    prune both scans so the join probes only candidate rows — the
    canonical test that CNF extraction survives the planner.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#7")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return j.filter(band).agg(
        F.sum(dec("l_extendedprice") * (one() - dec("l_discount", 4, 2)))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "customers_record_linkage",
    oracle="""
    WITH c AS (
      SELECT c_custkey, c_name, c_nationkey, c_mktsegment, c_acctbal
      FROM customer
    )
    SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
           a.c_name AS name_a, b.c_name AS name_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS name_dist,
           CAST(ABS(CAST(a.c_acctbal AS DECIMAL(12,2))
                    - CAST(b.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
             AS acctbal_gap
    FROM c a JOIN c b
      ON a.c_nationkey = b.c_nationkey
     AND a.c_mktsegment = b.c_mktsegment
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """,
)
def customers_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by blocking + verify (the record-linkage
    primitive behind customer/source dedup): candidate pairs are
    generated ONLY within a blocking key (nation × market segment),
    then verified with an exact edit-distance predicate on the name
    (JVM ``levenshtein`` — no Python in the loop) plus an
    account-balance gap feature for downstream scoring.

    Scale: the block equi-join replaces the O(N²) cross join with
    sum-over-blocks O(Σb²); block sizes are bounded by construction
    (a real pipeline monitors them with ``events_key_skew``'s
    diagnostic and splits oversized blocks on an extra key char).
    One self-join shuffle keyed on the block; distance evaluates only
    within blocks.
    """
    from ..sources.io import spread

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    # the verify stage is CPU-dense (per-pair Levenshtein DP); the
    # single-split customer scan would otherwise run the whole
    # broadcast join + distance loop on ONE core (measured 6.3 s at
    # sf0.1 → ~1 s spread). On a real multi-split table this is a no-op.
    a, b = spread(c).alias("a"), c.alias("b")
    ca, cb = (lambda n: F.col(f"a.{n}")), (lambda n: F.col(f"b.{n}"))
    return (
        a.join(
            b,
            (ca("c_nationkey") == cb("c_nationkey"))
            & (ca("c_mktsegment") == cb("c_mktsegment"))
            & (ca("c_custkey") < cb("c_custkey")),
        )
        .filter(F.levenshtein(ca("c_name"), cb("c_name")) <= 2)
        .select(
            ca("c_custkey").alias("custkey_a"),
            cb("c_custkey").alias("custkey_b"),
            ca("c_name").alias("name_a"),
            cb("c_name").alias("name_b"),
            F.levenshtein(ca("c_name"), cb("c_name")).alias("name_dist"),
            F.abs(
                ca("c_acctbal").cast("decimal(12,2)")
                - cb("c_acctbal").cast("decimal(12,2)")
            )
            .cast("double")
            .alias("acctbal_gap"),
        )
    )


@query(
    "orders_basket_lift",
    oracle="""
    WITH b AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM b),
    f AS (SELECT l_partkey, COUNT(*) AS n_item FROM b GROUP BY 1),
    p AS (
      SELECT a.l_partkey AS part_a, c.l_partkey AS part_b,
             COUNT(*) AS support
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    )
    SELECT part_a, part_b, support,
           CAST(support AS DOUBLE) / CAST(fa.n_item AS DOUBLE)
             AS confidence,
           CAST(support * n.n_orders AS DOUBLE)
             / CAST(fa.n_item * fb.n_item AS DOUBLE) AS lift
    FROM p
    JOIN f fa ON fa.l_partkey = p.part_a
    JOIN f fb ON fb.l_partkey = p.part_b
    CROSS JOIN n
    ORDER BY lift DESC, part_a, part_b
    LIMIT 100
    """,
)
def orders_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining (the A-Priori pair stage):
    top co-purchased part pairs across orders ranked by lift, with
    min-support 2 — support = orders containing both parts,
    confidence = P(b|a), lift = N·n_ab/(n_a·n_b).

    Scale: pairs are generated ORDER-LOCALLY — collect the distinct
    part set per order (baskets are bounded: ≤7 lineitems in TPC-H,
    bounded by order size in any retail schema) and expand C(m,2)
    pairs with an array comprehension, exactly the ``bucket_pairs``
    shape. No part-key self-join ever happens, so a hot part (a
    best-seller in 10% of orders) never becomes a hot JOIN key — it
    only widens baskets it actually appears in. One shuffle on
    l_orderkey (basket build), one on the pair (support count), both
    map-side combinable; item frequencies are one extra combinable
    agg on the same basket table, and the final ranking is a
    TakeOrdered top-100, no global sort. Determinism: integer
    support/frequency products, one IEEE double division per metric,
    total tiebreak (lift desc, part_a, part_b).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    # item frequency, the order total AND the pair expansion ride the
    # SAME basket table — shared() (r11) so the lineitem scan + the
    # orderkey collect_set shuffle run once instead of three times.
    from ..ckpt import spill_checkpoint as _sc
    baskets = _sc(
        li.groupBy("l_orderkey").agg(
            F.array_sort(F.collect_set("l_partkey")).alias("_parts")
        )
    )
    freq = (
        baskets.select(F.explode("_parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    totals = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    pair = F.filter(
        F.flatten(
            F.transform(
                F.col("_parts"),
                lambda x: F.transform(
                    F.col("_parts"),
                    lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
                ),
            )
        ),
        lambda p: p["part_a"] < p["part_b"],
    )
    support = (
        baskets.select(F.explode(pair).alias("p"))
        .groupBy(F.col("p.part_a").alias("part_a"), F.col("p.part_b").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
    )
    fa = freq.select(
        F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a")
    )
    fb = freq.select(
        F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b")
    )
    return (
        support.join(fa, "part_a")
        .join(fb, "part_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "part_a",
            "part_b",
            "support",
            (
                F.col("support").cast("double")
                / F.col("n_a").cast("double")
            ).alias("confidence"),
            (
                (F.col("support") * F.col("n_orders")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(100)
    )
