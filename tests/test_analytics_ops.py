"""Structural invariants for the round-3 analytics additions
(quality funnel, attribution, anomaly z-score, ABC/Pareto, pair-sim
histogram) — the oracle gate proves value equality; these pin the
properties a refactor could silently break."""

from __future__ import annotations

from pyspark.sql import functions as F

from wistia_data_pipeline_project_spark.plans import QUERIES
from wistia_data_pipeline_project_spark.sources.io import load_table

def test_quality_funnel_is_monotone_and_chained(spark, sf_dir):
    rows = {
        r["stage_idx"]: r
        for r in QUERIES["docs_quality_funnel"](spark, sf_dir).collect()
    }
    assert sorted(rows) == [1, 2, 3, 4]
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert rows[1]["n_in"] == n_docs
    for i in (1, 2, 3, 4):
        assert 0 <= rows[i]["n_kept"] <= rows[i]["n_in"]
        if i > 1:  # each stage's input is the previous stage's survivors
            assert rows[i]["n_in"] == rows[i - 1]["n_kept"]


def test_attribution_conserves_purchases_and_revenue(spark, sf_dir):
    out = QUERIES["events_attribution"](spark, sf_dir).collect()
    channels = {r["channel"] for r in out}
    assert channels <= {"click", "view", "signup", "organic"}
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & (F.col("event_type") == "purchase")
    )
    n_purchases = e.count()
    total_rev = float(
        e.agg(
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("decimal(18,2)")
            .cast("double")
        ).head()[0]
    )
    assert sum(r["n_purchases"] for r in out) == n_purchases
    assert abs(sum(r["attributed_revenue"] for r in out) - total_rev) < 1e-6
    for r in out:
        if r["channel"] == "organic":
            assert r["avg_minutes_to_convert"] is None
        else:  # lookback window caps time-to-convert at 7 days
            assert 0.0 <= r["avg_minutes_to_convert"] <= 7 * 24 * 60


def test_anomaly_zscore_frame_discipline(spark, sf_dir):
    out = QUERIES["events_anomaly_zscore"](spark, sf_dir)
    rows = out.collect()
    # one row per observed (event_type, day) — nothing dropped
    base = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("event_type", F.date_trunc("day", "ts").alias("day"))
        .distinct()
        .count()
    )
    assert len(rows) == base
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for rs in by_type.values():
        rs.sort(key=lambda r: r["day"])
        for i, r in enumerate(rs):
            if i < 7:  # incomplete trailing frame -> no score, no flag
                assert r["zscore"] is None and r["mean7"] is None
                assert r["is_anomaly"] is False
            else:
                assert r["mean7"] is not None


def test_abc_pareto_partitions_revenue(spark, sf_dir):
    out = {r["abc_class"]: r for r in QUERIES["orders_abc_pareto"](spark, sf_dir).collect()}
    assert set(out) == {"A", "B", "C"}
    n_cust = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in out.values()) == n_cust
    shares = {k: r["revenue_share"] for k, r in out.items()}
    assert abs(sum(shares.values()) - 1.0) < 1e-9
    # the head class must not exceed its boundary; B ends by 95%
    assert shares["A"] <= 0.80 + 1e-9
    assert shares["A"] + shares["B"] <= 0.95 + 1e-9
    # Pareto shape: A averages more revenue per customer than C
    avg = {
        k: out[k]["class_revenue"] / out[k]["n_customers"] for k in out
    }
    assert avg["A"] > avg["C"]


def test_pair_sim_hist_counts_strided_pairs(spark, sf_dir):
    out = QUERIES["emb_pair_sim_hist"](spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "embeddings").count()
    per_stride: dict[int, int] = {}
    for r in out:
        assert -10 <= r["sim_bin"] <= 9
        per_stride[r["stride"]] = per_stride.get(r["stride"], 0) + r["n_pairs"]
    # ids are dense 0..n-1, so stride s yields exactly n-s pairs
    assert per_stride == {1: n - 1, 17: n - 17, 101: n - 101}


def test_dim_stats_known_values(spark):
    """Two 2-d vectors [1,0] and [0,2]: dim0 mean .5 var .25, dim1
    mean 1 var 1 — exact under the DECIMAL(8,5) quantization."""
    from wistia_data_pipeline_project_spark.operators.similarity import (
        dim_stats,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 2.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r.dim: r for r in dim_stats(df).collect()}
    assert got[0].n_vecs == 2 and got[1].n_vecs == 2
    assert (got[0].mean, got[0].variance) == (0.5, 0.25)
    assert (got[1].mean, got[1].variance) == (1.0, 1.0)
    # second moment consistency: var = E[x^2] - mean^2 by construction
    for r in got.values():
        assert r.variance == r.second_moment - r.mean * r.mean


def test_rolling_actives_covers_trailing_week(spark, sf_dir, tmp_path):
    """Micro corpus: u1 active day1, u2 active day1+day9. WAU(day1)=2;
    WAU(day9)=1 (u1's day-1 activity expired after day 7); stickiness
    = dau/wau on observed days only — no phantom days past day 9."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    T = dt.datetime
    d = str(tmp_path / "micro")
    os.makedirs(d, exist_ok=True)
    # pyarrow writes MICROS timestamps — the driver-generation shape
    # load_table's pinned reader expects (Spark's own writer emits
    # INT96 here)
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(
                [T(2024, 1, 1, 10), T(2024, 1, 1, 11), T(2024, 1, 9, 12)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1, 2, 2], pa.int64()),
            "event_type": pa.array(["view"] * 3),
            "value": pa.array([1.0] * 3, pa.float64()),
            "props": pa.array(["{}"] * 3),
        }
    )
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    out = {
        r.day.date().isoformat(): (r.dau, r.wau_7d, r.stickiness)
        for r in QUERIES["events_rolling_actives_7d"](spark, d).collect()
    }
    assert out == {
        "2024-01-01": (2, 2, 1.0),
        "2024-01-09": (1, 1, 1.0),
    }


def test_window_funnel_later_start_rescues_expired_window(spark, tmp_path):
    """The sliding-window funnel's distinguishing case vs
    events_funnel: user 1's FIRST view expires before the purchase,
    but a LATER view starts a chain that completes — level 3. User 2
    converts outside every window — level 2 (click in-window). User
    3 views only — level 1. Non-view users are outside the funnel
    universe."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from wistia_data_pipeline_project_spark.plans import QUERIES

    T = dt.datetime
    rows = [
        # user 1: view Jan1 (window ends Jan8: click Jan7 in, purchase
        # Jan10 OUT) and view Jan6 (window ends Jan13: click Jan7 +
        # purchase Jan10 both in) -> the later start completes
        (1, "view", T(2024, 1, 1)),
        (1, "click", T(2024, 1, 7)),
        (1, "view", T(2024, 1, 6)),
        (1, "purchase", T(2024, 1, 10)),
        # user 2: view day0, click day2, purchase day20 (expired)
        (2, "view", T(2024, 1, 1)),
        (2, "click", T(2024, 1, 3)),
        (2, "purchase", T(2024, 1, 21)),
        # user 3: view only
        (3, "view", T(2024, 1, 1)),
        # user 4: click/purchase but never views -> excluded
        (4, "click", T(2024, 1, 1)),
        (4, "purchase", T(2024, 1, 2)),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = str(tmp_path)
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    out = {
        r.level: r.n_users
        for r in QUERIES["events_window_funnel"](spark, d).collect()
    }
    # user 1: first view day1? windows: view Jan1 [.., Jan8]: click
    # Jan7 in-window, purchase Jan10 OUT; view Jan6 [.., Jan13]:
    # click Jan7 in, purchase Jan10 in -> level 3
    assert out == {3: 1, 2: 1, 1: 1}


def test_sequence_match_patterns_micro(spark, tmp_path):
    """Sequence strings build on the total order (ts, event_id) —
    same-timestamp ties break on event_id — and the four patterns
    classify a hand-built corpus exactly."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from wistia_data_pipeline_project_spark.plans import QUERIES

    T = dt.datetime
    rows = [
        # user 1: v,c,p in order (+ tie: click/view same ts, view has
        # lower event_id -> 'vc' not 'cv') -> ordered_conversion
        (1, 10, "view", T(2024, 1, 1, 9)),
        (1, 11, "click", T(2024, 1, 1, 9)),
        (1, 12, "purchase", T(2024, 1, 2)),
        # user 2: views only -> never_purchases
        (2, 20, "view", T(2024, 1, 1)),
        # user 3: purchase then view -> post_purchase_view (and has p)
        (3, 30, "purchase", T(2024, 1, 1)),
        (3, 31, "view", T(2024, 1, 2)),
        # user 4: ends on error -> error_then_churn + never_purchases
        (4, 40, "view", T(2024, 1, 1)),
        (4, 41, "error", T(2024, 1, 2)),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = str(tmp_path)
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    out = {
        r.pattern: r.n_users
        for r in QUERIES["events_sequence_match"](spark, d).collect()
    }
    assert out == {
        "ordered_conversion": 1,   # user 1 only (tie resolved v first)
        "never_purchases": 2,      # users 2, 4
        "post_purchase_view": 1,   # user 3
        "error_then_churn": 1,     # user 4
    }


def test_session_concurrency_hand_computed(spark, tmp_path):
    """Sweep-line fixture with hand-checked peaks across hour buckets
    and a midnight-spanning session:

    - day 1: u1 09:00-09:40 (events at 09:00, 09:20, 09:40),
      u2 09:30-09:55 (25-min gap, one session), u3 09:35
      (zero-length). 09:35-09:40 has all three open -> peak 3.
    - u4 23:50 day1 - 00:10 day2 (one session, gap 20 min): clips to
      both days; day 2's only activity -> peak 1, busy 10min + 1us.
    """
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from wistia_data_pipeline_project_spark.plans import QUERIES

    T = dt.datetime
    rows = [
        (1, 0, T(2024, 1, 1, 9, 0)),
        (1, 1, T(2024, 1, 1, 9, 20)),
        (1, 2, T(2024, 1, 1, 9, 40)),
        (2, 3, T(2024, 1, 1, 9, 30)),
        (2, 4, T(2024, 1, 1, 9, 55)),
        (3, 5, T(2024, 1, 1, 9, 35)),
        (4, 6, T(2024, 1, 1, 23, 50)),
        (4, 7, T(2024, 1, 2, 0, 10)),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = str(tmp_path)
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    out = {
        r["day"].day: r
        for r in QUERIES["events_session_concurrency"](spark, d).collect()
    }
    d1, d2 = out[1], out[2]
    assert d1["peak_concurrent"] == 3
    assert d1["n_sessions"] == 4 and d1["n_users"] == 4
    # busy: u1 40min+1us, u2 25min+1us, u3 1us, u4-clip 10min exact
    assert abs(d1["busy_seconds"] - (40 * 60 + 25 * 60 + 10 * 60 + 3e-6)) < 1e-9
    assert d2["peak_concurrent"] == 1 and d2["n_sessions"] == 1
    assert abs(d2["busy_seconds"] - (10 * 60 + 1e-6)) < 1e-9
    assert abs(d1["avg_concurrency"] - d1["busy_seconds"] / 86400.0) < 1e-12


def test_activity_bitmap_streak_detection(spark, tmp_path):
    """Bit-trick streak check: alternating-day users have popcount 3
    with NO 3-streak; exactly-3-consecutive users have one. The anchor
    is the corpus min day, so offsets are fixture-relative."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from wistia_data_pipeline_project_spark.plans import QUERIES

    T = dt.datetime
    rows = []
    eid = 0

    def ev(uid, day):
        nonlocal eid
        rows.append((uid, eid, T(2024, 1, 1 + day, 12)))
        eid += 1

    for d in (0, 2, 4):      # user 1: alternating -> no streak
        ev(1, d)
    for d in (5, 6, 7):      # user 2: 3 consecutive -> streak
        ev(2, d)
    ev(2, 5)                 # duplicate-day event: bit_or idempotent
    for d in (0, 1):         # user 3: 2 consecutive -> no streak
        ev(3, d)
    tbl = pa.table(
        {
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = str(tmp_path)
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    out = {
        r["n_active_days"]: r
        for r in QUERIES["events_activity_bitmap"](spark, d).collect()
    }
    assert out[3]["n_users"] == 2          # users 1 and 2
    assert out[3]["n_streak3_users"] == 1  # only user 2
    assert out[2]["n_users"] == 1 and out[2]["n_streak3_users"] == 0
