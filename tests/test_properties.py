"""Property tests (SURVEY §5 item 4, hypothesis): invariants of the
fact rollup and dedup operators over randomized event streams.

Each example generates one multi-group event set (many groups per
Spark round-trip — Spark jobs are the expensive unit, so examples are
few and fat; deadline disabled accordingly).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.wistia_fixtures import RUN_TS
from wistia_data_pipeline_project_spark.operators.dedup import exact_dedup
from wistia_data_pipeline_project_spark.operators.fact import (
    fact_media_engagement,
    fact_media_engagement_fold,
)
from wistia_data_pipeline_project_spark.schemas import (
    WISTIA_EVENT_SCHEMA,
    WISTIA_MEDIA_SCHEMA,
    nullable_copy,
)

UTC = dt.timezone.utc
BASE = dt.datetime(2025, 5, 1, tzinfo=UTC)

MEDIA_IDS = ["mA", "mB"]
DURATIONS = {"mA": 120.0, "mB": 45.5}


def _media_rows():
    return [
        {
            "id": 1,
            "name": "A",
            "type": "Video",
            "archived": False,
            "created": BASE,
            "updated": BASE,
            "duration": DURATIONS["mA"],
            "hashed_id": "mA",
            "description": None,
            "progress": 1.0,
            "status": "ready",
            "section": None,
        },
        {
            "id": 2,
            "name": "B",
            "type": "Video",
            "archived": False,
            "created": BASE,
            "updated": BASE,
            "duration": DURATIONS["mB"],
            "hashed_id": "mB",
            "description": None,
            "progress": 1.0,
            "status": "ready",
            "section": None,
        },
    ]


event_strategy = st.fixed_dictionaries(
    {
        "media_id": st.sampled_from(MEDIA_IDS),
        "visitor_key": st.sampled_from(["v1", "v2", "v3"]),
        "offset_s": st.integers(min_value=0, max_value=3 * 86400),
        "percent_viewed": st.floats(
            min_value=0.0, max_value=1.0, allow_nan=False, width=32
        ),
        "name": st.sampled_from([None, "play", "pause", "end"]),
    }
)


def _to_event(i: int, e: dict) -> dict:
    return {
        "received_at": BASE + dt.timedelta(seconds=e["offset_s"]),
        "event_key": f"ek{i:05d}",
        "media_id": e["media_id"],
        "visitor_key": e["visitor_key"],
        "percent_viewed": float(e["percent_viewed"]),
        "name": e["name"],
        "ip": f"10.0.0.{i % 7}",
        "country": "US",
    }


@pytest.fixture(scope="module")
def dims(spark):
    from wistia_data_pipeline_project_spark.operators.dims import (
        transform_media_data,
    )

    media = spark.createDataFrame(_media_rows(), nullable_copy(WISTIA_MEDIA_SCHEMA))
    return transform_media_data(media, RUN_TS)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=st.lists(event_strategy, min_size=1, max_size=60))
def test_fact_invariants_and_window_fold_agreement(spark, dims, raw):
    events = spark.createDataFrame(
        [_to_event(i, e) for i, e in enumerate(raw)],
        nullable_copy(WISTIA_EVENT_SCHEMA),
    )
    win = fact_media_engagement(events, dims, RUN_TS).collect()
    fold = {
        (r["media_id"], r["visitor_id"], r["date"]): r
        for r in fact_media_engagement_fold(events, dims, RUN_TS).collect()
    }

    # grain uniqueness
    keys = [(r["media_id"], r["visitor_id"], r["date"]) for r in win]
    assert len(keys) == len(set(keys))
    assert set(keys) == set(fold)

    for r in win:
        k = (r["media_id"], r["visitor_id"], r["date"])
        f = fold[k]
        dur = DURATIONS[r["media_id"]]
        # bounded watch time and play rate
        assert 0.0 <= r["total_watch_time"] <= dur + 1e-9
        assert 0.0 <= r["play_rate"] <= 1.0 + 1e-9
        assert r["play_count"] >= 0
        # window formulation ≡ sequential fold
        assert r["play_count"] == f["play_count"], k
        assert r["total_watch_time"] == pytest.approx(
            f["total_watch_time"], abs=0.011
        ), k
        assert r["max_percent_viewed"] == pytest.approx(f["max_percent_viewed"]), k
        assert r["event_timestamp"] == f["event_timestamp"], k
        assert r["last_event_timestamp"] == f["last_event_timestamp"], k
        assert r["ip"] == f["ip"], k
        assert r["country"] == f["country"], k


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=12), min_size=1, max_size=30
    )
)
def test_exact_dedup_idempotent_and_canonical(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = exact_dedup(df)
    rows1 = sorted(once.collect())
    rows2 = sorted(exact_dedup(once).collect())
    # idempotence
    assert rows1 == rows2
    # one survivor per normalized text, and it's the min doc_id
    by_norm: dict[str, int] = {}
    for i, t in enumerate(texts):
        n = t.strip().lower()
        by_norm.setdefault(n, i)
    assert {r["doc_id"] for r in rows1} == set(by_norm.values())


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # skewed key space
            st.integers(min_value=-1000, max_value=1000),
        ),
        min_size=1,
        max_size=80,
    )
)
def test_salted_agg_equals_plain_groupby(spark, rows):
    from pyspark.sql import functions as F

    from wistia_data_pipeline_project_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)], "id long, k long, v long"
    )
    got = {
        r["k"]: (r["total"], r["n"], r["mx"])
        for r in salted_agg(
            df,
            keys=["k"],
            aggs={
                "total": ("sum", F.col("v")),
                "n": ("count", F.lit(1)),
                "mx": ("max", F.col("v")),
            },
            spread_col=F.col("id"),
            buckets=4,
        ).collect()
    }
    want = {
        r["k"]: (r["total"], r["n"], r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("total"),
            F.count(F.lit(1)).alias("n"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.text(
                alphabet="ab cd",
                min_size=0,
                max_size=60,
            ),
            st.sampled_from(["s0", "s1", "s2"]),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_split_partitions_and_packing_conserve(spark, docs):
    """split_assign partitions the corpus (every doc in exactly one
    split, stable across calls); pack_documents conserves docs and
    tokens and never reorders within a shard."""
    from wistia_data_pipeline_project_spark.operators.training import (
        pack_documents,
        split_assign,
    )

    df = spark.createDataFrame(
        [(i, t, s) for i, t, s in docs], "doc_id long, text string, source string"
    )
    s1 = {r.doc_id: r.split for r in split_assign(df).collect()}
    s2 = {r.doc_id: r.split for r in split_assign(df).collect()}
    assert s1 == s2 and len(s1) == len(docs)

    packed = pack_documents(df, budget=7)
    rows = packed.collect()
    assert len(rows) == len(docs)
    from pyspark.sql import functions as F2

    total_in = df.select(
        F2.sum(F2.size(F2.when(F2.length(F2.trim("text")) == 0, F2.array())
                       .otherwise(F2.split(F2.trim("text"), r"\s+")))).alias("n")
    ).head()["n"]
    assert sum(r.n_tokens for r in rows) == (total_in or 0)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.source, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in shard_rows:
            assert r.pack_id == cum // 7
            cum += r.n_tokens


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=12), min_size=5, max_size=120
    ),
    parts=st.integers(min_value=1, max_value=7),
)
def test_heavy_hitters_exact_for_any_partitioning(spark, keys, parts):
    """Two-pass heavy hitters equals the plain groupBy+HAVING answer
    for every partition layout (the pigeonhole candidate stage may
    vary; the output must not)."""
    from pyspark.sql import functions as F2

    from wistia_data_pipeline_project_spark.operators.skew import heavy_hitters

    df = spark.createDataFrame(
        [(k,) for k in keys], "user_id long"
    ).repartition(parts)
    got = {
        (r.user_id, r.n_events)
        for r in heavy_hitters(df, "user_id", mult=1.5).collect()
    }
    n, u = len(keys), len(set(keys))
    cnt = {}
    for k in keys:
        cnt[k] = cnt.get(k, 0) + 1
    want = {(k, c) for k, c in cnt.items() if c >= 1.5 * n / u}
    assert got == want


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=60), min_size=2, max_size=12
    ),
    sub=st.integers(min_value=0, max_value=11),
)
def test_containment_bounds_and_subset_detection(spark, texts, sub):
    """containment ∈ (0, 1]; a doc whose shingle set is a subset of
    another's is reported with containment 1.0."""
    from wistia_data_pipeline_project_spark.operators.dedup import (
        containment_pairs,
        shingle_table,
    )

    sub = sub % len(texts)
    # plant a superset: doc N+1 = texts[sub] + extra tail
    rows = [(i, t) for i, t in enumerate(texts)]
    rows.append((len(texts), texts[sub] + " x y z w v u t s"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = containment_pairs(df, width=3, threshold=0.0).collect()
    for r in out:
        assert 0.0 < r["containment"] <= 1.0
    sub_shingles = {
        r["shingle"]
        for r in shingle_table(df, width=3)
        .filter(f"doc_id = {sub}")
        .collect()
    }
    sup_shingles = {
        r["shingle"]
        for r in shingle_table(df, width=3)
        .filter(f"doc_id = {len(texts)}")
        .collect()
    }
    if sub_shingles and sub_shingles <= sup_shingles and sub != len(texts):
        hits = [
            r
            for r in out
            if r["doc_sub"] == sub and r["doc_sup"] == len(texts)
        ]
        assert hits and hits[0]["containment"] == 1.0


@settings(
    max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    weights=st.dictionaries(
        st.sampled_from(["s0", "s1", "s2"]),
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        min_size=1,
        max_size=3,
    )
)
def test_mixture_sample_is_subset_and_monotone(spark, weights):
    """mixture_sample output ⊆ input; raising every weight never
    shrinks the kept set (hex-threshold monotonicity)."""
    from wistia_data_pipeline_project_spark.operators import training as TR

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(300)], "doc_id long, source string"
    )
    kept = {r["doc_id"] for r in TR.mixture_sample(df, weights).collect()}
    assert kept <= set(range(300))
    bigger = {k: min(1.0, v + 0.3) for k, v in weights.items()}
    kept2 = {r["doc_id"] for r in TR.mixture_sample(df, bigger).collect()}
    assert kept <= kept2


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    corpus=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
            min_size=1,
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_text_metric_invariants(spark, corpus):
    """Randomized-corpus invariants of the round-3 text metrics:
    entropy in [0, ln(n_distinct)]; winnowing density in (0, 1] with
    every selected fingerprint a real gram of the doc."""
    import math
    import os
    import tempfile

    from wistia_data_pipeline_project_spark.plans import QUERIES

    rows = [
        (i, " ".join(toks), "en", "s", len(" ".join(toks)))
        for i, toks in enumerate(corpus)
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        ent = {r.doc_id: r for r in QUERIES["docs_token_entropy"](spark, td).collect()}
        win = {r.doc_id: r for r in QUERIES["docs_winnowing"](spark, td).collect()}
    for i, toks in enumerate(rows):
        e = ent[i]
        # the DECIMAL(18,6) per-term quantization admits up to ~1e-6
        # of slack around the real-arithmetic bounds
        assert -1e-5 <= e.entropy <= math.log(e.n_distinct) + 1e-5
        w = win[i]
        assert 0 < w.n_fingerprints <= w.n_grams
        assert abs(w.density - w.n_fingerprints / w.n_grams) < 1e-12


# ---------------------------------------------------------------------------
# last-touch attribution: Spark window argmax vs pure-Python fold


attrib_event = st.tuples(
    st.integers(min_value=0, max_value=4),  # user_id
    # small offset range so same-timestamp collisions are COMMON —
    # they exercise the packed-max tiebreak (higher channel code wins
    # at equal us); a wide range would never generate a tie. A few
    # offsets land beyond the 7-day lookback to cover 'organic'.
    st.one_of(
        st.integers(min_value=0, max_value=5000),
        st.integers(min_value=0, max_value=12 * 86400),
    ),
    st.sampled_from(["click", "view", "signup", "purchase", "error"]),
)


def _attribution_fold(rows, touch_types=("click", "view", "signup"),
                      lookback_days=7):
    """Pure-Python reference: per user, sort by (ts, event_id), keep
    the running last touch; ties at the same timestamp resolve to the
    highest channel code (the packed-BIGINT max semantics)."""
    code = {t: i + 1 for i, t in enumerate(touch_types)}
    out = {}
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for _, rs in by_user.items():
        rs.sort(key=lambda r: (r["ts"], r["event_id"]))
        last = None  # (us, code)
        for r in rs:
            if r["event_type"] == "purchase":
                us = int(r["ts"].timestamp() * 1_000_000)
                if last is not None and us - last[0] <= lookback_days * 86400_000_000:
                    out[r["event_id"]] = (touch_types[last[1] - 1], us - last[0])
                else:
                    out[r["event_id"]] = ("organic", None)
            if r["event_type"] in code:
                us = int(r["ts"].timestamp() * 1_000_000)
                cand = (us, code[r["event_type"]])
                # packed max: later us wins; same us -> higher code wins
                if last is None or cand > last:
                    last = cand
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=st.lists(attrib_event, min_size=1, max_size=80))
def test_last_touch_attribution_matches_python_fold(spark, raw):
    from wistia_data_pipeline_project_spark.operators.timeseries import (
        last_touch_attribution,
    )

    rows = [
        {
            "event_id": i,
            "user_id": u,
            "ts": BASE + dt.timedelta(seconds=off),
            "event_type": typ,
        }
        for i, (u, off, typ) in enumerate(raw)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        r["event_id"]: (r["channel"], r["lag_us"])
        for r in last_touch_attribution(df).collect()
    }
    assert got == _attribution_fold(rows)


def _linear_fold(rows, touch_types=("click", "view", "signup"), lookback_days=7):
    """Pure-Python reference for linear_attribution: per purchase,
    touches with us in [us_p - lookback, us_p - 1] share credit
    equally (RANGE frame semantics: strictly earlier in TIME, unlike
    last-touch's (ts, event_id) row order)."""
    lb = lookback_days * 86400_000_000
    out = {}
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for _, rs in by_user.items():
        for r in rs:
            if r["event_type"] != "purchase":
                continue
            us_p = int(r["ts"].timestamp() * 1_000_000)
            k = {t: 0 for t in touch_types}
            for o in rs:
                if o["event_type"] in k:
                    us_t = int(o["ts"].timestamp() * 1_000_000)
                    if us_p - lb <= us_t <= us_p - 1:
                        k[o["event_type"]] += 1
            total = sum(k.values())
            if total == 0:
                out[r["event_id"]] = {"organic": (0, 1.0)}
            else:
                out[r["event_id"]] = {
                    t: (n, n / total) for t, n in k.items() if n > 0
                }
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=st.lists(attrib_event, min_size=1, max_size=80))
def test_linear_attribution_matches_python_fold(spark, raw):
    from wistia_data_pipeline_project_spark.operators.timeseries import (
        linear_attribution,
    )

    rows = [
        {
            "event_id": i,
            "user_id": u,
            "ts": BASE + dt.timedelta(seconds=off),
            "event_type": typ,
        }
        for i, (u, off, typ) in enumerate(raw)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got: dict[int, dict] = {}
    for r in linear_attribution(df).collect():
        got.setdefault(r["event_id"], {})[r["channel"]] = (
            r["n_touches"],
            r["credit"],
        )
    expected = _linear_fold(rows)
    assert set(got) == set(expected)
    for eid in expected:
        assert set(got[eid]) == set(expected[eid]), eid
        for ch, (n, credit) in expected[eid].items():
            gn, gc = got[eid][ch]
            assert gn == n, (eid, ch)
            assert abs(gc - credit) < 1e-15, (eid, ch)
        # credits for a purchase always sum to 1
        assert abs(sum(c for _, c in got[eid].values()) - 1.0) < 1e-12


def _decay_fold(rows, touch_types=("click", "view", "signup"),
                lookback_days=7, halflife_hours=24.0):
    """Pure-Python reference for time_decay_attribution (direct
    2^(-age/halflife) weights — no factorization, so agreement also
    validates the base-shift algebra)."""
    lb = lookback_days * 86400_000_000
    h = halflife_hours * 3600 * 1e6
    out = {}
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for _, rs in by_user.items():
        for r in rs:
            if r["event_type"] != "purchase":
                continue
            us_p = int(r["ts"].timestamp() * 1_000_000)
            s = {t: 0.0 for t in touch_types}
            for o in sorted(rs, key=lambda x: int(x["ts"].timestamp() * 1e6)):
                if o["event_type"] in s:
                    us_t = int(o["ts"].timestamp() * 1_000_000)
                    if us_p - lb <= us_t <= us_p - 1:
                        s[o["event_type"]] += 2.0 ** (-(us_p - us_t) / h)
            total = sum(s.values())
            if total == 0.0:
                out[r["event_id"]] = {"organic": (0.0, 1.0)}
            else:
                out[r["event_id"]] = {
                    t: (wt, wt / total) for t, wt in s.items() if wt > 0.0
                }
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=st.lists(attrib_event, min_size=1, max_size=80))
def test_time_decay_attribution_matches_python_fold(spark, raw):
    from wistia_data_pipeline_project_spark.operators.timeseries import (
        time_decay_attribution,
    )

    rows = [
        {
            "event_id": i,
            "user_id": u,
            "ts": BASE + dt.timedelta(seconds=off),
            "event_type": typ,
        }
        for i, (u, off, typ) in enumerate(raw)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got: dict[int, dict] = {}
    for r in time_decay_attribution(df).collect():
        assert r["decay_overflow"] is False  # 12-day spans, 24h halflife
        got.setdefault(r["event_id"], {})[r["channel"]] = (
            r["weight"],
            r["credit"],
        )
    expected = _decay_fold(rows)
    assert set(got) == set(expected)
    for eid in expected:
        assert set(got[eid]) == set(expected[eid]), eid
        for ch, (wt, credit) in expected[eid].items():
            gw, gc = got[eid][ch]
            assert gw == pytest.approx(wt, rel=1e-9), (eid, ch)
            assert gc == pytest.approx(credit, rel=1e-9), (eid, ch)
        assert sum(c for _, c in got[eid].values()) == pytest.approx(1.0)


# --- time-series hyperfunction folds (round 7) -----------------------------

_hf_event = st.tuples(
    st.integers(min_value=1, max_value=3),            # key
    st.integers(min_value=0, max_value=3_000_000),    # offset seconds
    st.integers(min_value=0, max_value=99_999),       # value cents
    st.sampled_from(["a", "b", "c"]),                 # state
)


def _hf_rows(raw):
    return [
        (
            k,
            BASE.replace(tzinfo=None) + dt.timedelta(seconds=off),
            i,
            cents / 100.0,
            state,
        )
        for i, (k, off, cents, state) in enumerate(raw)
    ]


_HF_SCHEMA = (
    "user_id long, ts timestamp, event_id long, value double, "
    "event_type string"
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=st.lists(_hf_event, min_size=1, max_size=60))
def test_counter_delta_matches_python_fold(spark, raw):
    from wistia_data_pipeline_project_spark.operators.timeseries import (
        counter_delta,
    )

    rows = _hf_rows(raw)
    got = {
        r.user_id: (r.n_samples, r.n_resets, r.delta, r.first_reading,
                    r.last_reading)
        for r in counter_delta(
            spark.createDataFrame(rows, _HF_SCHEMA)
        ).collect()
    }
    keys = {r[0] for r in rows}
    assert set(got) == keys
    for k in keys:
        series = sorted(
            ((ts, eid, v) for (kk, ts, eid, v, _s) in rows if kk == k),
            key=lambda t: (t[0], t[1]),
        )
        delta = resets = 0
        prev = None
        for _, _, v in series:
            c = round(v * 100)
            if prev is not None:
                if c >= prev:
                    delta += c - prev
                else:
                    resets += 1
                    delta += c
            prev = c
        n, nr, d, first, last = got[k]
        assert n == len(series)
        assert nr == resets
        assert d == pytest.approx(delta / 100.0, abs=1e-9)
        assert first == pytest.approx(round(series[0][2] * 100) / 100.0)
        assert last == pytest.approx(round(series[-1][2] * 100) / 100.0)
        # counter sanity invariant: growth minus net change = reset mass
        assert d - (last - first) >= -1e-9


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=st.lists(_hf_event, min_size=1, max_size=60))
def test_state_durations_and_heartbeat_match_python_fold(spark, raw):
    from wistia_data_pipeline_project_spark.operators.timeseries import (
        heartbeat_uptime,
        state_durations,
    )

    rows = _hf_rows(raw)
    df = spark.createDataFrame(rows, _HF_SCHEMA)
    sd = {
        (r.user_id, r.event_type): (r.n_entries, r.held_us)
        for r in state_durations(df).collect()
    }
    hb = {
        r.user_id: (r.n_beats, r.uptime_us, r.n_islands, r.span_us)
        for r in heartbeat_uptime(df, tolerance_us=600_000_000).collect()
    }
    TOL = 600_000_000
    for k in {r[0] for r in rows}:
        series = sorted(
            ((ts, eid, s) for (kk, ts, eid, _v, s) in rows if kk == k),
            key=lambda t: (t[0], t[1]),
        )
        # state fold
        exp: dict[str, list[int]] = {}
        for i, (ts, _eid, s) in enumerate(series):
            ent = exp.setdefault(s, [0, 0])
            ent[0] += 1
            if i + 1 < len(series):
                ent[1] += int(
                    (series[i + 1][0] - ts).total_seconds() * 1_000_000
                )
        for s, (n_ent, held) in exp.items():
            assert sd[(k, s)] == (n_ent, held), (k, s)
        # state conservation: total held == closed span
        span_closed = int(
            (series[-1][0] - series[0][0]).total_seconds() * 1_000_000
        )
        assert sum(h for _, h in exp.values()) == span_closed
        # heartbeat fold
        uptime = islands = 0
        for i, (ts, _eid, _s) in enumerate(series):
            if i + 1 < len(series):
                gap = int(
                    (series[i + 1][0] - ts).total_seconds() * 1_000_000
                )
                uptime += min(gap, TOL)
                if gap > TOL:
                    islands += 1
            else:
                uptime += TOL
        assert hb[k] == (
            len(series),
            uptime,
            islands + 1,
            span_closed + TOL,
        ), k


@settings(max_examples=200, deadline=None)
@given(devs=st.lists(st.integers(min_value=-50, max_value=50),
                     min_size=1, max_size=40))
def test_cusum_closed_form_equals_recursion(devs):
    """The events_cusum_changepoint identity: the sequential CUSUM
    recursion S_t = max(0, S_{t-1} + y_t) equals the two-window
    closed form cum_t - min(0, running-min(cum)_t) at every t —
    what lets the entry run as stacked windows instead of a fold."""
    s = 0
    cums, lows, cum = [], [], 0
    low = 0
    for y in devs:
        s = max(0, s + y)
        cum += y
        low = min(low, cum)
        assert s == cum - min(0, low) == cum - low


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=st.lists(_hf_event, min_size=1, max_size=60))
def test_ewma_last_matches_python_fold(spark, raw):
    """ewma_last's truncated closed form tracks the sequential
    alpha=1/2 fold over per-day totals to within the declared 2^-24
    truncation error, and the picked columns are exact."""
    from wistia_data_pipeline_project_spark.operators.timeseries import (
        ewma_last,
    )

    rows = _hf_rows(raw)
    df = spark.createDataFrame(rows, _HF_SCHEMA)
    prepared = df.select(
        "user_id",
        F.date_trunc("DAY", F.col("ts")).alias("day"),
        (F.col("value").cast("decimal(12,2)") * 100)
        .cast("decimal(18,0)")
        .alias("cents"),
    )
    got = {
        r.user_id: (r.n_days, r.last_day, r.last_total, r.ewma)
        for r in ewma_last(prepared).collect()
    }
    # python fold over per-day cent totals
    daily: dict[int, dict[dt.date, int]] = {}
    for k, ts, _eid, v, _s in rows:
        daily.setdefault(k, {})[ts.date()] = (
            daily.get(k, {}).get(ts.date(), 0) + round(v * 100)
        )
    assert set(got) == set(daily)
    for k, per_day in daily.items():
        days = sorted(per_day)
        ewma = float(per_day[days[0]])
        for d in days[1:]:
            ewma = (ewma + per_day[d]) / 2.0
        n_days, last_day, last_total, got_ewma = got[k]
        assert n_days == len(days)
        assert last_day.date() == days[-1]
        assert last_total == per_day[days[-1]] / 100.0
        # provable truncation bound: dropped terms carry < 2^-24 of
        # the total day mass (<= 60 rows x 99999 cents -> < 7.2e-3
        # dollars); 2e-2 abs covers it with margin
        assert got_ewma == pytest.approx(ewma / 100.0, rel=1e-5, abs=2e-2)


def test_ewma_last_exact_branches(spark):
    """Unit fixture for the three weight branches: n=1 degenerate,
    full-weight short series, and the >24-halvings truncation."""
    from wistia_data_pipeline_project_spark.operators.timeseries import (
        ewma_last,
    )

    T = dt.datetime
    rows = (
        # key 1: single day -> ewma == the day's total
        [(1, T(2024, 1, 1), 100_00)]
        # key 2: two days -> exact halves
        + [(2, T(2024, 1, 1), 100_00), (2, T(2024, 1, 2), 300_00)]
        # key 3: 26 days; day 1 sits 25 halvings back -> weight 0
        + [(3, T(2024, 1, 1), 77_00)]
        + [(3, T(2024, 1, 1 + i), 0) for i in range(1, 25)]
        + [(3, T(2024, 1, 26), 400_00)]
    )
    df = spark.createDataFrame(rows, "user_id long, day timestamp, cents long")
    prepared = df.select(
        "user_id", "day", F.col("cents").cast("decimal(18,0)").alias("cents")
    )
    got = {r.user_id: r for r in ewma_last(prepared).collect()}
    assert got[1].ewma == 100.0 and got[1].n_days == 1
    assert got[2].ewma == 200.0  # 100/2 + 300/2
    # key 3: day-1 weight truncated to zero; remaining mass is the
    # final day's half: 400/2 = 200 exactly (zeros elsewhere)
    assert got[3].n_days == 26
    assert got[3].ewma == 200.0
    assert got[3].last_total == 400.0


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    obs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),      # user
            st.integers(min_value=0, max_value=29),     # day offset
            st.integers(min_value=-10**6, max_value=10**6),  # cents
        ),
        min_size=1,
        max_size=60,
    )
)
def test_holt_fold_matches_float_reference(spark, obs):
    """The exact-integer Holt fold agrees with a naive float
    recurrence to quantization tolerance (1 micro-dollar + float
    drift), and n_used never exceeds the declared window."""
    from decimal import Decimal as D

    from wistia_data_pipeline_project_spark.operators.timeseries import (
        HOLT_MAX_OBS,
        holt_linear,
    )

    rows = [
        (u, dt.datetime(2024, 1, 1) + dt.timedelta(days=d), D(c))
        for u, d, c in obs
    ]
    df = spark.createDataFrame(
        rows, "user_id long, day timestamp, cents decimal(18,0)"
    )
    out = {
        r["user_id"]: r
        for r in holt_linear(df, "user_id", "day", "cents").collect()
    }
    # float reference over per-(user, day) summed cents
    daily: dict = {}
    for u, d, c in obs:
        daily[(u, d)] = daily.get((u, d), 0) + c
    by_user: dict = {}
    for (u, d), x in sorted(daily.items()):
        by_user.setdefault(u, []).append(x)
    for u, xs in by_user.items():
        xs = xs[-HOLT_MAX_OBS:]
        l, b = float(xs[0]), 0.0
        for x in xs[1:]:
            l_new = (x + l + b) / 2.0
            b = (l_new - l) / 2.0 + b / 2.0
            l = l_new
        r = out[u]
        assert r["n_used"] == len(xs) <= HOLT_MAX_OBS
        assert r["level"] == pytest.approx(l / 100.0, abs=2e-6, rel=1e-9)
        assert r["trend"] == pytest.approx(b / 100.0, abs=2e-6, rel=1e-9)
        assert r["forecast"] == pytest.approx(
            (l + b) / 100.0, abs=4e-6, rel=1e-9
        )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),       # user
            st.integers(min_value=0, max_value=3 * 86400 - 1),  # second
        ),
        min_size=1,
        max_size=50,
    )
)
def test_session_concurrency_matches_brute_force(spark, evs, tmp_path):
    """The two-level sweep equals a brute-force per-microsecond-free
    reference: sessions rebuilt in Python (30-min gap), clipped
    half-open to days, peak computed by sorting raw boundary events —
    starts before ends at equal instants."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from wistia_data_pipeline_project_spark.plans import QUERIES

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, u, base + dt.timedelta(seconds=s))
        for i, (u, s) in enumerate(evs)
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = str(tmp_path)
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    got = {
        r["day"]: r
        for r in QUERIES["events_session_concurrency"](spark, d).collect()
    }

    # Python reference
    DAY = 86400 * 10**6
    per_user: dict = {}
    for _, u, ts in rows:
        per_user.setdefault(u, []).append(
            int((ts - dt.datetime(1970, 1, 1)).total_seconds() * 10**6)
        )
    segs = []  # (day, cs, ce)
    for u, tss in per_user.items():
        tss.sort()
        start = prev = tss[0]
        sess = []
        for t in tss[1:]:
            if t - prev > 1800 * 10**6:
                sess.append((start, prev))
                start = t
            prev = t
        sess.append((start, prev))
        for s, e in sess:
            for day in range(s // DAY, e // DAY + 1):
                cs = max(s, day * DAY)
                ce = min(e + 1, (day + 1) * DAY)
                if ce > cs:
                    segs.append((day, cs, ce, u))
    days = sorted({x[0] for x in segs})
    for day in days:
        evs_d = []
        busy = 0
        users = set()
        n_sess = 0
        for dd, cs, ce, u in segs:
            if dd != day:
                continue
            evs_d.append((cs, 0))   # start sorts before end at equal t
            evs_d.append((ce, 1))
            busy += ce - cs
            users.add(u)
            n_sess += 1
        evs_d.sort()
        run = peak = 0
        for _, kind in evs_d:
            run += 1 if kind == 0 else -1
            peak = max(peak, run)
        key = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=day * DAY)
        r = got[key]
        assert r["peak_concurrent"] == peak, (day, evs_d)
        assert r["n_sessions"] == n_sess
        assert r["n_users"] == len(users)
        assert r["busy_seconds"] == pytest.approx(busy / 1e6)
    assert len(got) == len(days)
