"""Gates for the scalable quantile-boundary variants (VERDICT r06
item 1): each banded entry is checked against its exact-NTILE twin
and against an independent Python replay of the declared boundary
construction, so the no-global-sort plans provably compute the
documented semantics.
"""

from __future__ import annotations

import math

import pytest

from wistia_data_pipeline_project_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _disc_bound(sorted_vals, p):
    """percentile_disc: smallest value whose CDF reaches p —
    element at 1-based index ceil(p*n)."""
    n = len(sorted_vals)
    return sorted_vals[max(math.ceil(p * n), 1) - 1]


def _band(v, bounds):
    for i, b in enumerate(bounds, start=1):
        if v <= b:
            return i
    return len(bounds) + 1


def test_zipf_scalable_is_bit_identical_to_exact(spark):
    """The decomposed rank (per-cnt base offset + within-group
    row_number) is EXACT — same output tuple as the global-sort
    entry, bit for bit."""
    exact = QUERIES["docs_zipf_fit"](spark, SF).collect()
    scalable = QUERIES["docs_zipf_fit_scalable"](spark, SF).collect()
    assert len(exact) == len(scalable) == 1
    assert exact[0].asDict() == scalable[0].asDict()


def test_user_deciles_banded_matches_python_replay(spark):
    """Banded deciles = percentile_disc boundaries + range assign;
    replayed independently from the per-user totals in Python, and
    reconciled against the exact-NTILE twin (same user population,
    same total value mass)."""
    from wistia_data_pipeline_project_spark.plans.catalog_windows import (
        events_user_deciles,
        events_user_deciles_banded,
    )
    from wistia_data_pipeline_project_spark.plans.catalog import dec
    from wistia_data_pipeline_project_spark.sources.io import load_table
    import pyspark.sql.functions as F

    e = load_table(spark, SF, "events").filter(
        "user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL"
    )
    totals = [
        r.total
        for r in e.groupBy("user_id")
        .agg(F.sum(dec("value", 18, 2)).alias("total"))
        .collect()
    ]
    sv = sorted(totals)
    bounds = [_disc_bound(sv, i / 10) for i in range(1, 10)]
    want = {}
    for t in totals:
        d = _band(t, bounds)
        n, mn, mx, sm = want.get(d, (0, None, None, 0))
        want[d] = (
            n + 1,
            t if mn is None else min(mn, t),
            t if mx is None else max(mx, t),
            sm + t,
        )
    got = {
        r.decile: (r.n_users, r.min_total, r.max_total, r.sum_total)
        for r in events_user_deciles_banded(spark, SF).collect()
    }
    assert set(got) == set(want)
    for d in want:
        n, mn, mx, sm = want[d]
        assert got[d][0] == n
        assert got[d][1] == pytest.approx(float(mn))
        assert got[d][2] == pytest.approx(float(mx))
        assert got[d][3] == pytest.approx(float(sm))

    exact = {
        r.decile: r for r in events_user_deciles(spark, SF).collect()
    }
    assert sum(r.n_users for r in exact.values()) == sum(
        g[0] for g in got.values()
    )
    assert sum(r.sum_total for r in exact.values()) == pytest.approx(
        sum(g[3] for g in got.values())
    )
    # value ranges are ordered and non-overlapping across deciles
    ds = sorted(got)
    for a, b in zip(ds, ds[1:]):
        assert got[a][2] <= got[b][1]


def test_rfm_banded_matches_python_replay(spark):
    """Banded RFM scores are a pure function of the per-customer
    (recency-days, frequency, monetary) values via percentile_disc
    quintile boundaries — replayed independently in Python; combined
    cell consistency and same customer population as the exact twin."""
    from wistia_data_pipeline_project_spark.plans.catalog_windows import (
        orders_rfm_banded,
        orders_rfm_scores,
    )

    rows = orders_rfm_banded(spark, SF).collect()
    exact_rows = orders_rfm_scores(spark, SF).collect()
    assert {r.custkey for r in rows} == {r.custkey for r in exact_rows}

    # replay boundaries from the per-customer axes the entry outputs
    # (recency via last_order date — the entry computes integer days)
    r_days = sorted(
        (r.last_order.date() - __import__("datetime").date(1970, 1, 1)).days
        for r in rows
    )
    freqs = sorted(r.n_orders for r in rows)
    mons = sorted(r.monetary for r in rows)
    # literal fractions, NOT 0.2*i: the engines parse "0.6" (just
    # below 3/5) while 0.2*3 rounds just above it — a different p
    # flips ceil(p*n) when p*n is near-integer
    qs = (0.2, 0.4, 0.6, 0.8)
    rb = [_disc_bound(r_days, q) for q in qs]
    fb = [_disc_bound(freqs, q) for q in qs]
    mb = [_disc_bound(mons, q) for q in qs]
    for r in rows:
        days = (
            r.last_order.date() - __import__("datetime").date(1970, 1, 1)
        ).days
        assert r.r_score == _band(days, rb), r
        assert r.f_score == _band(r.n_orders, fb), r
        assert r.m_score == _band(r.monetary, mb), r
        assert r.rfm_cell == r.r_score * 100 + r.f_score * 10 + r.m_score


def test_banded_tie_semantics_micro(spark):
    """Boundary ties: ALL tied users land in the LOWER band (deciles
    are value ranges). 20 users with ten pairs of tied totals — every
    pair shares a decile, unlike exact NTILE which would split pairs
    at boundaries by the user_id tiebreak."""
    import datetime as dt

    from wistia_data_pipeline_project_spark.plans.catalog_windows import (
        events_user_deciles_banded,
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        rows = []
        ts = dt.datetime(2024, 1, 1)
        # users 2k and 2k+1 both have total = (k+1) * 10.00
        for k in range(10):
            for u in (2 * k, 2 * k + 1):
                rows.append((u, ts, u, float((k + 1) * 10)))
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, value double"
        )
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = {
            r.decile: r for r in events_user_deciles_banded(spark, d).collect()
        }
        # every decile holds exactly one tied PAIR: n=20 distinct
        # totals=10, boundaries at each value -> 10 bands of 2
        assert sorted(out) == list(range(1, 11))
        for d_ in out.values():
            assert d_.n_users == 2
            assert d_.min_total == d_.max_total


def test_user_deciles_approx_gate_on_all_distinct_domain(spark, tmp_path):
    """The GK-sketch variant (the REQUIRED swap past ~1e7 distinct
    totals) on a fully-distinct synthetic domain: every gate boolean
    must hold, the exact fields must match a Python replay, and each
    sketch boundary must sit within its declared rank band of the
    true sorted order."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 5000  # all-distinct per-user totals (one event per user)
    rng = np.random.RandomState(41)
    vals = np.round(rng.uniform(1, 10_000, n), 2)
    vals = np.unique(vals)  # drop accidental ties -> all distinct
    n = len(vals)
    ts = pd.Timestamp("2024-03-01 12:00:00")
    tbl = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([ts.to_pydatetime()] * n, pa.timestamp("us")),
        "user_id": pa.array(range(1, n + 1), pa.int64()),
        "event_type": pa.array(["view"] * n),
        "value": pa.array([float(v) for v in vals], pa.float64()),
        "props": pa.array(["{}"] * n),
    })
    sf_dir = str(tmp_path)
    pq.write_table(tbl, f"{sf_dir}/events.parquet")

    row = QUERIES["events_user_deciles_approx"](spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    assert r.n_users == n
    assert r.min_total == float(vals.min())
    assert r.max_total == float(vals.max())
    assert r.bounds_monotone and r.cum_ranks_in_band
