"""Data-quality expectation suite tests: passing contracts on the
driver tables, planted violations, NULL-handling edge cases."""

from __future__ import annotations

from wistia_data_pipeline_project_spark.operators import quality as Q
from wistia_data_pipeline_project_spark.sources.io import load_table


def report(df, suite):
    return {r["name"]: r for r in Q.run_expectations(df, suite).collect()}


def test_driver_tables_pass_their_contracts(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    rep = report(
        events,
        [
            Q.not_null("event_id"),
            Q.not_null("user_id", max_null_frac=0.2),
            Q.unique("event_id"),
            Q.bounds("value", lo=None, hi=1e9),
        ],
    )
    assert all(r["passed"] for r in rep.values()), rep
    rep2 = report(
        orders,
        [
            Q.unique("o_orderkey"),
            Q.references("o_custkey", customer, "c_custkey"),
            Q.accepted_values("o_orderstatus", ["P", "O", "F"]),
        ],
    )
    assert all(r["passed"] for r in rep2.values()), rep2


def test_planted_violations_fail(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (1, "b", -2.0), (3, None, 50.0)],
        "id long, name string, v double",
    )
    dim = spark.createDataFrame([(1,)], "id long")
    rep = report(
        df,
        [
            Q.unique("id"),  # id=1 twice
            Q.not_null("name"),  # one NULL of three
            Q.bounds("v", lo=0.0, hi=10.0),  # -2 and 50 out of bounds
            Q.accepted_values("name", ["a"]),  # "b" not accepted
            Q.references("id", dim, "id"),  # id=3 orphan
        ],
    )
    assert not rep["unique(id)"]["passed"] and rep["unique(id)"]["metric"] == 1.0
    assert not rep["not_null(name)"]["passed"]
    assert abs(rep["not_null(name)"]["metric"] - 1 / 3) < 1e-12
    assert not rep["bounds(v)"]["passed"]
    assert abs(rep["bounds(v)"]["metric"] - 2 / 3) < 1e-12
    assert not rep["accepted_values(name)"]["passed"]
    assert not rep["references(id->id)"]["passed"]
    assert rep["references(id->id)"]["metric"] == 1.0


def test_nulls_do_not_count_as_duplicates_or_orphans(spark):
    df = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), (7, 3.0)], "k long, v double"
    )
    dim = spark.createDataFrame([(7,)], "k long")
    rep = report(df, [Q.unique("k"), Q.references("k", dim, "k")])
    assert rep["unique(k)"]["passed"]  # two NULL keys are not dupes
    assert rep["references(k->k)"]["passed"]  # NULLs are not orphans


def test_freshness_expectation(spark):
    import datetime as dt

    from wistia_data_pipeline_project_spark.operators.quality import (
        freshness,
        run_expectations,
    )

    base = dt.datetime(2024, 1, 30, 12, 0, 0)
    df = spark.createDataFrame(
        [(1, base), (2, base - dt.timedelta(days=3))], "id long, ts timestamp"
    )
    as_of = base + dt.timedelta(hours=5)
    # max(ts) is 5h behind as_of: passes the 6h SLA, fails the 4h one
    r6 = run_expectations(df, [freshness("ts", as_of, 6.0)]).collect()[0]
    r4 = run_expectations(df, [freshness("ts", as_of, 4.0)]).collect()[0]
    assert r6["passed"] is True and abs(r6["metric"] - 5.0) < 1e-9
    assert r4["passed"] is False

    empty = spark.createDataFrame([], "id long, ts timestamp")
    re_ = run_expectations(empty, [freshness("ts", as_of, 1e9)]).collect()[0]
    assert re_["passed"] is False and re_["metric"] == float("inf")


def test_freshness_converts_aware_as_of_to_utc(spark):
    import datetime as dt

    from wistia_data_pipeline_project_spark.operators.quality import (
        freshness,
        run_expectations,
    )

    mx = dt.datetime(2024, 1, 30, 11, 30, 0)  # stored as UTC
    df = spark.createDataFrame([(1, mx)], "id long, ts timestamp")
    # 17:00 at UTC+5 == 12:00 UTC -> true lag 0.5h (a tz-strip bug
    # would read 5.5h and fail the 1h SLA)
    tz5 = dt.timezone(dt.timedelta(hours=5))
    as_of = dt.datetime(2024, 1, 30, 17, 0, tzinfo=tz5)
    r = run_expectations(df, [freshness("ts", as_of, 1.0)]).collect()[0]
    assert r["passed"] is True and abs(r["metric"] - 0.5) < 1e-9
