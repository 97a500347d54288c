"""Golden tests for the v0 pipeline generation: nested event shape
adapter + per-event fact (VERDICT r01 missing items 1-2)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from wistia_data_pipeline_project_spark.operators.dims import transform_media_data
from wistia_data_pipeline_project_spark.operators.fact import fact_media_engagement
from wistia_data_pipeline_project_spark.operators.fact_v0 import (
    V0_EVENT_SCHEMA,
    fact_media_engagement_v0,
    normalize_events,
)
from wistia_data_pipeline_project_spark.schemas import (
    WISTIA_MEDIA_SCHEMA,
    nullable_copy,
)

from tests.wistia_fixtures import (
    RUN_TS,
    golden_fact_v0,
    make_media,
    make_nested_events,
)

MEDIA = make_media()
NESTED = make_nested_events(MEDIA)


@pytest.fixture(scope="module")
def media_df(spark):
    return spark.createDataFrame(MEDIA, nullable_copy(WISTIA_MEDIA_SCHEMA))


@pytest.fixture(scope="module")
def nested_df(spark):
    return spark.createDataFrame(NESTED, V0_EVENT_SCHEMA)


@pytest.fixture(scope="module")
def dim_media(media_df):
    return transform_media_data(media_df, RUN_TS)


def _key(ts, mid, vis, pc, wt):
    return (
        ts,
        mid,
        vis if vis is not None else "",
        pc if pc is not None else -1,
        round(wt, 6) if wt is not None else -1.0,
    )


def test_fact_v0_matches_golden(spark, nested_df, dim_media):
    got = fact_media_engagement_v0(nested_df, dim_media).collect()
    want = golden_fact_v0(NESTED, MEDIA)
    assert len(got) == len(want)
    gset = sorted(
        _key(
            r.event_timestamp,
            r.media_hashed_id,
            r.visitor_id,
            r.play_count,
            r.total_watch_time,
        )
        for r in got
    )
    wset = sorted(
        _key(
            w["event_timestamp"].replace(tzinfo=None),
            w["media_hashed_id"],
            w["visitor_id"],
            w["play_count"],
            w["total_watch_time"],
        )
        for w in want
    )
    assert gset == wset
    # play_rate is never computable in v0
    assert all(r.play_rate is None for r in got)


def test_v0_unknown_media_gets_no_watch_time(spark, nested_df, dim_media):
    ghost = (
        fact_media_engagement_v0(nested_df, dim_media)
        .filter(F.col("media_hashed_id") == "ghost_med")
        .collect()
    )
    assert ghost, "unknown media rows are kept (only ts/media-id gate drops)"
    assert all(r.total_watch_time is None for r in ghost)


def test_normalize_nested_feeds_v2_fact(spark, nested_df, dim_media):
    """The adapter lifts the nested feed onto the flat column set, so
    the v2 aggregated fact runs unchanged on the v0 source."""
    flat = normalize_events(nested_df, "nested")
    fact = fact_media_engagement(flat, dim_media, RUN_TS)
    rows = fact.collect()
    assert rows
    # grain holds and null keys were dropped
    assert len(rows) == len({(r.media_id, r.visitor_id, r.date) for r in rows})
    assert all(r.media_id is not None and r.visitor_id is not None for r in rows)
    # engagement flowed through as percent_viewed: some group saw progress
    assert any(r.max_percent_viewed > 0 for r in rows)


def test_normalize_flat_is_identity(spark, nested_df):
    assert normalize_events(nested_df, "flat") is nested_df
    with pytest.raises(ValueError):
        normalize_events(nested_df, "wide")


def test_normalize_plan_is_narrow(spark, nested_df, dim_media):
    """v0 fact must stay shuffle-free: projection + broadcast join."""
    plan = fact_media_engagement_v0(nested_df, dim_media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
