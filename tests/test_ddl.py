"""K5 DDL surface: idempotent database/table provisioning
(reference create_bigquery_tables parity — VERDICT r01 item 7)."""

from __future__ import annotations

import pytest

from wistia_data_pipeline_project_spark.sources.ddl import (
    WAREHOUSE_TABLES,
    provision_warehouse,
    schema_to_ddl,
)
from wistia_data_pipeline_project_spark.schemas import DIM_MEDIA_SCHEMA

DB = "wistia_ddl_test"


@pytest.fixture()
def warehouse(spark, tmp_path):
    yield str(tmp_path / "wh")
    spark.sql(f"DROP DATABASE IF EXISTS {DB} CASCADE")


def test_schema_to_ddl_renders_all_columns():
    ddl = schema_to_ddl(DIM_MEDIA_SCHEMA)
    for f in DIM_MEDIA_SCHEMA.fields:
        assert f"`{f.name}`" in ddl
    assert "timestamp" in ddl and "double" in ddl


def test_provision_creates_then_noops(spark, warehouse):
    first = provision_warehouse(spark, DB, warehouse)
    assert first == {DB: True, "dim_media": True, "dim_visitor": True, "fact_media_engagement": True}

    # data written between calls must survive re-provisioning
    spark.sql(
        f"""INSERT INTO {DB}.dim_media VALUES
        ('m1', 1, 'title', 'Video', TIMESTAMP '2025-01-01 00:00:00',
         TIMESTAMP '2025-01-02 00:00:00', 12.5, 'desc', 7, 'proj', NULL,
         TIMESTAMP '2025-01-03 00:00:00')"""
    )
    spark.sql(
        f"""INSERT INTO {DB}.fact_media_engagement
        (media_id, visitor_id, date, play_count, total_watch_time,
         max_percent_viewed, play_rate, event_timestamp, ip, country,
         ingestion_timestamp) VALUES
        ('m1', 'v1', DATE '2025-01-01', 2, 10.0, 0.8, 0.5,
         TIMESTAMP '2025-01-01 01:00:00', '10.0.0.1', 'US',
         TIMESTAMP '2025-01-03 00:00:00')"""
    )

    second = provision_warehouse(spark, DB, warehouse)
    assert second == {DB: False, "dim_media": False, "dim_visitor": False, "fact_media_engagement": False}
    assert spark.table(f"{DB}.dim_media").count() == 1
    assert spark.table(f"{DB}.fact_media_engagement").count() == 1


def test_fact_table_is_date_partitioned(spark, warehouse):
    provision_warehouse(spark, DB, warehouse)
    desc = spark.sql(f"DESCRIBE TABLE {DB}.fact_media_engagement").collect()
    lines = [r.col_name for r in desc]
    assert "# Partition Information" in lines
    assert lines[lines.index("# Partition Information") + 2] == "date"
    # every declared table exists with its full column set
    for name, (schema, _) in WAREHOUSE_TABLES.items():
        cols = {f.name for f in spark.table(f"{DB}.{name}").schema.fields}
        assert cols == {f.name for f in schema.fields}
