"""SQL surface: the same engine via ``spark.sql``.

The reference's only declarative query ships to BigQuery as a string
(``/root/reference/process_wistia_data_v2.py:140-150``); here the
entire table space is queryable in ANSI SQL in-process. Register the
driver tables as temp views once, then any catalog-equivalent SQL runs
through the same Catalyst planner and scan layer (same pushdown, same
broadcast decisions) as the DataFrame API — they compile to identical
physical plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.io import load_table

DRIVER_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every driver table as a temp view (schema-enforced,
    same loaders as the DataFrame path — events ts normalization and
    spread() apply identically)."""
    for name in DRIVER_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, query: str) -> DataFrame:
    return spark.sql(query)
