"""SQL-API parity: a catalog query expressed in spark.sql over the
registered views must return exactly the DataFrame API's result (they
share the planner, so this pins the view layer, not luck)."""

from __future__ import annotations

from wistia_data_pipeline_project_spark.plans import QUERIES
from wistia_data_pipeline_project_spark.plans.sql import register_views, sql

SF_DIR = "/root/testdata/sf0.001"

Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def test_sql_view_parity_q1(spark):
    register_views(spark, SF_DIR)
    got = {
        (r["l_returnflag"], r["l_linestatus"]): (
            r["sum_qty"],
            r["sum_base_price"],
            r["count_order"],
        )
        for r in sql(spark, Q1_SQL).collect()
    }
    want_rows = QUERIES["q1_pricing_summary"](spark, SF_DIR).collect()
    want = {
        (r["l_returnflag"], r["l_linestatus"]): (
            r["sum_qty"],
            r["sum_base_price"],
            r["count_order"],
        )
        for r in want_rows
    }
    assert got == want


def test_sql_join_pushdown_plan(spark):
    """The SQL path goes through the same scan layer: a filtered SQL
    join over views must show parquet filter pushdown and a broadcast
    join, exactly like the DataFrame plans."""
    register_views(spark, SF_DIR)
    df = sql(
        spark,
        """
        SELECT n.n_name, COUNT(*) AS n_customers
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal > 0
        GROUP BY n.n_name
        """,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert df.count() > 0
