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


def test_chunk_text_udtf_matches_dataframe_chunker(spark, sf_dir):
    from wistia_data_pipeline_project_spark.operators import training as TR
    from wistia_data_pipeline_project_spark.plans.sql import register_udtfs
    from wistia_data_pipeline_project_spark.sources.io import load_table

    register_udtfs(spark)
    docs = load_table(spark, sf_dir, "documents").limit(50)
    docs.createOrReplaceTempView("_udtf_docs")

    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
        for r in spark.sql(
            """
            SELECT d.doc_id, c.chunk_id, c.n_tokens, c.chunk_text
            FROM _udtf_docs d, LATERAL chunk_text(d.text, 64, 16) c
            """
        ).collect()
    }
    want = {
        (r["doc_id"], r["chunk_idx"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in TR.chunk_documents(
            docs, budget=64, overlap=16, with_text=True
        ).collect()
    }
    assert set(got) == set(want)
    for k, (n, txt) in got.items():
        assert want[k][1] == txt, k
