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


def register_udtfs(spark: SparkSession) -> None:
    """Register the engine's Python UDTFs (Spark 4 table functions) so
    SQL users can lateral-join row-expanding logic:

    - ``chunk_text(text, window, overlap)`` — the context-window
      chunker (``training.chunk_documents`` semantics) as a SQL table
      function: one row per chunk with (chunk_id, n_tokens,
      chunk_text).

    UDTFs evaluate row-at-a-time in Python — this is a SQL-surface
    convenience for exploration and small tables, NOT the 100 TB path;
    the DataFrame operator (pure codegen slice/transform) is the scale
    implementation, and tests assert both agree.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id int, n_tokens int, chunk_text string")
    class ChunkText:
        def eval(self, text: str, window: int = 64, overlap: int = 16):
            if text is None:
                # match chunk_documents on NULL text: one chunk row
                # with NULL token count and NULL text
                yield 0, None, None
                return
            toks = text.split()
            if not toks:
                # match chunk_documents: every doc yields >= 1 chunk
                yield 0, 0, ""
                return
            step = max(window - overlap, 1)
            i = 0
            cid = 0
            while True:
                chunk = toks[i : i + window]
                yield cid, len(chunk), " ".join(chunk)
                if i + window >= len(toks):
                    break
                i += step
                cid += 1

    spark.udtf.register("chunk_text", ChunkText)
