"""One-slot-per-path lazy checkpoint cache — the shared bookkeeping
behind the scored-pair checkpoints (`catalog_docs._jaccard_pairs_cached`,
`catalog_emb._knn_pairs_cached`).

A slot is keyed by the corpus file path and validated on
(applicationId, mtime_ns, size): a fresh Spark context (whose
executors no longer hold the old checkpoint blocks) never sees a
stale handle, a regenerated corpus recomputes, and either mismatch
REPLACES the path's single slot — the cache stays bounded by live
corpora instead of accumulating dead py4j plan handles.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from wistia_data_pipeline_project_spark.ckpt import spill_checkpoint


def cached_pair_checkpoint(
    spark: SparkSession,
    path: str,
    cache: dict[str, tuple[tuple, DataFrame]],
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the cached lazily-localCheckpointed DataFrame for
    ``path``, (re)building via ``build()`` when the slot is missing or
    stale. An unstattable path (OSError) disables caching for the
    call — the build still runs, nothing is stored."""
    try:
        st = os.stat(path)
        meta = (spark.sparkContext.applicationId, st.st_mtime_ns, st.st_size)
    except OSError:
        meta = None
    if meta is not None:
        cached = cache.get(path)
        if cached is not None and cached[0] == meta:
            return cached[1]
    # scored-pair tables scale with the corpus: serialized spill-
    # friendly storage, not deserialized heap rows (SCALE.md r07 —
    # this checkpoint is what wanted a 48g JVM at sf3).
    # EAGER (r11): a lazy slot leaves the RDD's size stats unknown
    # until some consumer acts, so join-strategy selection (SHJ vs
    # SMJ under preferSortMergeJoin=false) flipped with CONSUMER
    # ORDER — the plan pins caught docs_triangle_stats planning SMJ
    # cold and SHJ after any CC entry had materialized the slot.
    # Materializing at first build makes every consumer plan against
    # the same (known) stats; the job itself ran anyway on the first
    # consuming action.
    df = spill_checkpoint(build(), eager=True)
    if meta is not None:
        cache[path] = (meta, df)
    return df
