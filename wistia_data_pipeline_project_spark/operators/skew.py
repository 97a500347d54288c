"""Skew mitigation: two-stage salted aggregation.

AQE's skew-join splitting handles join-side skew automatically
(session default, session.py); this module covers the aggregation
side: when one group key carries a disproportionate share of rows
(the hot video / hot visitor case, SURVEY §4), a single reducer
owns the hot key. Salting shards each key into ``buckets``
sub-groups for the first (map-heavy) aggregation, then merges the
shards in a second, tiny aggregation keyed on the real key.

Only algebraic aggregates decompose this way (sum/count/min/max —
merge(partials) == agg(all)); averages are derived as sum/count at
the merge step. The salt is a deterministic hash of a
caller-provided spread column (a unique id spreads perfectly), so
runs are reproducible.

Scale: stage 1 shuffles (key, salt) — the hot key's rows land on
``buckets`` reducers instead of one; stage 2 shuffles ``buckets``
rows per key. Cost for non-skewed keys is one extra tiny shuffle;
the win for a hot key is ~buckets× reducer parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wistia_data_pipeline_project_spark.ckpt import spill_checkpoint

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}
_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(c),
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column | str]],
    spread_col: str | Column = None,
    buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-resistant groupBy.

    ``aggs``: output name → (kind, column) with kind in
    sum/count/min/max. ``spread_col``: column whose hash salts the
    key (default: all of the aggregated columns — prefer a unique id).
    """
    for kind, _ in aggs.values():
        if kind not in _PARTIAL:
            raise ValueError(f"non-algebraic aggregate {kind!r} cannot be salted")
    if spread_col is None:
        agg_cols = [
            F.col(c) if isinstance(c, str) else c for _, c in aggs.values()
        ]
        spread_col = F.concat_ws("\x00", *[c.cast("string") for c in agg_cols])
    salt = F.pmod(F.xxhash64(spread_col), F.lit(buckets)).alias("_salt")
    stage1 = df.groupBy(*keys, salt).agg(
        *[_PARTIAL[kind](c).alias(f"_p_{out}") for out, (kind, c) in aggs.items()]
    )
    return stage1.groupBy(*keys).agg(
        *[_MERGE[kind](f"_p_{out}").alias(out) for out, (kind, _) in aggs.items()]
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    mult: float = 2.0,
) -> DataFrame:
    """EXACT heavy hitters (keys with ≥ ``mult``× the average key
    frequency) via the two-pass candidate scheme — sketch economics
    with exact output.

    Pass 1 aggregates (partition, key) partial counts (map-side
    combinable, one shuffle) and keeps keys that are locally heavy:
    by pigeonhole, a globally heavy key (count ≥ mult·N/U over U
    distinct keys) must have local share ≥ mult/U in at least one
    partition, so the candidate set has NO false negatives. Pass 2
    exactly re-counts ONLY the (tiny, broadcast) candidate set and
    applies the global threshold — false positives die here, making
    the output exactly equal to the full groupBy + HAVING answer.

    At 100 TB the win over the naive form: the full groupBy shuffles
    every distinct key; this shuffles partial counts once, then
    re-counts a candidate set of at most ~U/mult keys with a
    broadcast semi-join — the second shuffle carries only candidate
    rows. Deterministic output for ANY partitioning (only the
    candidate set varies; pass 2 is exact).
    """
    pid = F.spark_partition_id().alias("_pid")
    local = (
        df.select(pid, key_col)
        .groupBy("_pid", key_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # pass-1 result feeds 3 consumers; serialized spill level —
    # the table scales with distinct keys x partitions
    local = spill_checkpoint(local, eager=True)
    totals = local.groupBy("_pid").agg(F.sum("_c").alias("_n"))
    stats = local.agg(
        F.countDistinct(key_col).alias("_u"), F.sum("_c").alias("_N")
    )
    cands = (
        local.join(F.broadcast(totals), "_pid")
        .crossJoin(F.broadcast(stats.select("_u")))
        # compare in double: _c * _u as longs can overflow under ANSI
        # at extreme (count × cardinality) scales
        .filter(
            F.col("_c").cast("double")
            >= F.lit(mult) * F.col("_n") / F.col("_u")
        )
        .select(key_col)
        .distinct()
    )
    # left_semi on the bare key would drop a NULL key group (equi-join
    # never matches NULL), hiding what is often the heaviest real-world
    # shuffle key; null-safe equality keeps it diagnosable
    return (
        df.select(key_col)
        .join(
            F.broadcast(cands.withColumnRenamed(key_col, "_cand_key")),
            F.col(key_col).eqNullSafe(F.col("_cand_key")),
            "left_semi",
        )
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .crossJoin(F.broadcast(stats))
        .filter(
            F.col("n_events") >= F.lit(mult) * F.col("_N") / F.col("_u")
        )
        .select(key_col, "n_events")
    )
