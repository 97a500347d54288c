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
