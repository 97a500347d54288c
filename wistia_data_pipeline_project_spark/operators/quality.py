"""Data-quality expectations (the dbt-test / Great-Expectations-style
contract layer the reference lacks entirely — its only validation is
dropping rows with missing keys at transform time,
``/root/reference/process_wistia_data_v2.py:374``).

Each expectation is declarative and returns one report row
(name, passed, metric, threshold, n_rows); ``run_expectations``
evaluates a suite and returns the report as a DataFrame so it can be
persisted next to the load (the audit trail a warehouse pipeline
ships with).

Scale notes: ``not_null`` / ``accepted_values`` / ``bounds`` fold into
ONE aggregate pass over a single scan (they are all conditional
counts); ``unique`` adds one map-side-combinable distinct aggregate;
``references`` is a broadcast-or-shuffle anti-join counting orphans.
Nothing collects row-level data to the driver — only the scalar
metrics move.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    name: str
    kind: str
    params: dict = field(default_factory=dict)


def not_null(col: str, max_null_frac: float = 0.0) -> Expectation:
    """At most ``max_null_frac`` of rows may be NULL in ``col``."""
    return Expectation(
        f"not_null({col})", "not_null", {"col": col, "max": max_null_frac}
    )


def accepted_values(col: str, values: list) -> Expectation:
    """Every non-NULL value of ``col`` is in ``values``. An empty
    ``values`` list is rejected here, at suite-build time — deferring
    it would surface as an opaque ``isin()`` expression error mid-run
    (and "no value is acceptable" is almost always a caller bug)."""
    if not values:
        raise ValueError(
            f"accepted_values({col!r}): values list is empty — every "
            "non-NULL row would fail; pass the allowed values"
        )
    return Expectation(
        f"accepted_values({col})", "accepted_values", {"col": col, "values": values}
    )


def bounds(col: str, lo: float | None = None, hi: float | None = None) -> Expectation:
    """Every non-NULL value of ``col`` lies in [lo, hi] (either side
    optional)."""
    return Expectation(f"bounds({col})", "bounds", {"col": col, "lo": lo, "hi": hi})


def unique(cols: list[str] | str) -> Expectation:
    """``cols`` form a unique key (no duplicate combinations)."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    return Expectation(f"unique({','.join(cols)})", "unique", {"cols": cols})


def references(col: str, dim: DataFrame, dim_key: str) -> Expectation:
    """Referential integrity: every non-NULL ``col`` exists in
    ``dim[dim_key]`` (no orphan facts)."""
    return Expectation(
        f"references({col}->{dim_key})",
        "references",
        {"col": col, "dim": dim, "dim_key": dim_key},
    )


def freshness(ts_col: str, as_of, max_lag_hours: float) -> Expectation:
    """Data freshness: ``max(ts_col)`` is within ``max_lag_hours`` of
    ``as_of`` (an explicit datetime — never wall-clock, so the check
    is deterministic and replayable; callers pass the scheduler's
    logical run time). Metric = observed lag in hours; an empty or
    all-NULL column fails (infinite lag), because "no data at all" is
    the staleness incident this check exists to page on."""
    return Expectation(
        f"freshness({ts_col})",
        "freshness",
        {"col": ts_col, "as_of": as_of, "max": float(max_lag_hours)},
    )


def _frac(cond: Column) -> Column:
    return F.sum(F.when(cond, 1).otherwise(0)).cast("double") / F.count(F.lit(1))


def run_expectations(df: DataFrame, suite: list[Expectation]) -> DataFrame:
    """Evaluate a suite; returns (name, passed, metric, threshold,
    n_rows) per expectation, IN SUITE ORDER (callers may zip the
    report against their suite). Single-pass expectations share one
    aggregate job; unique/references each add one.
    """
    spark = df.sparkSession
    n_rows = F.count(F.lit(1))

    # one shared aggregation for the per-row predicates
    agg_cols, meta = [], []
    for idx, e in enumerate(suite):
        if e.kind == "not_null":
            agg_cols.append(_frac(F.col(e.params["col"]).isNull()))
            meta.append((idx, e, float(e.params["max"])))
        elif e.kind == "accepted_values":
            c = F.col(e.params["col"])
            bad = c.isNotNull() & ~c.isin(*e.params["values"])
            agg_cols.append(_frac(bad))
            meta.append((idx, e, 0.0))
        elif e.kind == "bounds":
            c = F.col(e.params["col"])
            lo, hi = e.params["lo"], e.params["hi"]
            bad = F.lit(False)
            if lo is not None:
                bad = bad | (c < F.lit(lo))
            if hi is not None:
                bad = bad | (c > F.lit(hi))
            agg_cols.append(_frac(c.isNotNull() & bad))
            meta.append((idx, e, 0.0))
    by_idx: dict[int, tuple] = {}
    if agg_cols:
        vals = df.agg(
            n_rows.alias("_n"), *[c.alias(f"_m{i}") for i, c in enumerate(agg_cols)]
        ).collect()[0]
        total = vals["_n"]
        for i, (idx, e, thresh) in enumerate(meta):
            metric = float(vals[f"_m{i}"] or 0.0)
            by_idx[idx] = (e.name, metric <= thresh, metric, thresh, total)
    else:
        total = df.count()

    for idx, e in enumerate(suite):
        if e.kind == "unique":
            cols = e.params["cols"]
            r = df.agg(
                n_rows.alias("_n"),
                F.count_distinct(*[F.col(c) for c in cols]).alias("_d"),
                F.sum(
                    F.when(
                        F.greatest(*[F.col(c).isNull() for c in cols])
                        if len(cols) > 1
                        else F.col(cols[0]).isNull(),
                        1,
                    ).otherwise(0)
                ).alias("_nulls"),
            ).collect()[0]
            # count_distinct skips NULL combos; compare against the
            # non-NULL row count so NULLs don't read as duplicates
            dupes = (r["_n"] - r["_nulls"]) - r["_d"]
            by_idx[idx] = (e.name, dupes == 0, float(dupes), 0.0, r["_n"])
        elif e.kind == "freshness":
            # collect the max as EPOCH MICROS, not a datetime: Spark
            # renders a collected TimestampType in the DRIVER's OS
            # timezone as a NAIVE datetime, so tz-normalizing it
            # driver-side silently skews the lag by the host's UTC
            # offset on non-UTC hosts. unix_micros is tz-unambiguous.
            r = df.agg(
                F.max(F.unix_micros(F.col(e.params["col"]))).alias("_mx")
            ).collect()[0]
            as_of = e.params["as_of"]
            if r["_mx"] is None:
                lag_h = float("inf")
            else:
                import datetime as _dt

                # a naive as_of is treated as UTC (the engine-wide
                # convention); an aware one converts exactly
                if getattr(as_of, "tzinfo", None) is None:
                    as_of = as_of.replace(tzinfo=_dt.timezone.utc)
                as_of_us = as_of.timestamp() * 1_000_000.0
                lag_h = (as_of_us - r["_mx"]) / 3_600_000_000.0
            by_idx[idx] = (
                e.name,
                lag_h <= e.params["max"],
                lag_h,
                e.params["max"],
                total,
            )
        elif e.kind == "references":
            col, dim, dim_key = (
                e.params["col"],
                e.params["dim"],
                e.params["dim_key"],
            )
            orphans = (
                df.select(F.col(col).alias("_k"))
                .filter(F.col("_k").isNotNull())
                .join(
                    dim.select(F.col(dim_key).alias("_k")).distinct(),
                    "_k",
                    "left_anti",
                )
                .count()
            )
            by_idx[idx] = (e.name, orphans == 0, float(orphans), 0.0, total)

    return spark.createDataFrame(
        [by_idx[i] for i in sorted(by_idx)],
        "name string, passed boolean, metric double, threshold double, n_rows long",
    )
