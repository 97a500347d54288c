"""Count-Min and Bloom sketches as first-class counter/bit TABLES.

The 100 TB frequency architecture, parallel to the HLL rollup
(`catalog_scalar.events_hll_rollup`): store one small sketch per
partition (day, shard, source), merge sketches instead of re-scanning
raw data, answer point frequency queries from the merged sketch. A
CMS here is a plain DataFrame of ``(group…, depth, bucket, cnt)``
rows — at most ``depth × width`` rows per group regardless of input
size — so "merge" is a SUM aggregation and the whole lifecycle stays
inside Catalyst: no binary blobs, no UDFs, map-side combinable.

Estimates carry the classic CMS guarantee: ``estimate >= true count``
always (each counter only ever over-counts), and over-count is
bounded by colliding keys' mass. Both sides of the guarantee are
deterministic given the hash, and the default ``md5_64`` hash is
engine-neutral (`dedup._token_hash64`), so a DuckDB oracle replays
the entire sketch bit-for-bit — the catalog entry hash-checks
estimates, not just structure.

The Bloom filter below is the MEMBERSHIP member of the same
architecture (HLL = distinct counts, CMS = frequencies, Bloom = set
membership): one bit-lane table per partition, merged by bitwise OR,
probed by a broadcast join. Its 100 TB job is semi-join reduction —
build a filter over the join keys actually present on the fact side,
broadcast the ≤ kB filter, and drop definite-miss rows from the other
input BEFORE any shuffle. One-sided like CMS: no false negatives,
deterministic false positives bounded by load factor.

No reference counterpart (the reference keeps exact Python dicts in
one process, e.g. ``process_wistia_data.py:313-361`` aggregation);
this is §2.13 extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# width must divide 2^16: the bucket is the low bits of the md5_64
# pattern, and the SQL oracle reconstructs only hex nibbles 13-16
# (16 bits) of the hash — a wider sketch would need more nibbles.
_MAX_WIDTH = 1 << 16


def _cms_with_buckets(
    df: DataFrame, key: F.Column, depth: int, width: int
) -> tuple[DataFrame, F.Column]:
    """(projected df, bucket array) for ``key``'s ``depth`` rows:
    bucket d = low bits of md5_64("<key>:<d>"). Bitwise AND, not pmod
    — identical for a power-of-two width and exact on the signed-long
    hash in every engine's integer semantics.

    Like ``_bloom_with_coords`` (r11): each row's md5 hex is projected
    ONCE and the bucket read from hex chars 13-16 with a single 4-char
    ``conv`` — the mask keeps at most 16 bits (``width <= 2^16``), all
    of which live in those nibbles, exactly the nibble window the SQL
    oracle replays. The old two-8-char-conv assembly computed md5
    twice per bucket for bits the mask discarded."""
    names = [f"__cms_h{d}" for d in range(depth)]
    proj = df.select(
        "*",
        *[
            F.md5(F.concat(key, F.lit(f":{d}"))).alias(nm)
            for d, nm in enumerate(names)
        ],
    )
    buckets = F.array(
        *[
            F.conv(F.substring(F.col(nm), 13, 4), 16, 10)
            .cast("int")
            .bitwiseAND(F.lit(width - 1))
            for nm in names
        ]
    )
    return proj, buckets


def _check_params(depth: int, width: int) -> None:
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    if width < 1 or width > _MAX_WIDTH or (width & (width - 1)):
        raise ValueError(
            f"width must be a power of two in [2, {_MAX_WIDTH}], got {width}"
        )


def cms_build(
    df: DataFrame,
    key_col: str,
    group_cols: tuple[str, ...] = (),
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build one CMS per ``group_cols`` combination over ``key_col``
    occurrences: rows ``(group…, depth, bucket, cnt)``.

    One pass over the input: each row fans out to ``depth`` (bucket)
    coordinates via a posexplode'd hash array — a single hash
    aggregation with map-side combine, no joins. NULL keys are
    ignored (they have no frequency identity), matching the exact
    GROUP BY they stand in for.
    """
    _check_params(depth, width)
    k = F.col(key_col).cast("string")
    proj, coords = _cms_with_buckets(
        df.filter(F.col(key_col).isNotNull()).select(*group_cols, key_col),
        k,
        depth,
        width,
    )
    return (
        proj.select(*group_cols, F.posexplode(coords).alias("depth", "bucket"))
        .groupBy(*group_cols, "depth", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(
    sketches: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Merge sketches by summing counters — the re-aggregability that
    makes per-partition sketches answer arbitrary-range queries.
    ``group_cols`` are the surviving keys (e.g. merge per-day
    sketches down to per-source); identical ``(depth, width)`` across
    inputs is the caller's contract, as with any sketch algebra."""
    return sketches.groupBy(*group_cols, "depth", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for every row of ``keys``: the MIN
    over the ``depth`` counters each key hashes to (absent counter =
    0). Returns ``keys``'s columns plus ``cms_estimate``.

    The probe side explodes to ``len(keys) × depth`` rows and joins
    the ≤ ``depth × width``-row sketch — broadcast-sized by
    construction, so estimating k keys never shuffles the corpus the
    sketch summarizes."""
    _check_params(depth, width)
    k = F.col(key_col).cast("string")
    out_cols = [c for c in keys.columns]
    proj, coords = _cms_with_buckets(keys, k, depth, width)
    probes = proj.select(
        *out_cols, F.posexplode(coords).alias("depth", "bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["depth", "bucket"], "left")
        .groupBy(*out_cols)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate"))
    )


# ---------------------------------------------------------------- Bloom

# 16-bit lanes: bit values stay in [1, 32768] — positive in every
# engine's INT, no signed-shift edge at lane width 64, and the same
# nibble-13-16 oracle replay as the CMS bucket covers the whole
# position space (n_bits <= 2^16).
_LANE_BITS = 16


def _bloom_with_coords(
    df: DataFrame, key: F.Column, n_hashes: int, n_bits: int
) -> tuple[DataFrame, F.Column]:
    """(projected df, coords array) for ``key``'s ``n_hashes`` bit
    positions: position i = md5_64("<key>#<i>") & (n_bits-1), split
    into a 16-bit lane index and a one-hot bit mask.

    The per-position md5 hex is projected ONCE as a column and the
    position read from hex chars 13-16 with a single 4-char ``conv``:
    the mask keeps at most the low 16 bits of the 64-bit pattern
    (``n_bits <= 2^16``), and those live entirely in the last four
    hex chars of ``substring(md5, 1, 16)`` — so the old two-8-char-
    conv assembly re-hashed the key per struct field inside the
    Generate (where codegen subexpression elimination does not reach)
    for bits the mask then discarded. Positions are value-identical
    (verified, r11: merged lane tables compared equal row-for-row; the
    driver oracle replays the same md5 nibble arithmetic), measured
    ~1.4-2x on the build scan.

    2^(pos%16) via pow: shiftleft() takes only a literal shift count;
    doubles are exact to 2^15 so the cast is lossless.
    """
    names = [f"__bloom_h{i}" for i in range(n_hashes)]
    proj = df.select(
        "*",
        *[
            F.md5(F.concat(key, F.lit(f"#{i}"))).alias(nm)
            for i, nm in enumerate(names)
        ],
    )
    coords = []
    for nm in names:
        pos = (
            F.conv(F.substring(F.col(nm), 13, 4), 16, 10)
            .cast("int")
            .bitwiseAND(F.lit(n_bits - 1))
        )
        coords.append(
            F.struct(
                (pos / F.lit(_LANE_BITS)).cast("int").alias("lane"),
                F.pow(F.lit(2.0), (pos % F.lit(_LANE_BITS)).cast("int"))
                .cast("int")
                .alias("bit"),
            )
        )
    return proj, F.array(*coords)


def _check_bloom_params(n_hashes: int, n_bits: int) -> None:
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")
    if (
        n_bits < _LANE_BITS
        or n_bits > _MAX_WIDTH
        or (n_bits & (n_bits - 1))
    ):
        raise ValueError(
            f"n_bits must be a power of two in [{_LANE_BITS}, {_MAX_WIDTH}],"
            f" got {n_bits}"
        )


def bloom_build(
    df: DataFrame,
    key_col: str,
    group_cols: tuple[str, ...] = (),
    n_hashes: int = 4,
    n_bits: int = 16384,
) -> DataFrame:
    """One Bloom filter per ``group_cols`` combination over
    ``key_col``: rows ``(group…, lane, bits)`` — at most
    ``n_bits/16`` lanes per group regardless of input size.

    Single hash aggregation with map-side ``bit_or`` combine; NULL
    keys are ignored (no membership identity), as in ``cms_build``.
    """
    _check_bloom_params(n_hashes, n_bits)
    k = F.col(key_col).cast("string")
    proj, coords = _bloom_with_coords(
        df.filter(F.col(key_col).isNotNull()).select(*group_cols, key_col),
        k,
        n_hashes,
        n_bits,
    )
    return (
        proj.select(*group_cols, F.explode(coords).alias("_c"))
        .select(*group_cols, "_c.lane", "_c.bit")
        .groupBy(*group_cols, "lane")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_merge(
    sketches: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Merge filters by OR-ing lanes — union-of-sets re-aggregability.
    Identical ``(n_hashes, n_bits)`` across inputs is the caller's
    contract, as with any sketch algebra."""
    return sketches.groupBy(*group_cols, "lane").agg(
        F.bit_or("bits").alias("bits")
    )


def bloom_probe(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    n_hashes: int = 4,
    n_bits: int = 16384,
) -> DataFrame:
    """Membership verdicts for every row of ``keys``: ``maybe_present``
    is true iff ALL ``n_hashes`` bits are set (a missing lane row is
    all-zeros). No false negatives, ever; false positives are
    deterministic given the data. Returns ``keys``'s columns plus
    ``maybe_present``.

    The filter is ≤ ``n_bits/16`` rows by construction and broadcast
    into the probe join — pruning k keys never shuffles the corpus
    the filter summarizes, which is the whole semi-join-reduction
    play at 100 TB."""
    _check_bloom_params(n_hashes, n_bits)
    k = F.col(key_col).cast("string")
    out_cols = [c for c in keys.columns]
    proj, coords = _bloom_with_coords(keys, k, n_hashes, n_bits)
    probes = proj.select(
        *out_cols, F.explode(coords).alias("_c")
    ).select(*out_cols, "_c.lane", "_c.bit")
    hit = F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(
        F.col("bit")
    ) == F.col("bit")
    return (
        probes.join(F.broadcast(sketch), ["lane"], "left")
        .groupBy(*out_cols)
        .agg(F.bool_and(hit).alias("maybe_present"))
    )
