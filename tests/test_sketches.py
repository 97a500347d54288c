"""Count-Min + Bloom sketch operators (operators/sketches.py).

The catalog entries `events_cms_user_counts` / `customers_bloom_prune`
hash-check engine parity; these tests pin the sketch ALGEBRA the
oracle cannot see: merge == direct build (re-aggregability), the
one-sided error invariants (CMS never under-counts; Bloom never
false-negatives), exactness when collision-free, parameter
validation, and partitioning independence.
"""

import pytest
from pyspark.sql import functions as F

from wistia_data_pipeline_project_spark.operators import sketches as S


@pytest.fixture(scope="module")
def keyed(spark):
    # 400 rows over 60 keys with a skewed head: key k appears
    # (61 - k) times for k in 1..60 -> heavy keys 1..5 dominate
    rows = [(k, f"g{k % 3}") for k in range(1, 61) for _ in range(61 - k)]
    return spark.createDataFrame(rows, "key int, grp string")


def test_merge_equals_direct_build(keyed):
    """Per-group sketches summed down == one global build, counter for
    counter — the re-aggregability contract."""
    direct = S.cms_build(keyed, "key", depth=4, width=256)
    merged = S.cms_merge(
        S.cms_build(keyed, "key", group_cols=("grp",), depth=4, width=256)
    )
    assert direct.exceptAll(merged).count() == 0
    assert merged.exceptAll(direct).count() == 0


def test_estimate_one_sided_and_exact_when_wide(spark, keyed):
    exact = keyed.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    sk_narrow = S.cms_build(keyed, "key", depth=4, width=32)
    sk_wide = S.cms_build(keyed, "key", depth=4, width=1 << 16)
    narrow = {
        r["key"]: r["cms_estimate"]
        for r in S.cms_estimate(sk_narrow, exact, "key", width=32).collect()
    }
    wide = {
        r["key"]: r["cms_estimate"]
        for r in S.cms_estimate(
            sk_wide, exact, "key", width=1 << 16
        ).collect()
    }
    truth = {r["key"]: r["n"] for r in exact.collect()}
    assert set(narrow) == set(truth)
    for k, n in truth.items():
        # CMS never under-counts, at any width
        assert narrow[k] >= n, (k, narrow[k], n)
    # 60 keys into 65536 buckets x 4 rows: a single collision across
    # all four hash rows is absurd, so the wide sketch is exact
    assert wide == truth


def test_absent_key_estimates_from_empty_counters(spark, keyed):
    sk = S.cms_build(keyed, "key", depth=4, width=1 << 16)
    ghost = spark.createDataFrame([(9999,)], "key int")
    est = S.cms_estimate(sk, ghost, "key", width=1 << 16).collect()
    assert est[0]["cms_estimate"] == 0


def test_null_keys_ignored(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (None,), (None,)], "key int"
    )
    sk = S.cms_build(df, "key", depth=2, width=64)
    # only the two non-null occurrences land: every counter <= 2 and
    # the total per depth row is exactly 2
    per_depth = {
        r["depth"]: r["s"]
        for r in sk.groupBy("depth").agg(F.sum("cnt").alias("s")).collect()
    }
    assert per_depth == {0: 2, 1: 2}


def test_param_validation(keyed):
    with pytest.raises(ValueError, match="power of two"):
        S.cms_build(keyed, "key", width=1000)
    with pytest.raises(ValueError, match="power of two"):
        S.cms_build(keyed, "key", width=(1 << 17))
    with pytest.raises(ValueError, match="depth"):
        S.cms_build(keyed, "key", depth=0)


def test_bloom_merge_equals_direct_build(keyed):
    """Per-group filters OR'd down == one global build, lane for lane
    — union-of-sets re-aggregability."""
    direct = S.bloom_build(keyed, "key", n_hashes=4, n_bits=4096)
    merged = S.bloom_merge(
        S.bloom_build(
            keyed, "key", group_cols=("grp",), n_hashes=4, n_bits=4096
        )
    )
    assert direct.exceptAll(merged).count() == 0
    assert merged.exceptAll(direct).count() == 0


def test_bloom_no_false_negatives_and_bounded_fp(spark, keyed):
    bloom = S.bloom_build(keyed, "key", n_hashes=4, n_bits=4096)
    present = keyed.select("key").distinct()
    verdicts = {
        r["key"]: r["maybe_present"]
        for r in S.bloom_probe(
            bloom, present, "key", n_hashes=4, n_bits=4096
        ).collect()
    }
    # every inserted key MUST come back maybe=true — the one-sided
    # guarantee the pruning play depends on
    assert all(verdicts.values()) and len(verdicts) == 60
    ghosts = spark.range(10_000, 11_000).withColumnRenamed("id", "key")
    fp = (
        S.bloom_probe(bloom, ghosts, "key", n_hashes=4, n_bits=4096)
        .filter(F.col("maybe_present"))
        .count()
    )
    # 60 keys * 4 bits into 4096: expected FPR ~ (240/4096)^4 ~ 1e-5;
    # deterministic given the md5 hash, so the bound is stable
    assert fp <= 5, fp


def test_bloom_null_keys_ignored_and_params(spark, keyed):
    df = spark.createDataFrame([(1,), (None,)], "key int")
    bloom = S.bloom_build(df, "key", n_hashes=3, n_bits=256)
    # exactly one key inserted: at most 3 bits set across all lanes
    total_bits = bloom.select(
        F.sum(F.bit_count("bits")).alias("b")
    ).collect()[0]["b"]
    assert 1 <= total_bits <= 3
    with pytest.raises(ValueError, match="power of two"):
        S.bloom_build(keyed, "key", n_bits=1000)
    with pytest.raises(ValueError, match="n_hashes"):
        S.bloom_build(keyed, "key", n_hashes=0)


def test_bloom_partitioning_independence(spark, keyed):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        a = sorted(
            map(tuple, S.bloom_build(keyed, "key", n_bits=512).collect())
        )
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        b = sorted(
            map(tuple, S.bloom_build(keyed, "key", n_bits=512).collect())
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_partitioning_independence(spark, keyed):
    """Counter table identical under different shuffle widths — the
    bug class the r02 tie-break fix caught elsewhere."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        a = sorted(
            map(tuple, S.cms_build(keyed, "key", width=128).collect())
        )
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        b = sorted(
            map(tuple, S.cms_build(keyed, "key", width=128).collect())
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b
