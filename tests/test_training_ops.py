"""Training-data assembly operators: deterministic split, token
packing, contamination detection (north_star extension surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wistia_data_pipeline_project_spark.operators import training as TR
from wistia_data_pipeline_project_spark.sources.io import load_table


def test_split_is_deterministic_and_stable_under_repartition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r.doc_id: r.split for r in TR.split_assign(docs).collect()}
    b = {
        r.doc_id: r.split
        for r in TR.split_assign(docs.repartition(13)).collect()
    }
    assert a == b
    # every doc assigned, fractions roughly honored (md5 is uniform)
    n = len(a)
    frac_train = sum(1 for s in a.values() if s == "train") / n
    assert 0.8 < frac_train < 0.97
    assert set(a.values()) <= {"train", "val", "test"}


def test_split_rejects_bad_fractions(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        TR.split_assign(docs, train=0.9, val=0.2)


def test_split_full_allocation_has_no_test_remainder(spark, sf_dir):
    """train+val == 1.0: the hex cut overflows 2 chars ('100') and
    must still mean 'everything above train is val' — no doc may leak
    into test, and val must be non-empty."""
    docs = load_table(spark, sf_dir, "documents")
    splits = {r.split for r in TR.split_assign(docs, train=0.9, val=0.1).collect()}
    assert "test" not in splits
    assert splits == {"train", "val"}


def test_pack_documents_invariants(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    packed = TR.pack_documents(docs, budget=512).collect()
    assert len(packed) == docs.count()
    by_shard: dict[str, list] = {}
    for r in packed:
        by_shard.setdefault(r.source, []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.doc_id)
        # pack ids are non-decreasing in doc order and start at 0
        assert rows[0].pack_id == 0
        cum = 0
        for r in rows:
            assert r.pack_id == cum // 512
            cum += r.n_tokens


def test_contamination_finds_planted_overlap(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "completely different words nothing shared here at all now"),
        ],
        "doc_id long, text string",
    )
    bench = docs.filter(F.col("doc_id") == 0).select("doc_id")
    got = {r.doc_id for r in TR.contamination(docs, bench).collect()}
    assert got == {1}  # shares the 8-token shingle; doc 2 clean


def test_chunk_documents_windows_and_overlap(spark):
    """Chunk boundaries: stride=budget-overlap, last chunk short,
    consecutive chunks share exactly `overlap` tokens, empty doc
    yields one empty chunk."""
    words = " ".join(f"w{i}" for i in range(25))
    docs = spark.createDataFrame(
        [(1, words), (2, "a b c"), (3, "")], "doc_id long, text string"
    )
    out = TR.chunk_documents(docs, budget=10, overlap=4)
    rows = {(r.doc_id, r.chunk_idx): r for r in out.collect()}
    # doc 1: n=25, stride=6 -> ceil((25-4)/6)=4 chunks
    assert {k for k in rows if k[0] == 1} == {(1, i) for i in range(4)}
    assert rows[(1, 0)].n_chunk_tokens == 10
    assert rows[(1, 3)].n_chunk_tokens == 25 - 3 * 6  # tail chunk short
    # overlap check via reconstruction
    toks = words.split()
    import hashlib

    for i in range(4):
        want = " ".join(toks[i * 6 : i * 6 + 10])
        assert rows[(1, i)].chunk_md5 == hashlib.md5(want.encode()).hexdigest()
    # short doc: one chunk, whole doc
    assert rows[(2, 0)].n_chunk_tokens == 3
    # empty doc: one empty chunk
    assert rows[(3, 0)].n_chunk_tokens == 0
    with pytest.raises(ValueError):
        TR.chunk_documents(docs, budget=10, overlap=10)


def test_shard_writer_deterministic_and_verifiable(spark, sf_dir, tmp_path):
    from wistia_data_pipeline_project_spark.operators import training as TR
    from wistia_data_pipeline_project_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    out = str(tmp_path / "shards")
    manifest = {
        r["shard_id"]: (r["n_rows"], r["content_sum"])
        for r in TR.write_training_shards(docs, out, n_shards=8).collect()
    }
    assert len(manifest) == 8 and sum(v[0] for v in manifest.values()) == docs.count()

    back = spark.read.parquet(out)
    # partition column round-trips and every row is in its assigned shard
    assigned = TR.shard_assign(docs, 8).select("doc_id", "shard_id")
    mismatch = (
        back.select("doc_id", F.col("shard_id").cast("long").alias("got"))
        .join(assigned, "doc_id")
        .filter(F.col("got") != F.col("shard_id"))
        .count()
    )
    assert mismatch == 0

    # manifest verifies against a re-read of the written files
    fp = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("decimal(38,0)")
    reread = {
        r["shard_id"]: (r["n_rows"], r["content_sum"])
        for r in back.groupBy(F.col("shard_id").cast("long").alias("shard_id"))
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum(fp).alias("content_sum"))
        .collect()
    }
    assert reread == manifest

    # determinism: a different input layout yields the identical manifest
    manifest2 = {
        r["shard_id"]: (r["n_rows"], r["content_sum"])
        for r in TR.write_training_shards(
            docs.repartition(13), str(tmp_path / "shards2"), n_shards=8
        ).collect()
    }
    assert manifest2 == manifest


def test_weighted_sample_matches_python_reference(spark, sf_dir):
    """Exact agreement with a hashlib reference: membership AND rank,
    per stratum, weight = n_chars."""
    import hashlib

    from wistia_data_pipeline_project_spark.operators.training import (
        weighted_sample,
    )
    from wistia_data_pipeline_project_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = {
        (r["lang"], r["doc_id"]): r["sample_rank"]
        for r in weighted_sample(
            docs, "n_chars", k=5, strata_col="lang"
        ).collect()
    }

    rows = docs.select("doc_id", "lang", "n_chars").collect()
    import math

    by_lang: dict[str, list] = {}
    for r in rows:
        hx = hashlib.md5(f"{r['doc_id']}:wsample".encode()).hexdigest()[:13]
        u = int(hx, 16) / 16**13 + 2**-53
        w = r["n_chars"]
        key = math.log(u) / w if w and w > 0 else float("-inf")
        by_lang.setdefault(r["lang"], []).append((key, r["doc_id"]))
    want = {}
    for lang, ks in by_lang.items():
        ks.sort(key=lambda t: (-t[0], t[1]))  # desc key, asc doc_id
        for i, (_, did) in enumerate(ks[:5], start=1):
            want[(lang, did)] = i
    assert got == want


def test_weighted_sample_scale_invariant_and_excludes_nonpositive(spark, sf_dir):
    """E-S property: scaling every weight by a constant leaves the
    sample identical; rows with weight <= 0 are never drawn while a
    positive-weight rival remains."""
    from pyspark.sql import functions as F

    from wistia_data_pipeline_project_spark.operators.training import (
        weighted_sample,
    )
    from wistia_data_pipeline_project_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "w", F.when(F.col("doc_id") % 7 == 0, F.lit(0)).otherwise(F.col("n_chars"))
    )
    a = {r["doc_id"] for r in weighted_sample(docs, "w", k=30).collect()}
    scaled = docs.withColumn("w", F.col("w") * 1000.0)
    b = {r["doc_id"] for r in weighted_sample(scaled, "w", k=30).collect()}
    assert a == b
    assert all(d % 7 != 0 for d in a)
    # determinism under repartitioning
    c = {
        r["doc_id"]
        for r in weighted_sample(docs.repartition(13), "w", k=30).collect()
    }
    assert a == c


def test_temperature_weights_flatten_toward_uniform(spark):
    from wistia_data_pipeline_project_spark.operators.training import (
        temperature_weights,
    )

    # strictly skewed synthetic corpus: 60 / 30 / 9 / 1 rows
    sizes = {"big": 60, "mid": 30, "small": 9, "tiny": 1}
    rows = [
        (f"{s}-{i}", s) for s, n in sizes.items() for i in range(n)
    ]
    docs = spark.createDataFrame(rows, "doc_id string, source string")
    w1 = {r["source"]: r for r in temperature_weights(docs, alpha=1.0).collect()}
    w3 = {r["source"]: r for r in temperature_weights(docs, alpha=0.3).collect()}
    w0 = {r["source"]: r for r in temperature_weights(docs, alpha=0.0).collect()}
    # probabilities are distributions
    for w in (w1, w3, w0):
        assert abs(sum(r["sample_prob"] for r in w.values()) - 1.0) < 1e-12
    # alpha=1 reproduces natural shares; alpha=0 is uniform
    for s, r in w1.items():
        assert abs(r["sample_prob"] - r["natural_share"]) < 1e-12
    n_groups = len(w0)
    for r in w0.values():
        assert abs(r["sample_prob"] - 1.0 / n_groups) < 1e-12
    # 0 < alpha < 1 sits strictly between: big sources shrink,
    # small sources grow
    big = max(w1, key=lambda s: w1[s]["n_rows"])
    small = min(w1, key=lambda s: w1[s]["n_rows"])
    assert w3[big]["sample_prob"] < w1[big]["natural_share"]
    assert w3[small]["sample_prob"] > w1[small]["natural_share"]


def test_weighted_sample_short_stratum_never_pads_with_zero_weight(spark):
    from wistia_data_pipeline_project_spark.operators.training import (
        weighted_sample,
    )

    rows = [(1, 10.0), (2, 5.0), (3, 0.0), (4, 0.0), (5, None), (6, -1.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample(df, "w", k=5).collect()
    assert {r["doc_id"] for r in got} == {1, 2}  # short sample, no padding


def test_leakage_safe_split_keeps_clusters_together(spark, sf_dir):
    from wistia_data_pipeline_project_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from wistia_data_pipeline_project_spark.operators.training import (
        leakage_safe_split,
        split_assign,
    )
    from wistia_data_pipeline_project_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.8).select("doc_a", "doc_b")
    out = leakage_safe_split(docs, pairs).collect()
    assert len(out) == docs.count()
    # every cluster is split-homogeneous
    by_group: dict = {}
    for r in out:
        by_group.setdefault(r["split_group"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_group.values())
    # the clusters are real (some group has >1 member)
    from collections import Counter

    sizes = Counter(r["split_group"] for r in out)
    assert max(sizes.values()) > 1
    # fractions still roughly honored
    frac_train = sum(1 for r in out if r["split"] == "train") / len(out)
    assert 0.8 < frac_train < 0.97
    # a plain per-doc split DOES leak on this corpus (the hazard)
    plain = {r["doc_id"]: r["split"] for r in split_assign(docs).collect()}
    leaked = sum(
        1
        for r in pairs.collect()
        if plain[r["doc_a"]] != plain[r["doc_b"]]
    )
    safe = {r["doc_id"]: r["split"] for r in out}
    assert all(safe[r["doc_a"]] == safe[r["doc_b"]] for r in pairs.collect())
    # (leaked may be 0 by luck on tiny corpora; assert only the safe side)


def test_leakage_safe_split_degrades_to_plain_on_pairfree_corpus(spark, sf_dir):
    from wistia_data_pipeline_project_spark.operators.training import (
        leakage_safe_split,
        split_assign,
    )
    from wistia_data_pipeline_project_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(docs, empty).collect()
    }
    want = {r["doc_id"]: r["split"] for r in split_assign(docs).collect()}
    assert got == want


def test_curriculum_manifest_stages_and_permutation_checksum(spark):
    """All four stages populate from hand-built docs; the checksum is
    rank-weighted so swapping two docs' positions changes it; the
    order is stable under repartition (content-addressed, no RNG)."""
    from wistia_data_pipeline_project_spark.operators import text as X

    def doc(i, n_words, uniq=True):
        words = (
            [f"w{i}_{j}" for j in range(n_words)]
            if uniq
            else ["the"] * n_words
        )
        return (i, " ".join(words))

    rows = [
        doc(1, 5),     # good-length fails (<20) -> stage 0
        doc(2, 30),    # good, short -> stage 1 (easy)
        doc(3, 60),    # good, short -> stage 1
        doc(4, 150),   # good, medium -> stage 2
        doc(5, 500),   # good, long -> stage 3
        doc(6, 50, uniq=False),  # diversity <= 0.2 -> stage 0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    scored = X.with_quality_score(docs)
    out = {
        r["stage"]: r
        for r in TR.curriculum_manifest(scored, key_col="doc_id").collect()
    }
    assert set(out) == {0, 1, 2, 3}
    assert out[0]["n_docs"] == 2 and out[1]["n_docs"] == 2
    assert out[2]["n_docs"] == 1 and out[3]["n_docs"] == 1
    assert out[1]["total_tokens"] == 90
    # singleton stages: first == last == the doc, checksum = residue
    assert out[2]["first_doc_id"] == out[2]["last_doc_id"] == 4
    assert out[3]["first_doc_id"] == 5
    # stability under repartition
    again = {
        r["stage"]: r["order_checksum"]
        for r in TR.curriculum_manifest(
            scored.repartition(7), key_col="doc_id"
        ).collect()
    }
    assert {k: v["order_checksum"] for k, v in out.items()} == again
    # permutation sensitivity: reversing stage-1's order (rank swap of
    # its two docs) must change the checksum unless residues collide
    r1 = out[1]
    assert r1["first_doc_id"] != r1["last_doc_id"]
    assert r1["order_checksum"].isdigit()
