"""Quality assertions for the probabilistic dedup/ANN operators that
the driver only rows-checks (no SQL oracle): MinHash-LSH, SimHash, IVF.

Measured baselines at sf0.001/sf0.01 (documents has 25 planted
near-dup pairs at J≈0.99):
- MinHash(64)+LSH(16×4) → exact-verify: equals exact all-pairs Jaccard.
- SimHash-64 @ Hamming≤3 with 4-block pigeonhole: recall ≈ 0.6
  (few-bit flips from ~1-token edits can exceed 3), precision high.
- IVF (probe 2/8): recall 10/10 at sf0.01 on the vec_id=0 query.
"""

from __future__ import annotations

from wistia_data_pipeline_project_spark.operators import dedup as D
from wistia_data_pipeline_project_spark.plans import QUERIES
from wistia_data_pipeline_project_spark.sources.io import load_table


def pairs(df, *cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_minhash_equals_exact_jaccard(spark, sf_dir):
    exact = pairs(QUERIES["docs_ngram_jaccard"](spark, sf_dir), "doc_a", "doc_b")
    mh = pairs(QUERIES["docs_minhash_near_dup"](spark, sf_dir), "doc_a", "doc_b")
    assert exact, "corpus should contain planted near-dup pairs"
    assert mh == exact


def test_simhash_recall_on_planted_pairs(spark, sf_dir):
    exact = pairs(QUERIES["docs_ngram_jaccard"](spark, sf_dir), "doc_a", "doc_b")
    sh = pairs(QUERIES["docs_simhash_near_dup"](spark, sf_dir), "doc_a", "doc_b")
    assert exact
    recall = len(sh & exact) / len(exact)
    assert recall >= 0.5, f"simhash recall {recall} below floor"


def test_simhash_is_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {(r.doc_id, r.simhash) for r in D.simhash_fingerprints(docs).collect()}
    b = {(r.doc_id, r.simhash) for r in D.simhash_fingerprints(docs).collect()}
    assert a == b


def test_kmeans_monotone_objective_and_recall(spark, sf_dir):
    """Lloyd's objective is non-decreasing, clusters stay populated,
    and IVF search over LEARNED centroids keeps exact top-k recall at
    full probe."""
    from wistia_data_pipeline_project_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    centroids, hist = S.kmeans_fit(emb, k=8, max_iter=4)
    assert len(hist) == 4
    for a, b in zip(hist, hist[1:]):
        assert b >= a - 1e-9, f"objective degraded: {hist}"
    rows = centroids.collect()
    assert len(rows) == 8
    assert all(len(r.cv) == 64 for r in rows)
    # learned centroids plug into the same IVF path; full probe = exact
    q = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]
    exact = {r.vec_id for r in S.topk_cosine(emb.filter("vec_id <> 0"), q, k=5).collect()}
    ivf = {
        r.vec_id
        for r in S.ivf_topk_cosine(
            emb.filter("vec_id <> 0"), q, k=5, n_probe_centroids=8, centroids=centroids
        ).collect()
    }
    assert ivf == exact


def test_simhash_oversize_doc_guard(spark):
    """Docs past the 32767-token lane-packing limit must fail loudly
    (default) or be droppable (skip) — never silently corrupt."""
    import pytest

    big = "tok " * (D.SIMHASH_MAX_TOKENS + 1)
    docs = spark.createDataFrame(
        [(1, "small doc"), (2, big)], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="lane-packing limit"):
        D.simhash_fingerprints(docs).collect()
    kept = D.simhash_fingerprints(docs, oversize="skip").collect()
    assert [r.doc_id for r in kept] == [1]
    with pytest.raises(ValueError):
        D.simhash_fingerprints(docs, oversize="chunk")


def test_exact_dedup_idempotent(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    doubled = docs.unionByName(docs)
    once = D.exact_dedup(doubled)
    twice = D.exact_dedup(once)
    assert once.count() == docs.select("text").distinct().count()
    assert twice.count() == once.count()


def test_ivf_topk_recall(spark, sf_dir):
    exact = pairs(QUERIES["emb_topk_cosine"](spark, sf_dir), "vec_id")
    ivf = pairs(QUERIES["emb_ivf_topk"](spark, sf_dir), "vec_id")
    assert len(ivf) == 10
    # probe 2/8 partitions: require at least half the true top-10
    assert len(exact & ivf) >= 5


def test_blocked_near_dup_recall_vs_exact(spark):
    """IVF-blocked near-dup (the 100 TB path) must reproduce the exact
    broadcast kernel's pairs. n_assign=4 probes reach recall 1.0 here
    because the 0.45 threshold sits far below the true near-dup regime
    (uniform-ish vectors: threshold pairs hug cell boundaries); real
    near-dups (cosine ≥0.9) co-locate with 2 probes."""
    from pyspark.sql import functions as F

    from wistia_data_pipeline_project_spark.operators.similarity import (
        cosine_near_dup_blocked,
        cosine_near_dup_pairs,
    )
    from wistia_data_pipeline_project_spark.sources.io import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in cosine_near_dup_pairs(emb, threshold=0.45).collect()
    }
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("integer").alias("centroid_id"),
        F.col("embedding").alias("cv"),
    )
    blocked = {
        (r["vec_a"], r["vec_b"])
        for r in cosine_near_dup_blocked(
            emb, centroids, threshold=0.45, n_assign=4
        ).collect()
    }
    assert blocked == exact  # exact verify + full recall at 4 probes


def test_binary_codes_pack_exactly(spark, sf_dir):
    """Sign codes match a plain-Python repack for every vector."""
    from wistia_data_pipeline_project_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    got = {r.vec_id: (r.code_lo, r.code_hi) for r in S.binary_codes(emb).collect()}
    for r in emb.select("vec_id", "embedding").collect():
        lo = sum(1 << i for i in range(32) if r.embedding[i] > 0)
        hi = sum(1 << (i - 32) for i in range(32, 64) if r.embedding[i] > 0)
        assert got[r.vec_id] == (lo, hi), r.vec_id


def test_hamming_topk_approximates_cosine(spark, sf_dir):
    """Binary sketches are a PRUNE stage: a 1-bit/dim code can't rank
    near-uniform vectors finely, but a Hamming shortlist of ~10% of
    the corpus must recover most of the exact cosine top-10 for the
    rerank step (prune-then-rerank contract; measured 0.8 at 1/6 of
    this pool, 1.0 at 1/3)."""
    from wistia_data_pipeline_project_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    q = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]
    exact = {r.vec_id for r in S.topk_cosine(emb.filter("vec_id <> 0"), q, k=10).collect()}
    shortlist = {
        r.vec_id
        for r in S.hamming_topk(emb, q, k=max(30, n // 10), exclude_key=0).collect()
    }
    recall = len(exact & shortlist) / len(exact)
    assert recall >= 0.7, f"binary-sketch shortlist recall {recall} below floor"


def test_bucket_pairs_star_on_overflow(spark):
    # 1 bucket of 1200 members (> max_bucket=1000) + 1 small bucket of 3:
    # the hot bucket must degrade to linear star pairs around the min
    # key (not be dropped, not expand quadratically)
    from pyspark.sql import Observation

    rows = [(k, "hot") for k in range(1200)] + [
        (k, "cold") for k in (5000, 5001, 5002)
    ]
    df = spark.createDataFrame(rows, "doc_id long, bucket string")
    obs = Observation("bp")
    pairs = D.bucket_pairs(df, "doc_id", ["bucket"], observation=obs).collect()
    hot = [(r.doc_a, r.doc_b) for r in pairs if r.doc_b < 5000]
    cold = sorted((r.doc_a, r.doc_b) for r in pairs if r.doc_b >= 5000)
    assert len(hot) == 1199 and all(a == 0 for a, _ in hot)
    assert cold == [(5000, 5001), (5000, 5002), (5001, 5002)]
    assert obs.get["n_overflow_buckets"] == 1
    assert obs.get["max_bucket_members"] == 1200


def test_simhash_star_on_degenerate_bucket(spark):
    # 1100 identical docs: every block bucket holds all of them; the
    # expansion must emit the 1099 star pairs (hamming 0), not 600k
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(1100)],
        "doc_id long, text string",
    )
    pairs = D.simhash_near_dup_pairs(docs).collect()
    assert len(pairs) == 1099
    assert all(r.doc_a == 0 and r.hamming == 0 for r in pairs)


def test_knn_join_blocked_recall_and_shape(spark, sf_dir):
    """kNN graph: every vector gets ≤ k ranked neighbors; ranks are
    dense from 1; neighbors never self-reference; and measured recall
    of the exact top-1 neighbor stays high at this cell/probe shape."""
    from pyspark.sql import functions as F

    from wistia_data_pipeline_project_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("integer").alias("centroid_id"),
        F.col("embedding").alias("cv"),
    )
    knn = S.knn_join_blocked(emb, cent, k=3, n_assign=4).cache()
    rows = knn.collect()
    assert all(r.vec_id != r.neighbor_id for r in rows)
    by_vec = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, []).append(r)
    for vid, rs in by_vec.items():
        ranks = sorted(x.rank for x in rs)
        assert ranks == list(range(1, len(rs) + 1)), vid
        sims = [x.cosine_sim for x in sorted(rs, key=lambda x: x.rank)]
        assert sims == sorted(sims, reverse=True), vid

    # recall of the exact nearest neighbor (brute force, small sf)
    e = emb.select("vec_id", "embedding").collect()
    import numpy as np

    ids = np.array([r.vec_id for r in e])
    mat = np.array([list(r.embedding) for r in e], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    np.fill_diagonal(sims, -2.0)
    exact_nn = {int(ids[i]): int(ids[j]) for i, j in enumerate(sims.argmax(axis=1))}
    got_nn = {r.vec_id: r.neighbor_id for r in rows if r.rank == 1}
    hit = sum(1 for v, n in exact_nn.items() if got_nn.get(v) == n)
    assert hit / len(exact_nn) >= 0.95


def test_hot_shingle_cap_bounds_fanout(spark):
    # 1200 docs share ONE boilerplate shingle (df=1200 > cap=1000);
    # docs 0 and 1 are otherwise identical, every other doc unique.
    # Uncapped, the shingle self-join emits C(1200,2) = 719,400 pair
    # rows off a single hot key; with the df cap the hot shingle is
    # removed from join AND sizes, so output is O(true near-dups):
    # exactly the (0, 1) pair, still at jaccard 1.0.
    from pyspark.sql import Observation

    header = "lic0 lic1 lic2 lic3 lic4 lic5 lic6 lic7"

    def filler(i):
        j = 0 if i == 1 else i
        return " ".join(f"{c}{j}" for c in "abcdefgh")

    docs = spark.createDataFrame(
        [(i, f"{header} {filler(i)}") for i in range(1200)],
        "doc_id long, text string",
    )
    uncapped = D._pair_intersections(
        docs, "doc_id", "text", 8, max_doc_freq=10**9
    )
    assert uncapped.count() == 1200 * 1199 // 2

    obs = Observation("hot_shingles")
    pairs = D.ngram_jaccard_pairs(
        docs, threshold=0.8, max_doc_freq=1000, observation=obs
    ).collect()
    assert [(r.doc_a, r.doc_b, r.jaccard) for r in pairs] == [(0, 1, 1.0)]
    assert obs.get["n_hot_shingles"] == 1
    assert obs.get["n_dropped_shingle_rows"] == 1200
    assert obs.get["max_doc_freq_seen"] == 1200


def test_cosine_near_dup_pairs_guards_corpus_size(spark):
    # the driver-collect oracle kernel must refuse production-sized
    # inputs so it can't silently become the catalog path
    import pytest
    from pyspark.sql import functions as F
    from wistia_data_pipeline_project_spark.operators import similarity as S

    big = spark.range(100_001).select(
        F.col("id").alias("vec_id"), F.array(F.lit(0.1)).alias("embedding")
    )
    with pytest.raises(ValueError, match="small-corpus"):
        S.cosine_near_dup_pairs(big, threshold=0.9)


def test_semdedup_drops_planted_duplicates(spark):
    """Planted exact duplicates land in the same cluster and every
    later-keyed copy is dropped; distinct vectors survive."""
    import pyspark.sql.functions as F

    from wistia_data_pipeline_project_spark.operators import similarity as S

    base = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 1.0]),
    ]
    dups = [(10 + i, v) for i, v in base]  # exact copies, larger keys
    df = spark.createDataFrame(
        base + dups, "vec_id long, embedding array<double>"
    )
    cents = spark.createDataFrame(
        [(i, v) for i, v in base], "centroid_id int, cv array<double>"
    )
    out = S.semdedup_stats(df, cents, threshold=0.95, dim=4).collect()
    assert len(out) == 4
    for r in out:
        assert r.n_members == 2 and r.n_dropped == 1 and r.n_kept == 1
    # keep-first: the dropped ids are exactly the larger-keyed copies —
    # verified indirectly: rerun with copies given SMALLER keys flips
    # nothing in the counts (symmetric), but the originals' cluster
    # membership is what the counts pin.


def test_semdedup_no_drops_below_threshold(spark):
    from wistia_data_pipeline_project_spark.operators import similarity as S

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0])], "centroid_id int, cv array<double>"
    )
    out = S.semdedup_stats(df, cents, threshold=0.5, dim=2).collect()
    assert len(out) == 1
    assert out[0].n_members == 2 and out[0].n_dropped == 0


def test_matryoshka_and_ivf_recall_entries_bounded(spark, sf_dir):
    from wistia_data_pipeline_project_spark.plans import QUERIES

    for name in ("emb_ivf_recall", "emb_matryoshka_recall"):
        row = QUERIES[name](spark, sf_dir).collect()[0]
        assert row.k == 10
        assert 0 <= row.n_overlap <= 10
        assert abs(row.recall - row.n_overlap / 10) < 1e-12


def test_hard_negatives_cross_label_only(spark, sf_dir):
    """Every mined negative pairs an anchor with a different-label
    neighbor, and ranks are dense from 1."""
    from wistia_data_pipeline_project_spark.plans import QUERIES
    from wistia_data_pipeline_project_spark.sources.io import load_table

    out = QUERIES["emb_hard_negatives"](spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    import pyspark.sql.functions as F

    joined = (
        out.join(emb.withColumnRenamed("label", "la"), "vec_id")
        .join(
            emb.selectExpr("vec_id AS neighbor_id", "label AS lb"),
            "neighbor_id",
        )
    )
    assert joined.filter(F.col("la") == F.col("lb")).count() == 0
    ranks = joined.groupBy("vec_id").agg(
        F.min("rank").alias("lo"), F.max("rank").alias("hi"),
        F.count(F.lit(1)).alias("n")
    )
    bad = ranks.filter((F.col("lo") != 1) | (F.col("hi") != F.col("n")))
    assert bad.count() == 0


def test_incremental_dedup_accounting(spark, sf_dir):
    """Batch arithmetic: dropped_vs_existing + dropped_within +
    loaded == batch size per source; even-id re-arrivals are dropped."""
    from wistia_data_pipeline_project_spark.plans import QUERIES

    rows = QUERIES["docs_incremental_dedup"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert (
            r.n_dropped_vs_existing
            + r.n_dropped_within_batch
            + r.n_loaded
            == r.n_batch
        )
    total_dropped_ex = sum(r.n_dropped_vs_existing for r in rows)
    assert total_dropped_ex > 0


def test_knn_neg_label_fold_path(spark):
    """neg_label_col works on the dim=None (HOF fold) path too, and
    NULL labels never pair."""
    from wistia_data_pipeline_project_spark.operators import similarity as S

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [0.9, 0.1], 0),   # same label as 0 -> never a negative of 0
            (2, [0.8, 0.2], 1),
            (3, [0.0, 1.0], None),  # NULL label: no pairs at all
        ],
        "vec_id long, embedding array<double>, label int",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0])], "centroid_id int, cv array<double>"
    )
    out = S.knn_join_blocked(
        df, cents, k=2, n_assign=1, neg_label_col="label"
    ).collect()
    pairs = {(r.vec_id, r.neighbor_id) for r in out}
    assert (0, 1) not in pairs and (1, 0) not in pairs
    assert all(3 not in p for p in pairs)
    assert (0, 2) in pairs and (2, 0) in pairs


def _remove_spans_reference(docs, width=4, min_df=2):
    """Plain-Python reference for remove_duplicated_spans."""
    toks = {d: t.strip().split() if t.strip() else [] for d, t in docs.items()}
    wins: dict[int, list] = {}
    for d, ts in toks.items():
        wins[d] = [
            " ".join(ts[i : i + width]) for i in range(len(ts) - width + 1)
        ] if len(ts) >= width else []
    df_count: dict[str, set] = {}
    for d, ws in wins.items():
        for w in set(ws):
            df_count.setdefault(w, set()).add(d)
    dup = {w for w, ds in df_count.items() if len(ds) >= min_df}
    out = {}
    for d, ts in toks.items():
        covered = set()
        for i, w in enumerate(wins[d]):
            if w in dup:
                covered.update(range(i, i + width))
        kept = [t for i, t in enumerate(ts) if i not in covered]
        out[d] = (" ".join(kept), len(ts), len(ts) - len(kept))
    return out


def test_remove_duplicated_spans_matches_reference(spark):
    from wistia_data_pipeline_project_spark.operators.dedup import (
        remove_duplicated_spans,
    )

    shared = "x1 x2 x3 x4"  # a 4-token span planted in three docs
    docs = {
        0: f"a b c {shared} d e f",
        1: f"p q {shared} r s t u",
        2: f"{shared}",
        3: "unique tokens only here nothing shared at all",
        4: "",
        5: "short one",  # < width, no windows
    }
    sdf = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_tokens_removed"])
        for r in remove_duplicated_spans(sdf, width=4).collect()
    }
    want = _remove_spans_reference(docs, width=4)
    assert got == want
    # the planted span is gone from every document
    for d in (0, 1, 2):
        assert "x1" not in got[d][0]
    assert got[2][0] == ""              # fully-duplicated doc -> empty
    assert got[3][2] == 0               # untouched doc
    assert got[4] == ("", 0, 0)


def test_remove_duplicated_spans_monotone_and_subsequence(spark):
    """Removal only deletes (clean text is a subsequence of the
    original) and accounting conserves. NOTE removal is deliberately
    NOT idempotent: deleting a span splices its neighbors together,
    which can form NEW cross-document windows — the documented reason
    production pipelines run one pass (Lee et al. 2022), not a
    fixpoint loop."""
    from pyspark.sql import functions as F

    from wistia_data_pipeline_project_spark.operators.dedup import (
        remove_duplicated_spans,
    )
    from wistia_data_pipeline_project_spark.sources.io import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").filter(
        F.col("doc_id") < 120  # deterministic subset (limit() isn't)
    )
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    out = remove_duplicated_spans(docs, width=8).collect()
    assert {r["doc_id"] for r in out} == set(orig)
    for r in out:
        src = orig[r["doc_id"]].split()
        cln = r["clean_text"].split() if r["clean_text"] else []
        assert r["n_tokens"] == len(src)
        assert r["n_tokens_removed"] == len(src) - len(cln)
        # subsequence check
        it = iter(src)
        assert all(tok in it for tok in cln)


def _mmr_reference(cands, k=5, lam=0.5):
    """Plain-Python MMR with the smaller-key tiebreak."""
    import math

    def _norm(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v] if n else v

    items = [(i, r, _norm(v)) for i, r, v in cands]
    out, max_sim = [], {i: 0.0 for i, _, _ in items}
    picked = set()
    for rank in range(1, min(k, len(items)) + 1):
        best, best_score = None, None
        for i, r, _ in items:
            if i in picked:
                continue
            s = lam * r - (1 - lam) * max_sim[i]
            if best is None or s > best_score or (s == best_score and i < best):
                best, best_score = i, s
        picked.add(best)
        out.append((best, rank, best_score))
        bv = next(v for i, _, v in items if i == best)
        for i, _, v in items:
            max_sim[i] = max(max_sim[i], sum(a * b for a, b in zip(v, bv)))
    return out


def test_mmr_rerank_matches_reference_per_query(spark):
    import random

    from wistia_data_pipeline_project_spark.operators.similarity import mmr_rerank

    rng = random.Random(7)
    rows = []
    per_query = {}
    for q in range(4):
        cands = []
        for i in range(12):
            vec = [rng.gauss(0, 1) for _ in range(8)]
            rel = round(rng.random(), 6)
            cands.append((q * 100 + i, rel, vec))
            rows.append((q, q * 100 + i, rel, vec))
        per_query[q] = cands
    df = spark.createDataFrame(
        rows, "query_id long, vec_id long, rel_score double, embedding array<double>"
    )
    got = {}
    for r in mmr_rerank(df, k=5, lam=0.5).collect():
        got.setdefault(r["query_id"], []).append(
            (r["vec_id"], r["mmr_rank"], r["mmr_score"])
        )
    for q, cands in per_query.items():
        want = _mmr_reference(cands, k=5, lam=0.5)
        got_q = sorted(got[q], key=lambda t: t[1])
        assert [t[0] for t in got_q] == [t[0] for t in want], q
        for (gi, gr, gs), (wi, wr, ws) in zip(got_q, want):
            assert abs(gs - ws) < 1e-9


def test_mmr_rerank_diversifies_duplicate_candidates(spark):
    """Two near-identical high-relevance candidates: pure relevance
    would take both; MMR at lam=0.5 takes one, then the distinct
    lower-relevance candidate."""
    from wistia_data_pipeline_project_spark.operators.similarity import mmr_rerank

    rows = [
        (0, 1, 0.99, [1.0, 0.0, 0.0]),
        (0, 2, 0.98, [0.999, 0.01, 0.0]),   # near-dup of 1
        (0, 3, 0.60, [0.0, 1.0, 0.0]),      # orthogonal
    ]
    df = spark.createDataFrame(
        rows, "query_id long, vec_id long, rel_score double, embedding array<double>"
    )
    got = [
        r["vec_id"]
        for r in sorted(
            mmr_rerank(df, k=2, lam=0.5).collect(), key=lambda r: r["mmr_rank"]
        )
    ]
    assert got == [1, 3]


def test_ndcg_at_k_matches_hand_computation(spark):
    import math

    from wistia_data_pipeline_project_spark.operators.similarity import ndcg_at_k

    results = spark.createDataFrame(
        # q0 ranks a mediocre doc first; q1 ranks perfectly
        [(0, 10, 1), (0, 11, 2), (0, 12, 3), (1, 20, 1), (1, 21, 2)],
        "query_id long, vec_id long, rank long",
    )
    ideal = spark.createDataFrame(
        [(0, 10, 1.0), (0, 11, 3.0), (0, 13, 2.0), (1, 20, 2.0), (1, 21, 1.0)],
        "query_id long, vec_id long, gain double",
    )
    got = {r["query_id"]: r for r in ndcg_at_k(results, ideal, k=3).collect()}
    dcg0 = 1.0 / math.log2(2) + 3.0 / math.log2(3) + 0.0
    idcg0 = 3.0 / math.log2(2) + 2.0 / math.log2(3) + 1.0 / math.log2(4)
    assert abs(got[0]["dcg"] - dcg0) < 1e-12
    assert abs(got[0]["idcg"] - idcg0) < 1e-12
    assert abs(got[0]["ndcg"] - dcg0 / idcg0) < 1e-12
    assert abs(got[1]["ndcg"] - 1.0) < 1e-12  # perfect ranking


def test_ndcg_scores_zero_for_unanswered_judged_query(spark):
    from wistia_data_pipeline_project_spark.operators.similarity import ndcg_at_k

    results = spark.createDataFrame(
        [(0, 10, 1)], "query_id long, vec_id long, rank long"
    )
    ideal = spark.createDataFrame(
        [(0, 10, 1.0), (9, 90, 2.0)],  # query 9 judged, never answered
        "query_id long, vec_id long, gain double",
    )
    got = {r["query_id"]: r for r in ndcg_at_k(results, ideal, k=3).collect()}
    assert got[9]["dcg"] == 0.0 and got[9]["ndcg"] == 0.0
    assert got[0]["ndcg"] == 1.0


def test_remove_duplicated_spans_null_text(spark):
    from wistia_data_pipeline_project_spark.operators.dedup import (
        remove_duplicated_spans,
    )

    df = spark.createDataFrame(
        [(1, None), (2, "a b c d e")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_tokens_removed"])
        for r in remove_duplicated_spans(df, width=4).collect()
    }
    assert got[1] == ("", 0, 0)  # NULL text == empty, never NULL counts


def test_prefix_filter_equals_exact_jaccard(spark, sf_dir):
    """Prefix filtering is lossless: its verified pairs must equal the
    UNCAPPED exact all-pairs Jaccard (MinHash equality is only
    up-to-recall; this one is a guarantee)."""
    from wistia_data_pipeline_project_spark.operators.dedup import (
        minhash_near_dup_pairs,
        prefix_jaccard_pairs,
    )
    from wistia_data_pipeline_project_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = pairs(prefix_jaccard_pairs(docs, threshold=0.8), "doc_a", "doc_b")
    # minhash output == exact all-pairs on this corpus (pinned by
    # test_minhash_equals_exact_jaccard above)
    exact = pairs(minhash_near_dup_pairs(docs, threshold=0.8), "doc_a", "doc_b")
    assert got == exact and got


def test_prefix_filter_boundary_pair_survives_ppjoin_bounds(spark):
    """A pair EXACTLY at the threshold (J = 0.8 precisely: |a|=|b|=9,
    overlap 8, union 10) must survive the round-9 PPJoin+ candidate
    bounds — the length and positional filters carry one token of
    slack so no float-boundary arithmetic can prune a true pair the
    double-divided verify would keep."""
    from wistia_data_pipeline_project_spark.operators.dedup import (
        prefix_jaccard_pairs,
    )

    shared = " ".join(f"tok{i} tok{i} tok{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, shared + " aaa aaa aaa"),
            (2, shared + " bbb bbb bbb"),
            (3, "zzz zzz zzz yyy yyy yyy"),
        ],
        "doc_id long, text string",
    )
    # width=3 shingles: doc1/doc2 share the 8 'tokI tokI tokI' + the 7
    # seam shingles... use the verify itself as ground truth: the
    # operator at threshold equal to the pair's exact jaccard must
    # still emit it.
    out = prefix_jaccard_pairs(docs, threshold=0.01, width=3).collect()
    assert out, "low-threshold sanity: the near-dup pair must appear"
    j = max(r.jaccard for r in out)
    at_boundary = prefix_jaccard_pairs(docs, threshold=j, width=3).collect()
    assert any(
        (r.doc_a, r.doc_b) == (1, 2) and r.jaccard == j for r in at_boundary
    )


def test_prefix_filter_survives_hot_shingle(spark):
    """A boilerplate shingle in EVERY doc must not enter the prefix
    join (it ranks most-frequent), and the true planted pair is still
    found — the exactness the df-cap path gives up."""
    from wistia_data_pipeline_project_spark.operators.dedup import (
        prefix_jaccard_pairs,
    )

    boiler = "b1 b2 b3 b4 b5 b6 b7 b8"  # one shared 8-token shingle
    rows = [(i, f"{boiler} u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f u{i}g") for i in range(40)]
    # plant a genuine near-dup pair (identical long text)
    twin = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12 x13 x14 x15 x16"
    rows += [(100, twin), (101, twin)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = pairs(prefix_jaccard_pairs(docs, threshold=0.8), "doc_a", "doc_b")
    assert (100, 101) in got
    # the boilerplate docs share only 1-of-9ish shingles -> J << 0.8
    assert all(a >= 100 for a, b in got)


def test_mmr_rerank_integer_rel_col_safe_arrow_cast(spark):
    """An INTEGER rel column must round-trip: the output emits the
    original values, not the float64 scoring copy — under
    convertToArrowArraySafely=true a float64->long cast would fail
    (ADVICE r03)."""
    from wistia_data_pipeline_project_spark.operators.similarity import mmr_rerank

    rows = [
        (1, 10, 3, [1.0, 0.0]),
        (1, 11, 2, [0.0, 1.0]),
        (1, 12, 1, [1.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "query_id long, vec_id long, rel_score long, embedding array<double>"
    )
    key = "spark.sql.execution.pandas.convertToArrowArraySafely"
    prev = spark.conf.get(key, "false")
    spark.conf.set(key, "true")
    try:
        got = sorted(
            mmr_rerank(df, k=3, lam=0.5).collect(), key=lambda r: r["mmr_rank"]
        )
    finally:
        spark.conf.set(key, prev)
    assert [r["vec_id"] for r in got] == [10, 11, 12]
    assert [r["rel_score"] for r in got] == [3, 2, 1]
    assert all(isinstance(r["rel_score"], int) for r in got)


def test_knn_join_regime_auto_select_and_parity(spark):
    """The pair-join regime is chosen at plan-build time (no manual
    flag at call sites): a small corpus pins BroadcastHashJoin, the
    forced non-broadcast path pins SortMergeJoin via hint, and BOTH
    regimes return the identical neighbor sets (VERDICT r03 #3)."""
    from wistia_data_pipeline_project_spark.operators.similarity import (
        _parse_size_bytes,
        knn_join_blocked,
    )

    rows = [
        (i, [float((i * 7 + j * 3) % 11 - 5) for j in range(4)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = df.filter("vec_id < 8").select(
        df.vec_id.cast("integer").alias("centroid_id"),
        df.embedding.alias("cv"),
    )

    auto = knn_join_blocked(df, cent, k=2, n_assign=2, dim=4, n_rows=40)
    forced = knn_join_blocked(
        df, cent, k=2, n_assign=2, dim=4, broadcast_pairs=False
    )
    plan_auto = auto._jdf.queryExecution().executedPlan().toString()
    plan_forced = forced._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_auto
    assert "SortMergeJoin" not in plan_auto
    assert "SortMergeJoin" in plan_forced

    key = lambda r: (r["vec_id"], r["rank"])  # noqa: E731
    got_a = sorted(
        ((r["vec_id"], r["rank"], r["neighbor_id"]) for r in auto.collect())
    )
    got_f = sorted(
        ((r["vec_id"], r["rank"], r["neighbor_id"]) for r in forced.collect())
    )
    assert got_a == got_f
    assert got_a  # non-degenerate

    # a corpus estimated past the threshold auto-selects the SMJ regime
    big = knn_join_blocked(df, cent, k=2, n_assign=2, dim=4, n_rows=2_000_000)
    plan_big = big._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan_big

    assert _parse_size_bytes("10MB") == 10 * 1024 * 1024
    assert _parse_size_bytes("10485760") == 10485760
    assert _parse_size_bytes("10485760b") == 10485760
    assert _parse_size_bytes("1g") == 1 << 30
    assert _parse_size_bytes("1p") == 1 << 50  # full byteStringAs set
    assert _parse_size_bytes("2pb") == 2 << 50
    assert _parse_size_bytes("-1") == -1


def test_jaccard_pair_list_invariant_to_shuffle_width(spark, sf_dir):
    """The scored pair list feeding seven hash-gated catalog entries
    (``plans.catalog_docs._jaccard_pairs_cached``) must be IDENTICAL —
    scores included — under different shuffle widths (VERDICT r04
    item 6: the class of bug the r02 partitioning-dependent tie-break
    fix caught). Runs the underlying computation directly so the
    cache can't mask a partitioning sensitivity."""
    docs = load_table(spark, sf_dir, "documents")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for n_part in ("4", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n_part)
            results[n_part] = sorted(
                (r.doc_a, r.doc_b, r.n_inter, r.jaccard)
                for r in D.ngram_jaccard_pairs(docs, threshold=0.8).collect()
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert results["4"] and results["4"] == results["32"]


def test_knn_shared_pairs_bit_identical_to_direct(spark, sf_dir):
    """Both kNN-graph catalog entries rank ONE shared scored-pair
    checkpoint (``plans.catalog_emb._knn_pairs_cached``). The cached
    formulation must be bit-identical to each entry building its own
    pair join — including the hard-negative mode, whose cross-label
    predicate moves from the join into a post-filter (it commutes:
    labels are functions of the keys)."""
    from wistia_data_pipeline_project_spark.operators import similarity as S
    from wistia_data_pipeline_project_spark.plans import catalog_emb as CE

    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(CE._query_vec(spark, sf_dir, 0))
    cent = CE._centroids_scaled(sf_dir, emb)
    n = CE._nvec(sf_dir, emb)
    key = lambda r: (r.vec_id, r.rank)  # noqa: E731

    direct = sorted(
        S.knn_join_blocked(emb, cent, k=3, n_assign=4, dim=dim, n_rows=n)
        .collect(),
        key=key,
    )
    cached = sorted(CE.emb_knn_join(spark, sf_dir).collect(), key=key)
    assert direct and direct == cached

    direct_neg = sorted(
        S.knn_join_blocked(
            emb, cent, k=3, n_assign=4, dim=dim,
            neg_label_col="label", n_rows=n,
        ).collect(),
        key=key,
    )
    cached_neg = sorted(
        CE.emb_hard_negatives(spark, sf_dir).collect(), key=key
    )
    assert direct_neg and direct_neg == cached_neg


def test_knn_pair_list_invariant_to_shuffle_width(spark, sf_dir):
    """The shared kNN scored-pair list must be IDENTICAL — sims
    included — under different shuffle widths (the same
    partitioning-independence contract the jaccard pair list pins):
    the unrolled pair cosine is a fixed-order expression and the
    distinct is value-based, so no partitioning may leak into the
    result. Runs the builder directly so the cache can't mask it."""
    from wistia_data_pipeline_project_spark.operators import similarity as S
    from wistia_data_pipeline_project_spark.plans import catalog_emb as CE

    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(CE._query_vec(spark, sf_dir, 0))
    cent = CE._centroids_scaled(sf_dir, emb)
    n = CE._nvec(sf_dir, emb)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for n_part in ("4", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n_part)
            results[n_part] = sorted(
                (r.vec_id, r.neighbor_id, r.cosine_sim,
                 r.vec_label, r.neighbor_label)
                for r in S.knn_candidate_pairs(
                    emb, cent, n_assign=4, dim=dim,
                    label_col="label", carry_labels=True, n_rows=n,
                ).collect()
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert results["4"] and results["4"] == results["32"]


def test_knn_pair_prune_lossless(spark):
    """``prune_pairs_group_topk`` (the round-9 build-time checkpoint
    prune) must be invisible to BOTH consumer shapes: plain top-k per
    vector, and top-k after dropping whole neighbor-label groups
    (cross-label, with SQL null semantics). Adversarial corpus: one
    vector whose global top-3 all share one label (so a per-VECTOR
    partial would lose the cross-label answer), NULL labels on both
    sides, and cross-group cosine ties."""
    from wistia_data_pipeline_project_spark.operators.similarity import (
        knn_topk_from_pairs,
        prune_pairs_group_topk,
    )

    rows = []
    # vec 1 (label "a"): best 4 neighbors all label "a" (sims .9x),
    # then label "b" at .5 and NULL at .4 — the cross-label top-k
    # lives entirely OUTSIDE the global top-4.
    for nid, sim, lab in [
        (10, 0.99, "a"), (11, 0.98, "a"), (12, 0.97, "a"),
        (13, 0.96, "a"), (20, 0.50, "b"), (21, 0.45, "b"),
        (22, 0.40, "b"), (23, 0.35, "b"), (30, 0.40, None),
    ]:
        rows.append((1, nid, sim, "a", lab))
    # vec 2 (label NULL): never emits a cross-label pair; plain top-k
    # still sees everything. Tie at 0.7 across two groups.
    for nid, sim, lab in [
        (10, 0.70, "a"), (20, 0.70, "b"), (11, 0.70, "a"),
        (21, 0.60, "b"), (30, 0.55, None),
    ]:
        rows.append((2, nid, sim, None, lab))
    pairs = spark.createDataFrame(
        rows,
        "vec_id long, neighbor_id long, cosine_sim double, "
        "vec_label string, neighbor_label string",
    )
    pruned = prune_pairs_group_topk(pairs, k=3)

    key = lambda r: (r.vec_id, r.rank)  # noqa: E731
    for cross in (False, True):
        want = sorted(
            knn_topk_from_pairs(pairs, k=3, cross_label_only=cross)
            .collect(), key=key,
        )
        got = sorted(
            knn_topk_from_pairs(pruned, k=3, cross_label_only=cross)
            .collect(), key=key,
        )
        assert want and got == want, f"cross_label_only={cross}"
    # and the prune genuinely dropped rows (vec 1 keeps 3+3+1, not 9)
    assert pruned.count() < pairs.count()


def test_knn_pair_build_partial_prune_lossless(spark, sf_dir):
    """The round-11 TRANSIENT-shuffle prune: ``prune_k`` plants a
    dense_rank partial BEFORE the build's terminal distinct, so the
    exchange never carries the full candidate volume. dense_rank (not
    row_number) keeps it lossless under the duplicate rows the
    distinct collapses — a pair co-resident in two probed cells ties
    with itself and shares one rank. The pruned build must yield the
    IDENTICAL stored checkpoint: same rows after the round-9 stored
    prune, on the real corpus (n_assign=4 guarantees co-residency
    duplicates exist)."""
    from pyspark.sql import functions as F
    import wistia_data_pipeline_project_spark.operators.similarity as S
    from wistia_data_pipeline_project_spark.plans.catalog_emb import (
        _centroids_scaled,
        _nvec,
        _query_vec,
    )
    from wistia_data_pipeline_project_spark.sources.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    kw = dict(
        n_assign=4,
        dim=len(_query_vec(spark, sf_dir, 0)),
        label_col="label",
        carry_labels=True,
        n_rows=_nvec(sf_dir, emb),
        n_centroids=max(8, _nvec(sf_dir, emb) // 250),
    )
    cents = _centroids_scaled(sf_dir, emb)
    raw = S.knn_candidate_pairs(emb, cents, **kw)
    pruned_build = S.knn_candidate_pairs(emb, cents, **kw, prune_k=3)
    # the raw build really contains co-residency duplicates pre-distinct
    # (the case dense_rank exists for) — count before the distinct by
    # rebuilding without it is overkill; instead assert the partial
    # dropped candidate rows while the final checkpoints agree
    want = set(map(tuple, S.prune_pairs_group_topk(raw, k=3).collect()))
    got = set(map(tuple, S.prune_pairs_group_topk(pruned_build, k=3).collect()))
    assert want and got == want
    # and the partial genuinely prunes: the pruned pair list is a
    # strict subset of the raw one whenever any group exceeds k
    n_raw, n_pruned = raw.count(), pruned_build.count()
    assert n_pruned <= n_raw
    big_groups = (
        raw.groupBy("vec_id", "neighbor_label")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 3)
        .count()
    )
    if big_groups:
        assert n_pruned < n_raw


def test_knn_merge_regime_matches_broadcast_regime(spark, sf_dir):
    """The production pair-join regime (merge SMJ, candidate-volume
    width pin — the r11 change that made the sf100 build fit
    in-host) must be row-identical to the broadcast regime every
    driver SF actually runs: same pairs, same sims, same top-k, with
    and without the dense_rank partial."""
    import wistia_data_pipeline_project_spark.operators.similarity as S
    from wistia_data_pipeline_project_spark.plans.catalog_emb import (
        _centroids_scaled,
        _nvec,
        _query_vec,
    )
    from wistia_data_pipeline_project_spark.sources.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    kw = dict(
        n_assign=4,
        dim=len(_query_vec(spark, sf_dir, 0)),
        label_col="label",
        carry_labels=True,
        n_rows=_nvec(sf_dir, emb),
        n_centroids=max(8, _nvec(sf_dir, emb) // 250),
        prune_k=3,
    )
    cents = _centroids_scaled(sf_dir, emb)
    bc = S.knn_candidate_pairs(emb, cents, broadcast_pairs=True, **kw)
    mg = S.knn_candidate_pairs(emb, cents, broadcast_pairs=False, **kw)
    rb = set(map(tuple, bc.collect()))
    rm = set(map(tuple, mg.collect()))
    assert rb and rm == rb
    # the merge regime really is the co-partitioned SMJ
    plan = mg._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan


def test_knn_pair_prune_compiles_to_window_group_limit(spark):
    """The build-time prune must compile to the TWO-PHASE
    WindowGroupLimit (partial per-mapper limit BEFORE the exchange):
    that partial is what keeps the full candidate-pair list from ever
    materializing into the shuffle that feeds the checkpoint — the
    whole point of pruning at build time (SCALE.md r07 storage wall)."""
    from tools.plan_audit import formatted_plan
    from wistia_data_pipeline_project_spark.operators.similarity import (
        prune_pairs_group_topk,
    )

    pairs = spark.createDataFrame(
        [(1, 2, 0.5, "a", "b")],
        "vec_id long, neighbor_id long, cosine_sim double, "
        "vec_label string, neighbor_label string",
    )
    plan = formatted_plan(prune_pairs_group_topk(pairs, k=3))
    assert plan.count("WindowGroupLimit") >= 2


def test_knn_two_level_assignment_matches_numpy_reference(spark):
    """Past coarse_threshold the assignment goes two-level (coarse
    top-1 per centroid, vector top-coarse_probe coarse cells, rank
    member centroids). Verified against an independent numpy replay
    of the declared construction on a deterministic corpus — and the
    flat path on the same corpus is verified UNCHANGED (threshold
    respected)."""
    import numpy as np

    from wistia_data_pipeline_project_spark.operators.similarity import (
        knn_candidate_pairs,
    )

    rng = np.random.RandomState(7)
    n, dim, k = 120, 8, 12  # k > threshold(8) -> two-level; c = 3
    vecs = rng.randn(n, dim).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    cents = df.filter(f"vec_id < {k}").selectExpr(
        "cast(vec_id as int) centroid_id", "embedding cv"
    )
    got = {
        (r.vec_id, r.neighbor_id)
        for r in knn_candidate_pairs(
            df, cents, n_assign=2, n_centroids=k, coarse_threshold=8,
            coarse_probe=2,
        ).collect()
    }

    # ---- numpy replay of the same declared construction ----
    def cos(a, b):
        return (a @ b) / (np.sqrt(a @ a) * np.sqrt(b @ b))

    c = int(np.sqrt(k))  # isqrt
    # centroid -> top-1 coarse (sim desc, SELF-preference on ties,
    # coarse_id asc — the r07 empty-cell guard)
    cmap = {}
    for ci in range(k):
        sims = [(-cos(vecs[ci], vecs[co]), co != ci, co) for co in range(c)]
        cmap[ci] = min(sims)[2]
    # vector -> top-2 coarse
    cells = {}
    for v in range(n):
        sims = sorted((-cos(vecs[v], vecs[co]), co) for co in range(c))
        probed = {co for _, co in sims[:2]}
        members = [ci for ci in range(k) if cmap[ci] in probed]
        ranked = sorted((-cos(vecs[v], vecs[ci]), ci) for ci in members)
        cells[v] = {ci for _, ci in ranked[:2]}  # n_assign=2
    want = {
        (a, b)
        for a in range(n)
        for b in range(n)
        if a != b and cells[a] & cells[b]
    }
    assert got == want and len(want) > 0

    # flat path on the SAME corpus (n_centroids below threshold):
    # identical to not passing n_centroids at all
    flat_default = {
        (r.vec_id, r.neighbor_id)
        for r in knn_candidate_pairs(df, cents, n_assign=2).collect()
    }
    flat_declared = {
        (r.vec_id, r.neighbor_id)
        for r in knn_candidate_pairs(
            df, cents, n_assign=2, n_centroids=k, coarse_threshold=k,
        ).collect()
    }
    assert flat_declared == flat_default


def test_two_level_duplicate_centroids_lose_no_vectors(spark):
    """Degenerate corpus: ALL candidate centroid vectors identical —
    exact cosine ties everywhere. Without the self-preference
    tiebreak every coarse centroid maps to coarse cell 0 and cells
    1.. are EMPTY (the ADVICE r07 row-loss precondition); with it
    each coarse cell retains its own centroid, so emptiness is
    impossible BY CONSTRUCTION (not merely by the id-asc tie order
    happening to rank a non-empty twin first) and every vector keeps
    a full candidate set. Asserts the no-row-loss invariant."""
    import numpy as np

    from wistia_data_pipeline_project_spark.operators.similarity import (
        assign_cells,
    )

    rng = np.random.RandomState(3)
    n, dim, k = 60, 4, 12  # k > threshold(8) -> two-level, c = 3
    base = rng.randn(dim)
    vecs = rng.randn(n, dim)
    vecs[:k] = base  # the k centroid rows are all the SAME vector
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    cents = df.filter(f"vec_id < {k}").selectExpr(
        "cast(vec_id as int) centroid_id", "embedding cv"
    )
    assigned = assign_cells(
        df, cents, n_assign=1, n_centroids=k, coarse_threshold=8,
        coarse_probe=2,
    )
    got_ids = {r.vec_id for r in assigned.collect()}
    assert got_ids == set(range(n))  # every vector assigned exactly once


def test_semdedup_two_level_matches_numpy_reference(spark):
    """SemDeDup's assignment rides the shared assign_cells helper;
    past the threshold it must produce the same per-cluster stats as
    an independent numpy replay of the two-level construction + the
    dominance drop rule — CI's oracle sweep only exercises the flat
    regime (sf0.01, k=8), so this pins the two-level arm (review
    r06)."""
    import numpy as np

    from wistia_data_pipeline_project_spark.operators.similarity import (
        semdedup_stats,
    )

    rng = np.random.RandomState(11)
    n, dim, k, thr = 150, 8, 15, 0.45  # k > threshold(8) -> two-level
    vecs = rng.randn(n, dim).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    cents = df.filter(f"vec_id < {k}").selectExpr(
        "cast(vec_id as int) centroid_id", "embedding cv"
    )
    got = {
        r.centroid_id: (r.n_members, r.n_dropped, r.n_kept)
        for r in semdedup_stats(
            df, cents, threshold=thr, n_centroids=k, coarse_threshold=8,
        ).collect()
    }

    def cos(a, b):
        return (a @ b) / (np.sqrt(a @ a) * np.sqrt(b @ b))

    c = int(np.sqrt(k))
    cmap = {
        ci: min((-cos(vecs[ci], vecs[co]), co != ci, co) for co in range(c))[2]
        for ci in range(k)
    }
    cell = {}
    for v in range(n):
        probed = {co for _, co in sorted(
            (-cos(vecs[v], vecs[co]), co) for co in range(c))[:2]}
        members = [ci for ci in range(k) if cmap[ci] in probed]
        cell[v] = min((-cos(vecs[v], vecs[ci]), ci) for ci in members)[1]
    want = {}
    for ci in set(cell.values()):
        mem = sorted(v for v in range(n) if cell[v] == ci)
        dropped = {
            b for i, b in enumerate(mem)
            for a in mem[:i] if cos(vecs[a], vecs[b]) >= thr
        }
        want[ci] = (len(mem), len(dropped), len(mem) - len(dropped))
    assert got == want and len(want) > 1


def test_ivfpq_adc_topk_consistency_and_recall(spark, sf_dir):
    """IVF-PQ = IVF candidate pruning + ADC scoring: every returned
    row's adc_dist must EQUAL the exhaustive-ADC entry's value for
    that vec_id (the IVF stage only prunes, never rescores), and the
    2/8-probe pruning must retain at least half of the exhaustive ADC
    top-10 (the emb_ivf_topk recall bar)."""
    ivfpq = {
        r.vec_id: r.adc_dist
        for r in QUERIES["emb_ivfpq_adc_topk"](spark, sf_dir).collect()
    }
    assert len(ivfpq) == 10
    full = {
        r.vec_id: r.adc_dist
        for r in QUERIES["emb_pq_adc_topk"](spark, sf_dir).collect()
    }
    for vid, dist in ivfpq.items():
        if vid in full:
            assert dist == full[vid]
    assert len(set(ivfpq) & set(full)) >= 5


def test_three_level_assignment_matches_numpy_reference(spark):
    """Past iroot(k,2) > coarse_threshold the assignment goes
    THREE-level (r = icbrt(k); tiers r^2, r; top-1 maps with
    self-preference, the lower map built by probe-descent with the
    self candidate unioned in; vectors probe-descend keeping top-p
    per tier). Verified against an independent numpy replay of the
    declared construction — the round-8 O(N log N) fix for the
    measured Theta(N^1.5) two-level assignment (SCALE.md r07)."""
    import numpy as np

    from wistia_data_pipeline_project_spark.operators.similarity import (
        _tier_sizes,
        assign_cells,
    )

    rng = np.random.RandomState(17)
    n, dim, k, B, p, na = 120, 8, 30, 3, 2, 2
    assert _tier_sizes(k, B) == [9, 3]  # r = icbrt(30) = 3
    vecs = rng.randn(n, dim).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    cents = df.filter(f"vec_id < {k}").selectExpr(
        "cast(vec_id as int) centroid_id", "embedding cv"
    )
    got = {
        (r.vec_id, r.centroid_id)
        for r in assign_cells(
            df, cents, n_assign=na, n_centroids=k,
            coarse_threshold=B, coarse_probe=p,
        ).collect()
    }

    def cos(a, b):
        return (a @ b) / (np.sqrt(a @ a) * np.sqrt(b @ b))

    s1, s2 = 9, 3
    # m1: tier-1 -> top-1 tier-2 (exact cross argmax, self-pref)
    m1 = {
        c1: min(
            (-cos(vecs[c1], vecs[c2]), c2 != c1, c2) for c2 in range(s2)
        )[2]
        for c1 in range(s1)
    }
    # m0: tier-0 -> top-1 tier-1 via probe-descent + self union
    m0 = {}
    for c in range(k):
        kept2 = {
            c2 for _, c2 in sorted(
                (-cos(vecs[c], vecs[c2]), c2) for c2 in range(s2)
            )[:p]
        }
        cand = {c1 for c1 in range(s1) if m1[c1] in kept2 and c1 != c}
        if c < s1:
            cand.add(c)
        m0[c] = min((-cos(vecs[c], vecs[c1]), c1 != c, c1) for c1 in cand)[2]
    # vector descent
    want = set()
    for v in range(n):
        kept2 = {
            c2 for _, c2 in sorted(
                (-cos(vecs[v], vecs[c2]), c2) for c2 in range(s2)
            )[:p]
        }
        cand1 = [c1 for c1 in range(s1) if m1[c1] in kept2]
        kept1 = {
            c1 for _, c1 in sorted(
                (-cos(vecs[v], vecs[c1]), c1) for c1 in cand1
            )[:p]
        }
        cand0 = [c for c in range(k) if m0[c] in kept1]
        for _, c in sorted(
            (-cos(vecs[v], vecs[c]), c) for c in cand0
        )[:na]:
            want.add((v, c))
    assert got == want and len(want) > 0


def test_three_level_duplicate_centroids_lose_no_vectors(spark):
    """Degenerate corpus at L=3: ALL candidate centroid vectors
    identical — exact ties at every tier. The self-preference chain
    (cross-argmax tie-break at the top map, explicit self union in
    the descent-built map) must keep every cell non-empty so no
    vector loses its assignment."""
    import numpy as np

    from wistia_data_pipeline_project_spark.operators.similarity import (
        assign_cells,
    )

    rng = np.random.RandomState(5)
    n, dim, k, B = 80, 4, 30, 3
    base = rng.randn(dim)
    vecs = rng.randn(n, dim)
    vecs[:k] = base  # all 30 centroid rows are the SAME vector
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    cents = df.filter(f"vec_id < {k}").selectExpr(
        "cast(vec_id as int) centroid_id", "embedding cv"
    )
    assigned = assign_cells(
        df, cents, n_assign=1, n_centroids=k, coarse_threshold=B,
        coarse_probe=2,
    )
    got_ids = {r.vec_id for r in assigned.collect()}
    assert got_ids == set(range(n))


def test_tier_sizes_declared_chain():
    """The tier-size chain is pure integer arithmetic shared with the
    oracle SQL arms: L = smallest level count with iroot(k,L) <=
    branch, sizes r^(L-1)..r. Boundaries: 4224 is the last L=2 k
    (isqrt=64), 274624 the last L=3 k (icbrt=64)."""
    from wistia_data_pipeline_project_spark.operators.similarity import (
        _iroot,
        _tier_sizes,
    )

    assert _tier_sizes(64, 64) == []
    assert _tier_sizes(65, 64) == [8]          # isqrt(65)
    assert _tier_sizes(4224, 64) == [64]       # isqrt(4224) = 64
    assert _tier_sizes(4225, 64) == [256, 16]  # L=3, r=16
    assert _tier_sizes(8000, 64) == [400, 20]
    assert _tier_sizes(274624, 64) == [4096, 64]
    assert _tier_sizes(274625, 64) == [274625 ** 0 * 0 + _iroot(274625, 4) ** 3,
                                       _iroot(274625, 4) ** 2,
                                       _iroot(274625, 4)]  # L=4
    assert _iroot(4096, 3) == 16 and _iroot(4095, 3) == 15
    assert _iroot(2**62, 2) == 2**31


def test_oracle_asg_arms_match_engine_in_all_regimes(spark):
    """The oracle's UNION-ALL assignment arms (flat / L=2 / L=3 /
    L=4) must replay the ENGINE's declared construction
    bit-for-bit in DuckDB. The driver's sweep only ever exercises the
    flat arm (k <= 64 at every driver SF), so this pins the deeper
    arms by re-rendering the shared SQL builder with tiny band
    literals (branch=3, cell_size chosen so k lands in each band) and
    comparing the (vec_id, centroid_id) assignment sets."""
    import duckdb
    import numpy as np
    import pandas as pd

    from wistia_data_pipeline_project_spark.operators.similarity import (
        _tier_sizes,
        assign_cells,
    )
    from wistia_data_pipeline_project_spark.plans.catalog_emb import (
        _knn_asg_sql,
    )

    rng = np.random.RandomState(23)
    n, dim = 200, 6
    vecs = rng.randn(n, dim).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    pdf = pd.DataFrame(
        {"vec_id": range(n), "embedding": [list(map(float, v)) for v in vecs]}
    )
    con = duckdb.connect()
    con.register("embeddings", pdf)

    # cell_size 17 -> k=11: two-level band at branch=3 (3 < 11 <=
    # 15); cell_size 5 -> k=40: three-level band (15 < 40 <= 63);
    # cell_size 1 -> k=200: four-level band (63 < 200 <= 255)
    for cell_size, want_tiers in (
        (17, [3]),
        (5, [9, 3]),
        (1, [27, 9, 3]),
    ):
        k = max(8, n // cell_size)
        assert _tier_sizes(k, 3) == want_tiers
        cents = df.filter(f"vec_id < {k}").selectExpr(
            "cast(vec_id as int) centroid_id", "embedding cv"
        )
        got = {
            (r.vec_id, r.centroid_id)
            for r in assign_cells(
                df, cents, n_assign=4, n_centroids=k,
                coarse_threshold=3, coarse_probe=2,
            ).collect()
        }
        sql = (
            _knn_asg_sql(False, cell_size=cell_size, flat_k=3, branch=3)
            + " SELECT vec_id, centroid_id FROM asg"
        )
        want = {(r[0], r[1]) for r in con.sql(sql).fetchall()}
        assert got == want and len(want) >= n, (cell_size, len(got))


def test_near_dup_cascade_collapses_mega_group(spark):
    """A 100-copy identical-vector group + one near-dup + one far
    vector: the raw blocked entry would emit C(100,2)=4950 cosine-1
    intra pairs; the cascade emits ZERO intra pairs and one
    representative edge to the near-dup carrying n_cross_pairs =
    100*1 — the viral-copy quadratic killed by construction."""
    import numpy as np

    from wistia_data_pipeline_project_spark.operators.similarity import (
        cosine_near_dup_blocked,
        near_dup_cascade,
    )

    rng = np.random.RandomState(31)
    dim = 8
    base = rng.randn(dim)
    near = base + 0.05 * rng.randn(dim)   # cosine ~0.999
    far = -base                            # cosine -1
    rows = [(i, [float(x) for x in base]) for i in range(100)]
    rows.append((100, [float(x) for x in near]))
    rows.append((101, [float(x) for x in far]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = df.filter("vec_id IN (0, 100, 101)").selectExpr(
        "cast(vec_id as int) centroid_id", "embedding cv"
    )

    raw = cosine_near_dup_blocked(df, cents, threshold=0.9, n_assign=2)
    assert raw.count() == 100 * 99 // 2 + 100  # intra pairs + near edges

    out = near_dup_cascade(df, cents, threshold=0.9, n_assign=2).collect()
    assert [(r.rep_a, r.rep_b, r.size_a, r.size_b, r.n_cross_pairs)
            for r in out] == [(0, 100, 100, 1, 100)]


def test_label_drift_drops_labels_missing_a_half(spark):
    """A label with vectors in only one parity half must DROP from
    emb_label_drift's output (the oracle's inner a.h=0/b.h=1 join
    semantics), and identical halves must report cosine ~1.0 (exact
    up to sqrt(x)*sqrt(x) != x in IEEE)."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from wistia_data_pipeline_project_spark.plans import QUERIES

    # label 1: identical vector in both halves (ids 0,1) -> cosine 1.0
    # label 2: only even ids (2, 4) -> half 1 empty -> dropped
    rows = [
        (0, [1.0, 2.0] + [0.0] * 62, 1),
        (1, [1.0, 2.0] + [0.0] * 62, 1),
        (2, [3.0] * 64, 2),
        (4, [5.0] * 64, 2),
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "embeddings.parquet"))
        out = {
            r.label: r
            for r in QUERIES["emb_label_drift"](spark, d).collect()
        }
    assert set(out) == {1}
    assert (out[1].n_a, out[1].n_b) == (1, 1)
    assert abs(out[1].centroid_cosine - 1.0) < 1e-12


def test_ivf_incremental_merge_equals_full_recompute(spark, sf_dir):
    from pyspark.sql import functions as F
    """The mergeability property the whole incremental-maintenance
    design rests on: merged (existing + batch) moment state must equal
    ivf_cell_stats over the full corpus — decimal partials are exact,
    so the updated mean the drift gate sees IS the from-scratch mean."""
    import wistia_data_pipeline_project_spark.operators.similarity as S
    from wistia_data_pipeline_project_spark.sources.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("integer").alias("centroid_id"),
        F.col("embedding").alias("cv"),
    )
    existing = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    o = S.ivf_cell_stats(existing, cents)
    b = S.ivf_cell_stats(batch, cents)
    merged = {
        (r.centroid_id, r.i): (r.s_sum, r.n_sum)
        for r in o.select("centroid_id", "i", "s", "n")
        .unionAll(b.select("centroid_id", "i", "s", "n"))
        .groupBy("centroid_id", "i")
        .agg(F.sum("s").alias("s_sum"), F.sum("n").alias("n_sum"))
        .collect()
    }
    full = {
        (r.centroid_id, r.i): (r.s, r.n)
        for r in S.ivf_cell_stats(emb, cents).collect()
    }
    assert merged == full


def test_ivf_merged_state_equals_full_recompute(spark, sf_dir):
    from pyspark.sql import functions as F
    """The production-loop contract (ADVICE r10): ivf_merged_state is
    the ADVANCED persisted state — schema-identical to ivf_cell_stats
    and bit-equal to the from-scratch build over (existing ∪ batch),
    so replacing the persisted table with it after each ingest
    compounds across successive batches."""
    import wistia_data_pipeline_project_spark.operators.similarity as S
    from wistia_data_pipeline_project_spark.sources.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("integer").alias("centroid_id"),
        F.col("embedding").alias("cv"),
    )
    existing = emb.filter(F.col("vec_id") % 10 > 1)
    b1 = emb.filter(F.col("vec_id") % 10 == 0)
    b2 = emb.filter(F.col("vec_id") % 10 == 1)
    state = S.ivf_cell_stats(existing, cents)
    # two successive ingests, each replacing the persisted state
    state = S.ivf_merged_state(state, b1, cents)
    assert state.columns == ["centroid_id", "i", "s", "n"]
    state = S.ivf_merged_state(state, b2, cents)
    got = {
        (r.centroid_id, r.i): (r.s, r.n) for r in state.collect()
    }
    full = {
        (r.centroid_id, r.i): (r.s, r.n)
        for r in S.ivf_cell_stats(emb, cents).collect()
    }
    assert got == full
    # persisted-state shape: collapsed to one partition
    assert state.rdd.getNumPartitions() == 1


def test_ivf_incremental_drift_gate_trips_on_moved_batch(spark):
    from pyspark.sql import functions as F  # noqa: F401
    """A batch that lands far from a cell's existing mass must flip
    needs_recluster for that cell and leave undrifted cells alone; a
    brand-new cell (no existing members) reports NULL cosine + TRUE."""
    import wistia_data_pipeline_project_spark.operators.similarity as S

    dim = 4
    mk = lambda v: [float(v)] * dim  # noqa: E731
    cents = spark.createDataFrame(
        [(0, mk(1.0)), (1, [0.0] * (dim - 1) + [1.0]), (2, mk(-1.0))],
        "centroid_id int, cv array<float>",
    )
    # cell 0: tight existing cluster; cell 1: existing cluster; cell 2
    # gets NO existing members
    existing = spark.createDataFrame(
        [(10, mk(0.9)), (11, mk(1.1)), (12, [0.1] * (dim - 1) + [2.0])],
        "vec_id long, embedding array<float>",
    )
    # batch: one vector near cell 0's mean (no drift), one vector that
    # joins cell 1 but points elsewhere (drift), one opposite vector
    # opening cell 2
    batch = spark.createDataFrame(
        [
            (20, mk(1.0)),
            (21, [0.0, 0.0, 1.5, 2.0]),
            (22, mk(-1.0)),
        ],
        "vec_id long, embedding array<float>",
    )
    stats = S.ivf_cell_stats(existing, cents)
    out = {
        r.centroid_id: r
        for r in S.ivf_incremental_update(stats, batch, cents).collect()
    }
    assert set(out) == {0, 1, 2}
    assert (out[0].n_existing, out[0].n_batch) == (2, 1)
    assert not out[0].needs_recluster
    assert out[0].centroid_cosine > 0.9999
    assert out[1].needs_recluster and out[1].centroid_cosine < 0.9999
    assert out[2].n_existing == 0 and out[2].n_batch == 1
    assert out[2].centroid_cosine is None and out[2].needs_recluster
