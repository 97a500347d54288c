"""Connected-components clustering: min-label propagation with pointer
doubling over near-dup pair graphs (operators/clustering.py)."""

from __future__ import annotations

import random

import pytest

from wistia_data_pipeline_project_spark.operators.clustering import (
    connected_components,
    dup_clusters,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def _cc(spark, pairs, **kw):
    rows = connected_components(_edges_df(spark, pairs), **kw).collect()
    return {r.node: r.component for r in rows}


def _union_find(pairs):
    """Plain-Python reference: min id per component."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_chain_collapses_to_min(spark):
    # a 12-node path: every node must reach label 0 across 11 hops —
    # the case pointer doubling exists for
    pairs = [(i, i + 1) for i in range(11)]
    got = _cc(spark, pairs)
    assert got == {i: 0 for i in range(12)}


def test_two_components_and_direction_independence(spark):
    pairs = [(5, 3), (3, 9), (20, 21), (22, 21)]
    got = _cc(spark, pairs)
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20, 22: 20}


def test_self_loops_and_duplicate_edges_harmless(spark):
    pairs = [(1, 1), (1, 2), (2, 1), (1, 2)]
    got = _cc(spark, pairs)
    assert got == {1: 1, 2: 1}


def test_matches_union_find_on_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 40
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(30 + 10 * trial)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        assert _cc(spark, pairs) == _union_find(pairs)


def test_raises_instead_of_partial_result(spark):
    # one round cannot close a 12-hop chain; the operator must refuse
    # to return a half-merged clustering
    pairs = [(i, i + 1) for i in range(11)]
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(_edges_df(spark, pairs), max_iter=1)


def test_dup_clusters_sizes_and_canonical(spark):
    pairs = [(10, 11), (11, 12), (30, 31)]
    rows = dup_clusters(_edges_df(spark, pairs)).collect()
    got = {r.node: (r.cluster_id, r.is_canonical, r.n_members) for r in rows}
    assert got == {
        10: (10, True, 3),
        11: (10, False, 3),
        12: (10, False, 3),
        30: (30, True, 2),
        31: (30, False, 2),
    }


def test_empty_edges_returns_empty(spark):
    out = connected_components(_edges_df(spark, []))
    assert out.count() == 0


def test_centroid_classify_separable(spark):
    """Perfectly separable clusters classify at accuracy 1.0."""
    import os
    import tempfile

    from wistia_data_pipeline_project_spark.plans import QUERIES

    rows = []
    vid = 0
    for lbl, base in ((0, [10.0, 0.0]), (1, [0.0, 10.0])):
        for j in range(5):
            vec = [base[0] + j * 0.01, base[1] + j * 0.01] + [0.0] * 62
            rows.append((vid, vec, lbl))
            vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    with tempfile.TemporaryDirectory() as td:
        emb.write.parquet(os.path.join(td, "embeddings.parquet"))
        out = QUERIES["emb_centroid_classify"](spark, td).collect()
    assert len(out) == 2
    for r in out:
        assert r.n == 5 and r.n_correct == 5 and r.accuracy == 1.0


def test_cohort_ltv_cumulative_invariants(spark, sf_dir):
    """Cumulative revenue is the running sum of the age axis and ends
    at each cohort's total."""
    from collections import defaultdict

    from wistia_data_pipeline_project_spark.plans import QUERIES

    rows = QUERIES["orders_cohort_ltv"](spark, sf_dir).collect()
    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r.cohort_year].append(r)
    for ch, rs in by_cohort.items():
        rs.sort(key=lambda r: r.age)
        run = 0.0
        for r in rs:
            run += r.revenue
            assert abs(r.cum_revenue - run) < 1e-6


def _pagerank_reference(edges, n_iter=10, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out = {}
    for u, v in edges:
        out.setdefault(u, []).append(v)
    r = {u: 1.0 / n for u in nodes}
    for _ in range(n_iter):
        dangling = sum(r[u] for u in nodes if u not in out)
        nxt = {u: 0.0 for u in nodes}
        for u, vs in out.items():
            share = r[u] / len(vs)
            for v in vs:
                nxt[v] += share
        r = {
            u: (1 - d) / n + d * (nxt[u] + dangling / n)
            for u in nodes
        }
    return r


def test_pagerank_matches_reference_and_sums_to_one(spark):
    """Chain + hub + dangling node: Spark power iteration matches the
    plain-Python reference and conserves probability mass."""
    from wistia_data_pipeline_project_spark.operators.clustering import pagerank

    edges = [
        (1, 2), (2, 3), (3, 1),          # cycle
        (4, 1), (5, 1), (6, 1),          # hub fan-in
        (1, 7),                          # 7 is dangling (no out-edges)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=12).collect()}
    want = _pagerank_reference(edges, n_iter=12)
    assert set(got) == set(want)
    for u in want:
        assert got[u] == pytest.approx(want[u], rel=1e-9), u
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # structure: the cycle member fed by the hub outranks leaf sources
    assert got[1] > got[4]


def test_pagerank_uniform_on_symmetric_cycle(spark):
    from wistia_data_pipeline_project_spark.operators.clustering import pagerank

    cyc = [(i, (i + 1) % 5) for i in range(5)]
    df = spark.createDataFrame(cyc, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=8).collect()}
    for v in got.values():
        assert v == pytest.approx(0.2, rel=1e-12)


def test_pagerank_empty_graph(spark):
    from wistia_data_pipeline_project_spark.operators.clustering import pagerank

    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty, n_iter=3).count() == 0


def test_triangle_stats_known_graphs(spark):
    from wistia_data_pipeline_project_spark.operators.clustering import (
        triangle_stats,
    )

    # K4: 4 triangles, 12 wedges, coefficient 1.0
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    r = triangle_stats(spark.createDataFrame(k4, "src long, dst long")).head()
    assert (r["n_triangles"], r["n_wedges"]) == (4, 12)
    assert abs(r["clustering_coeff"] - 1.0) < 1e-12
    # C5 cycle: no triangles, 5 wedges
    c5 = [(i, (i + 1) % 5) for i in range(5)]
    r = triangle_stats(spark.createDataFrame(c5, "src long, dst long")).head()
    assert r["n_triangles"] == 0 and r["n_wedges"] == 5
    assert r["clustering_coeff"] == 0.0


def test_triangle_stats_matches_reference_on_random_graph(spark):
    import itertools
    import random

    from wistia_data_pipeline_project_spark.operators.clustering import (
        triangle_stats,
    )

    rng = random.Random(11)
    nodes = list(range(30))
    edges = [
        (u, v) for u, v in itertools.combinations(nodes, 2) if rng.random() < 0.2
    ]
    # feed DUPLICATED and reversed edges + self loops: must normalize
    noisy = edges + [(v, u) for u, v in edges[:20]] + [(3, 3)]
    adj = {n: set() for n in nodes}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    want = sum(
        1
        for u, v, w in itertools.combinations(nodes, 3)
        if v in adj[u] and w in adj[u] and w in adj[v]
    )
    r = triangle_stats(spark.createDataFrame(noisy, "src long, dst long")).head()
    assert r["n_triangles"] == want
    assert r["n_edges"] == len(edges)
    wedges = sum(len(a) * (len(a) - 1) // 2 for a in adj.values())
    assert r["n_wedges"] == wedges


def test_k_core_peels_pendants_keeps_clique(spark):
    """Triangle {1,2,3} with a pendant chain 3-4-5 and an isolated
    pair 8-9: the 2-core is exactly the triangle (degree 2 each) —
    the chain peels one hop per round, the pair peels immediately."""
    from wistia_data_pipeline_project_spark.operators.clustering import (
        k_core,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (8, 9)],
        "doc_a long, doc_b long",
    )
    got = {r.node: r.core_degree for r in k_core(edges, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_k_core_raises_past_round_cap(spark):
    """A 6-node path needs 3 peel rounds to empty; max_rounds=1 must
    RAISE rather than return a non-core superset (the oracle-unroll
    contract)."""
    import pytest

    from wistia_data_pipeline_project_spark.operators.clustering import (
        k_core,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        k_core(edges, k=2, max_rounds=1)


def test_k_core_empty_after_peel_is_empty_not_error(spark):
    from wistia_data_pipeline_project_spark.operators.clustering import (
        k_core,
    )

    edges = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    assert k_core(edges, k=2).count() == 0
