"""Connected-components clustering over near-dup pair graphs.

Pairwise dedup (MinHash/SimHash/Jaccard) emits EDGES; a real pipeline
must turn them into duplicate GROUPS before it can pick one canonical
survivor per group — near-duplication is transitive in effect (A≈B,
B≈C ⇒ keep one of {A,B,C}) even though the pairwise relation is not.
This module closes that gap with a distributed connected-components
operator.

Algorithm: iterated min-label propagation with pointer doubling (the
"hash-to-min" family — Kiveris et al., *Connected Components in
MapReduce and Beyond*, SoCC'14; public algorithm). Each node carries
a label = the smallest node id it has proven reachable; every round
(1) pulls neighbor labels across the edge list and keeps the min,
then (2) follows the label chain one hop (label[u] ←
min(label[u], label[label[u]])). Doubling makes the per-round reach
grow geometrically, so convergence takes O(log diameter) rounds, not
O(diameter) — the difference between 4 and 40 shuffles on a long
chain of chunk overlaps.

Scale design (100 TB):

- State per node is two longs (node, label) — the TEXT never enters
  the graph; edges are produced by the dedup operators which already
  shuffle fingerprints, not documents.
- Each round is: one equi-join of edges⋈labels (shuffle keyed on the
  join column), one ``min`` aggregate (map-side combinable — a
  high-degree hub node collapses to one row per mapper before the
  exchange), and one labels self-join for the doubling hop.
- Label tables are materialized per round with ``localCheckpoint``:
  lazily chaining rounds doubles the plan per iteration (the same
  lesson as the k-means trainer, similarity.py), while checkpointing
  keeps every round's plan shape identical so codegen is reused.
- Convergence is detected by the per-round sum of labels (labels only
  ever decrease, so sum-unchanged ⇔ fixpoint), summed in
  decimal(38,0) — exact and associative, and immune to long overflow
  on 64-bit node ids at full scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wistia_data_pipeline_project_spark.ckpt import spill_checkpoint


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 15,
) -> DataFrame:
    """(node, component) for every node in ``edges``, where component
    is the smallest node id in the node's connected component.

    ``edges`` is an undirected pair list (direction ignored, self
    loops harmless). Nodes with no edges are absent from the output —
    singletons are their own component by definition and callers that
    need them can union them in without paying for the iteration.

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``max_iter`` rounds rather than returning a silently incomplete
    clustering (with pointer doubling, 15 rounds cover diameters
    ~2^15 — any real dup graph converges long before that).
    """
    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    und = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    und = spill_checkpoint(und, eager=True)
    labels = (
        und.groupBy("u")
        .agg(F.min("v").alias("_mv"))
        .select("u", F.least(F.col("u"), F.col("_mv")).alias("component"))
    )
    # LAZY checkpoints, materialized BY the convergence-sum action
    # (r11): eager=True ran one job to build the blocks and a second
    # to read the sum — the sum action itself populates the cache, so
    # each round is ONE job instead of two (same blocks, same plan).
    labels = spill_checkpoint(labels)

    def _label_sum(lbl: DataFrame):
        # labels only ever decrease, so sum-unchanged ⇔ fixpoint;
        # decimal(38,0) is exact and overflow-free on 64-bit ids
        return lbl.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).head()["s"]

    # seeding with the initial sum lets a graph that is already at its
    # fixpoint (every component diameter ≤ 2, the common dup-graph
    # case) exit after ONE round instead of paying a second full
    # propagation just to observe an unchanged sum
    prev_sum = _label_sum(labels)
    if prev_sum is None:  # no edges at all: the fixpoint is empty
        return labels.select(F.col("u").alias("node"), "component")
    for _ in range(max_iter):
        nbr = und.join(
            labels.select(F.col("u").alias("v"), "component"), "v"
        ).select("u", "component")
        # NOT checkpointed: the doubling self-join references this
        # subtree twice, but its lineage is one join + one agg over the
        # two checkpoints — recomputing it inside a single job is
        # cheaper than a third materialization barrier per round.
        prop = (
            nbr.union(labels.select("u", "component"))
            .groupBy("u")
            .agg(F.min("component").alias("component"))
        )
        # pointer doubling: follow the label chain one hop. Labels are
        # node ids, so label[u]'s own row carries label[label[u]].
        hop = prop.join(
            prop.select(
                F.col("u").alias("component"), F.col("component").alias("_c2")
            ),
            "component",
            "left",
        ).select(
            "u",
            F.least(
                F.col("component"), F.coalesce(F.col("_c2"), F.col("component"))
            ).alias("component"),
        )
        labels = spill_checkpoint(hop)
        s = _label_sum(labels)
        if s == prev_sum:
            return labels.select(F.col("u").alias("node"), "component")
        prev_sum = s
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "the edge graph has pathological diameter — raise max_iter"
    )


def dup_clusters(
    pairs: DataFrame,
    key_a: str = "doc_a",
    key_b: str = "doc_b",
    max_iter: int = 15,
) -> DataFrame:
    """Duplicate groups from a near-dup pair list: one row per clustered
    node with its cluster id (= min member), a canonical flag (the
    dedup survivor under min-key-wins, the engine-wide rule from
    ``exact_dedup``), and the cluster size.

    The size join is keyed on the component id — one extra small
    shuffle over the label table, no text movement.
    """
    cc = connected_components(pairs, key_a, key_b, max_iter)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("n_members"))
    return cc.join(sizes, "component").select(
        F.col("node"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_canonical"),
        "n_members",
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    quantize: int | None = None,
) -> DataFrame:
    """PageRank (Brin & Page 1998) over a directed edge list — the
    graph-importance scorer that complements ``connected_components``
    (groups) with a ranking signal (e.g. canonical-document choice by
    link authority instead of plain length, or crawl-frontier
    prioritization in a 100 TB web corpus).

    Standard power iteration with dangling-mass redistribution:
    r' = (1−d)/N + d·(Σ_in r/outdeg + dangling_mass/N). Scores sum to
    1 every round (asserted by the tests), so the returned ranks are
    a probability distribution.

    Scale shape per round: edges⋈ranks on src (the one fact-sized
    shuffle — out-degrees are joined once, pre-computed), a map-side
    combinable sum on dst, and a 1-row dangling-mass aggregate
    (broadcast back as a literal via the closed-loop driver value —
    one scalar per round, NOT a collect of the rank table).
    ``localCheckpoint`` per round pins the plan (the iterative-plan
    lesson shared with kmeans_fit and connected_components). Rounds
    are O(log ε) for fixed damping; 10 rounds ≈ 1e-2 accuracy, the
    crawl-prioritization regime.
    """
    # pin the EDGE LIST first: every iteration's contrib join (and
    # outdeg/nodes) re-reads it, and an expensive upstream lineage
    # (e.g. a near-dup pair join) would otherwise re-execute per
    # round — measured 28 s -> ~4 s on the docs_pagerank entry.
    # Executor-local, edge-list-sized (two keys/row), disk-spillable.
    # LAZY checkpoints throughout (r11): the first consuming action
    # (the node count / each round's dangling-mass scalar) populates
    # the blocks, so every round is ONE job instead of two — same
    # blocks, same plans.
    edges = spill_checkpoint(edges.select(src_col, dst_col))
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .union(edges.select(F.col(dst_col).alias("node")))
        .distinct()
    )
    nodes = spill_checkpoint(nodes)
    n_nodes = nodes.count()
    if n_nodes == 0:  # empty graph: empty ranks, not a ZeroDivisionError
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = edges.groupBy(F.col(src_col).alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    ranks = spill_checkpoint(nodes.withColumn("rank", F.lit(1.0 / n_nodes)))
    base = (1.0 - damping) / n_nodes
    # quantize: round each per-edge contribution (and the dangling
    # terms) to that many decimals and sum in DECIMAL — the hash-gated
    # catalog path, where double-sum addition order would otherwise
    # drift between engines over the iterations (ndcg_at_k pattern).
    if quantize is not None:
        qd = f"decimal(28,{quantize})"
        cexpr = F.round(F.col("rank") / F.col("outdeg"), quantize).cast(qd)
        dexpr = F.sum(F.round(F.col("rank"), quantize).cast(qd))
    else:
        cexpr = F.col("rank") / F.col("outdeg")
        dexpr = F.sum("rank")
    for _ in range(n_iter):
        with_deg = ranks.join(outdeg, "node", "left")
        # dangling mass: ranks of nodes with no out-edges (one scalar)
        dangling = float(
            with_deg.filter(F.col("outdeg").isNull()).agg(dexpr).head()[0]
            or 0.0
        )
        contrib = (
            edges.join(
                with_deg.filter(F.col("outdeg").isNotNull()),
                edges[src_col] == F.col("node"),
            )
            .select(F.col(dst_col).alias("node"), cexpr.alias("c"))
            .groupBy("node")
            .agg(F.sum("c").cast("double").alias("in_mass"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("in_mass"), F.lit(0.0))
                        + F.lit(dangling / n_nodes)
                    )
                ).alias("rank"),
            )
        )
        ranks = spill_checkpoint(ranks)
    return ranks


def triangle_stats(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Triangle count + global clustering coefficient over an
    undirected graph (edges in either/both directions; self-loops
    dropped) — the graph-density diagnostic for near-dup pair graphs
    (a high coefficient says duplicates come in CLUSTERS, so
    transitive closure will collapse far more than the pair count
    suggests; a low one says scattered pairs). One row:
    (n_nodes, n_edges, n_wedges, n_triangles, clustering_coeff =
    3·triangles/wedges).

    Algorithm: degree orientation (Suri & Vassilvitskii 2011, the
    MapReduce standard) — orient every undirected edge from the
    lower-(degree, id) endpoint to the higher, so each triangle is
    counted EXACTLY once and per-node wedge generation is bounded by
    oriented out-degree ≤ O(sqrt(|E|)) even on power-law hubs (a
    celebrity node's quadratic wedge explosion is the failure this
    orientation exists to prevent).

    Scale: three shuffles — the dedup/degree pass, the wedge
    self-join keyed on the wedge apex, and the wedge⋈edge semi-join
    keyed on the closing pair. Wedge volume Σ outdeg² is the honest
    cost; with degree orientation it's O(|E|^1.5) worst case, the
    best known for exact counting.
    """
    und = (
        edges.select(
            F.least(src_col, dst_col).alias("u"),
            F.greatest(src_col, dst_col).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("n"))
        .union(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    j = und.join(du, "u").join(dv, "v")
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = j.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    o1 = oriented.select(F.col("a"), F.col("b").alias("w1"))
    o2 = oriented.select(F.col("a"), F.col("b").alias("w2"))
    wedges = o1.join(o2, "a").filter(F.col("w1") < F.col("w2"))
    closing = oriented.select(
        F.least("a", "b").alias("w1"), F.greatest("a", "b").alias("w2")
    ).distinct()
    # one LAZY plan: the three scalar aggregates stay DataFrames and
    # crossJoin into the single stats row — no driver collect, no
    # separate jobs (at scale the three branches share the dedup'd
    # edge scan; the coefficient is computed as a column expression)
    tri = (
        wedges.join(closing, ["w1", "w2"], "left_semi")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.coalesce(
            (F.sum(F.col("d") * (F.col("d") - 1)) / 2).cast("long"), F.lit(0)
        ).alias("n_wedges"),
    )
    ecount = und.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        stats.crossJoin(ecount)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.when(
                F.col("n_wedges") > 0,
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"),
            ).alias("clustering_coeff"),
        )
    )


def k_core(
    edges: DataFrame,
    k: int = 2,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 12,
) -> DataFrame:
    """The k-core of an undirected graph: the maximal subgraph in
    which every node has degree ≥ k, by iterative peeling — drop all
    nodes of degree < k, re-project the edges, repeat to fixpoint.
    The standard density filter on near-dup graphs: a pure A≈B pair
    peels away, a clique of 3+ mutual near-dups survives the 2-core,
    so the core isolates the heavy template/boilerplate families
    from incidental pairs. Returns ``(node, core_degree)`` — degree
    measured INSIDE the core.

    Peeling is monotone (survivor sets only shrink), so the fixpoint
    is unique and order-independent; an oracle replays it as a fixed
    unrolled round count, with extra rounds past the fixpoint being
    no-ops. Raises ``RuntimeError`` if ``max_rounds`` rounds don't
    reach the fixpoint rather than returning a non-core superset.

    Scale design: each round is one map-combinable degree aggregate
    plus two semi-joins keyed on the node id — never the payload; the
    edge table is re-checkpointed per round (serialized spill level)
    so round plans stay constant-size. Rounds needed = the peel
    depth, bounded by graph degeneracy — single digits on real dup
    graphs (long pendant chains peel one hop per round, the CC
    pointer-doubling argument does not apply, hence the explicit
    round cap).
    """
    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    und = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    und = spill_checkpoint(und, eager=True)
    n_prev = und.select("u").distinct().count()
    for _ in range(max_rounds):
        deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("_d"))
        # materialize the survivor list ONCE: the count() fixpoint
        # check and both semi-joins read the checkpointed blocks
        # instead of re-running the degree aggregate per consumer
        # (review r07 pass 2). The checkpoint is LAZY — the count()
        # action populates the blocks, one job instead of two (r11).
        keep = spill_checkpoint(deg.filter(F.col("_d") >= k).select("u"))
        n_now = keep.count()
        if n_now == n_prev:
            return und.groupBy("u").agg(
                F.count(F.lit(1)).cast("long").alias("core_degree")
            ).select(F.col("u").alias("node"), "core_degree")
        und = spill_checkpoint(
            und.join(keep, "u", "left_semi").join(
                keep.select(F.col("u").alias("v")), "v", "left_semi"
            )
        )
        n_prev = n_now
    raise RuntimeError(
        f"k_core did not reach the peeling fixpoint in {max_rounds} "
        "rounds — raise max_rounds (and the oracle's unroll count)"
    )
