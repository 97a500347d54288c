"""Similarity search over embedding columns (north_star): brute-force
cosine top-k as the exact baseline, and an IVF-style
centroid-partitioned variant as the 100 TB scale path.

All vector math runs JVM-side on ``array<double>`` columns via
higher-order functions (zip_with + aggregate) — sequential left-fold,
bit-deterministic, no Python in the loop. A Pandas-UDF BLAS path is a
possible future optimization for very wide vectors; at dim=64 the
codegen'd fold wins by avoiding Arrow transfer entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from wistia_data_pipeline_project_spark.ckpt import spill_checkpoint


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def dot_sql(a: str, b: str, dim: int) -> str:
    """The :func:`dot_unrolled` chain as ONE SQL string over SQL
    column references — for embedding in a larger ``F.expr``. Building
    the chain with Column operators costs ~3 py4j round trips per dim
    (measured 0.4–1.4 s of pure driver↔JVM chatter per 64-dim chain,
    billed to every plan BUILD); one parsed string is ~1 ms and yields
    the identical left-associated tree (r11 optimization)."""
    terms = "".join(
        f" + element_at({a}, {i}) * element_at({b}, {i})"
        for i in range(1, dim + 1)
    )
    return f"0.0D{terms}"


def dot_lit_sql(a: str, q: list[float]) -> str:
    """:func:`dot_sql` with a LITERAL query vector inlined per term —
    the same left-fold summation order, one parsed string. The ``D``
    suffix forces DOUBLE literals and ``repr`` round-trips doubles
    exactly (the pq_codes VALUES precedent)."""
    terms = "".join(
        f" + element_at({a}, {i}) * {float(x)!r}D"
        for i, x in enumerate(q, 1)
    )
    return f"0.0D{terms}"


def cosine_to_query(vec_ref: str, query_vec: list[float]) -> Column:
    """``cosine(vec, literal query)`` as ONE parsed expression —
    bit-identical to :func:`cosine`: the dot and the vector norm keep
    the interpreted fold's left-association (:func:`dot_sql`), and the
    query's own norm folds DRIVER-side in that same order (the
    kmeans_fit ``cn`` precedent), so the constant is the exact double
    the per-row fold produced. Removes both the ~25 py4j lambda
    round-trips per cosine at plan build and the CodegenFallback
    interpretation at execution (r11)."""
    import math

    qs = [float(x) for x in query_vec]
    acc = 0.0
    for x in qs:
        acc = acc + x * x
    qn = math.sqrt(acc)
    return F.expr(
        f"({dot_lit_sql(vec_ref, qs)}) / "
        f"(SQRT({dot_sql(vec_ref, vec_ref, len(qs))}) * {qn!r}D)"
    )


def dot_unrolled(a: Column | str, b: Column | str, dim: int) -> Column:
    """Dot product UNROLLED to a left-associated arithmetic chain —
    bit-identical to the sequential fold (0.0 + a₁b₁ + a₂b₂ + …) but
    pure codegen. ``zip_with``/``aggregate`` lambdas evaluate on
    Catalyst's interpreter (CodegenFallback): measured ~21 µs per
    64-dim pair, which at millions of candidate pairs dominated the
    whole kNN-join (167 s at sf0.1). The unrolled chain whole-stage-
    compiles to straight-line multiply-adds (~10×+ faster) while
    preserving the exact summation order the DuckDB oracle
    (list_dot_product) uses. Requires a statically-known ``dim``.

    Pass BOTH operands as SQL reference strings to build the chain as
    one parsed expression (:func:`dot_sql`) instead of ~3·dim py4j
    calls — same tree, ~500× cheaper plan build."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(dot_sql(a, b, dim))
    s: Column = F.lit(0.0)
    for i in range(1, dim + 1):
        s = s + F.element_at(a, i) * F.element_at(b, i)
    return s


def topk_cosine(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity to a query vector.

    Scale: one scan, no shuffle until the final top-k (TakeOrdered —
    per-partition heaps, driver merges k·partitions rows). The query
    vector is a literal folded into codegen, not a join.
    """
    return (
        df.select(key_col, as_double(F.col(vec_col)).alias("_v"))
        .select(
            key_col, cosine_to_query("_v", query_vec).alias("cosine_sim")
        )
        .orderBy(F.desc("cosine_sim"), F.asc(key_col))
        .limit(k)
    )


def centroid_assign(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    centroid_key: str = "centroid_id",
    centroid_vec: str = "cv",
    dim: int | None = None,
) -> DataFrame:
    """IVF building block: assign each vector to its nearest centroid.

    Broadcast the (small) centroid table, cross-join, argmax-by-struct
    — an aggregation, not a window, so it map-side combines. At scale
    the assignment becomes the partition key for bucketed ANN search
    (probe only the query's nearest centroid partitions).

    ``dim`` is accepted for signature stability but the cosine stays
    on the interpreted HOF fold deliberately (r11, measured): the
    assignment evaluates |rows|·|centroids| pairs — ~16k at the bench
    SF — where an unrolled 3·dim-term codegen chain costs more in
    Janino compile time per plan than the fold's 21 µs/pair ever
    reaches (emb_centroid_assign 0.57 → 1.0 s regression, reverted).
    The unrolled form wins only at the million-pair scale of the kNN
    kernels (aa95161), which build it via :func:`dot_sql` directly.
    """
    sim = cosine(
        as_double(F.col(vec_col)), as_double(F.col(centroid_vec))
    )
    scored = df.crossJoin(F.broadcast(centroids)).select(
        key_col,
        F.col(centroid_key),
        sim.alias("sim"),
    )
    # max over (sim, -centroid_id): highest similarity, ties -> lowest id
    best = F.max(
        F.struct(F.col("sim"), (-F.col(centroid_key)).alias("neg_id"))
    ).alias("best")
    return scored.groupBy(key_col).agg(best).select(
        key_col,
        (-F.col("best.neg_id")).cast("integer").alias(centroid_key),
        F.col("best.sim").alias("sim"),
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.45,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-dup: all (a < b) pairs with cosine ≥ t.

    Exact block-nested-loop: one side of the pair space is normalized,
    broadcast to every worker, and each Arrow batch of the other side
    hits it with a single float64 BLAS matmul — the vectorized Pandas
    path, ~100× the per-pair HOF fold. Output is pair keys only
    (membership, not scores), so float64 on both engines makes the
    threshold decision stable to ~1e-15 — far below pair spacing.

    Scale: the honest limit is the DRIVER — ``collect()`` pulls every
    (id, vector) row through the driver as Python objects before the
    broadcast, so this kernel is the SMALL-corpus special case only
    (exact baseline for tests and sub-GB tables). The production path
    is ``cosine_near_dup_blocked``: assign vectors to IVF centroids
    and run this exact verification within each centroid cell — no
    driver materialization, no corpus-wide pair space.
    """
    import numpy as np
    import pandas as pd

    # bounded guard: limit(N+1).count() short-circuits after 100,001
    # rows instead of executing the full upstream plan a second time
    n = df.limit(100_001).count()
    if n > 100_000:
        raise ValueError(
            "cosine_near_dup_pairs is the driver-collect small-corpus "
            "oracle (input exceeds the 100000-row limit); use "
            "cosine_near_dup_blocked for production corpora"
        )
    rows = df.select(key_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    bc = df.sparkSession.sparkContext.broadcast((ids, mat))

    def find_pairs(batches):
        b_ids, b_mat = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            q_ids = pdf[key_col].to_numpy(dtype=np.int64)
            q = np.array(list(pdf[vec_col]), dtype=np.float64)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ b_mat.T
            qi, bi = np.nonzero((sims >= threshold) & (q_ids[:, None] < b_ids[None, :]))
            yield pd.DataFrame({"vec_a": q_ids[qi], "vec_b": b_ids[bi]})

    return df.select(key_col, vec_col).mapInPandas(
        find_pairs, "vec_a long, vec_b long"
    )


def cosine_near_dup_blocked(
    df: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.45,
    n_assign: int = 2,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    n_centroids: int | None = None,
    coarse_threshold: int = 64,
    coarse_probe: int = 2,
    tier_branch: int | None = None,
) -> DataFrame:
    """The 100 TB path for embedding near-dup: block the pair space by
    IVF centroid, then run the exact kernel within each block.

    Each vector is assigned to its ``n_assign`` nearest centroids
    (multi-probe assignment — a pair whose members straddle a cell
    boundary still co-occurs in some cell with high probability, the
    standard recall fix for cell-edge pairs); pairs are generated only
    within a cell via a shuffle on the cell id, never across the
    corpus. Exact cosine verifies every candidate, so output ⊆ the
    exact all-pairs result with recall set by n_assign (asserted
    against ``cosine_near_dup_pairs`` in tests at recall 1.0 for this
    data). Cells are delivered via ``groupBy(cell).applyInPandas`` —
    the grouped-map path guarantees each centroid cell arrives as ONE
    whole pandas frame (unlike mapInPandas, whose Arrow batching may
    split a cell at an arbitrary row boundary and silently drop the
    cross-half pairs). The cell id is the only shuffle key.
    """
    import numpy as np
    import pandas as pd

    # assignment rides the shared helper (round 8): bit-identical to
    # the historical inline flat cross-join below the threshold, and
    # callers that declare ``n_centroids`` get the L-level
    # hierarchical descent past it — the same scaled-cell regime the
    # kNN pair build uses, so the verify stage's Σ|cell|² stays
    # bounded when the corpus decades up
    assigned = assign_cells(
        df.select(key_col, vec_col),
        centroids,
        n_assign=n_assign,
        vec_col=vec_col,
        key_col=key_col,
        n_centroids=n_centroids,
        coarse_threshold=coarse_threshold,
        coarse_probe=coarse_probe,
        tier_branch=tier_branch,
    )

    def verify(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf[key_col].to_numpy(dtype=np.int64)
        mat = np.array(list(pdf[vec_col]), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        n = len(ids)
        # TILE the within-cell matmul: a hot cell must not allocate an
        # n×n sims matrix (1M-vector cell → 8 TB). Row blocks bound
        # peak memory at ~block×n floats (~256 MB target) while
        # producing the identical pair set.
        block = max(1, (1 << 25) // max(n, 1))
        outs = []
        for i in range(0, n, block):
            sims = mat[i : i + block] @ mat.T
            ai, bi = np.nonzero(
                (sims >= threshold) & (ids[i : i + block, None] < ids[None, :])
            )
            if len(ai):
                outs.append(
                    pd.DataFrame({"vec_a": ids[ai + i], "vec_b": ids[bi]})
                )
        if not outs:
            return pd.DataFrame(
                {"vec_a": pd.Series(dtype="int64"), "vec_b": pd.Series(dtype="int64")}
            )
        return pd.concat(outs, ignore_index=True)

    return (
        assigned.groupBy("centroid_id")
        .applyInPandas(verify, "vec_a long, vec_b long")
        .distinct()
    )


def near_dup_cascade(
    df: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.45,
    n_assign: int = 2,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    n_centroids: int | None = None,
    coarse_threshold: int = 64,
    coarse_probe: int = 2,
    tier_branch: int | None = None,
) -> DataFrame:
    """Exact-then-near embedding dedup cascade (the
    ``multimodal.image_dedup_cascade`` pattern on the vector column,
    VERDICT r07 item 5): collapse BIT-IDENTICAL vectors to one
    representative per distinct vector (min key, with multiplicity),
    then run the IVF-blocked near-dup join over REPRESENTATIVES only.

    This is the production answer to copy-heavy embedding corpora:
    the raw pair entry emits C(g, 2) cosine-1 pairs per g-sized
    identical-vector group (the round-7 sf10 image sweep measured
    that quadratic directly; 10^6 copies of one viral document's
    embedding → 5*10^11 raw pairs), while the cascade emits ONE
    representative whose ``group_size`` carries the multiplicity —
    intra-group pairs never materialize, and
    ``n_cross_pairs = size_a * size_b`` is the raw pair count each
    representative edge stands for. Representative pairs have
    DISTINCT vectors, so cell pair volume is bounded by distinct
    count, immune to duplicate-group size.

    The collapse groups by the vector VALUE itself (exact array
    equality — declared, and replayed verbatim by a GROUP BY on the
    list in the oracle); no hash step means no collision caveat at
    the cost of shuffling the 4·dim-byte key once, map-side combined.

    Scale: one map-combinable aggregate on the vector key, then the
    ``cosine_near_dup_blocked`` path over |distinct| rows; the sizes
    join is two broadcast-or-shuffled equi-joins on the rep key.
    """
    groups = spill_checkpoint(
        df.groupBy(vec_col).agg(
            F.min(key_col).alias(key_col),
            F.count(F.lit(1)).alias("group_size"),
        )
    )
    reps = groups.select(key_col, vec_col)
    sizes = groups.select(F.col(key_col).alias("_rid"), "group_size")
    pairs = cosine_near_dup_blocked(
        reps,
        centroids,
        threshold=threshold,
        n_assign=n_assign,
        vec_col=vec_col,
        key_col=key_col,
        n_centroids=n_centroids,
        coarse_threshold=coarse_threshold,
        coarse_probe=coarse_probe,
        tier_branch=tier_branch,
    )
    return (
        pairs.join(
            sizes.withColumnRenamed("_rid", "vec_a").withColumnRenamed(
                "group_size", "size_a"
            ),
            "vec_a",
        )
        .join(
            sizes.withColumnRenamed("_rid", "vec_b").withColumnRenamed(
                "group_size", "size_b"
            ),
            "vec_b",
        )
        .select(
            F.col("vec_a").alias("rep_a"),
            F.col("vec_b").alias("rep_b"),
            F.col("size_a").cast("long").alias("size_a"),
            F.col("size_b").cast("long").alias("size_b"),
            (F.col("size_a") * F.col("size_b"))
            .cast("long")
            .alias("n_cross_pairs"),
        )
    )


def ivf_topk_cosine(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_probe_centroids: int = 2,
    centroids: DataFrame | None = None,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    assigned: DataFrame | None = None,
) -> DataFrame:
    """ANN top-k: search only the partitions of the query's nearest
    centroids (IVF-style). Approximate — recall depends on n_probe.

    At 100 TB: vectors are stored partitioned by assigned centroid;
    a query prunes to n_probe partitions (partition pruning on the
    centroid column), turning a full scan into a targeted read.

    ``assigned`` lets a caller sweeping n_probe (the recall-curve
    entry) compute the corpus assignment ONCE and share it across
    arms instead of re-assigning per arm (r11).
    """
    if centroids is None:
        raise ValueError("centroids DataFrame required (centroid_key, cv)")
    if assigned is None:
        assigned = centroid_assign(
            df.select(key_col, vec_col),
            centroids,
            vec_col,
            key_col,
            dim=len(query_vec),
        )
    data = df.join(assigned.select(key_col, "centroid_id"), key_col)
    probe = (
        centroids.select(
            "centroid_id", as_double(F.col("cv")).alias("_cv")
        )
        .select(
            "centroid_id", cosine_to_query("_cv", query_vec).alias("qsim")
        )
        .orderBy(F.desc("qsim"), F.asc("centroid_id"))
        .limit(n_probe_centroids)
        .select("centroid_id")
    )
    pruned = data.join(F.broadcast(probe), "centroid_id", "left_semi")
    return (
        pruned.select(key_col, as_double(F.col(vec_col)).alias("_v"))
        .select(
            key_col, cosine_to_query("_v", query_vec).alias("cosine_sim")
        )
        .orderBy(F.desc("cosine_sim"), F.asc(key_col))
        .limit(k)
    )


def ivf_cell_stats(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """Persisted IVF index state: per (cell, dim) quantized moment
    sums plus the cell's member count — the mergeable sufficient
    statistic behind incremental index maintenance. Assign via the
    broadcast argmax (``centroid_assign``), explode dims, and collapse
    map-side to |cells| x dim rows of ``(centroid_id, i, s, n)`` where
    ``s = SUM(DECIMAL(18,6)-quantized element)`` — the
    ``emb_label_drift`` determinism discipline, so any engine replays
    the sums bit-exactly. At 100 TB this table is KB-sized regardless
    of corpus volume, and a daily ingest updates it by ADDING the
    batch's partials (see ``ivf_incremental_update``) instead of
    retraining centroids from scratch.
    """
    assigned = centroid_assign(
        df.select(key_col, vec_col), centroids, vec_col, key_col
    )
    d = df.join(assigned.select(key_col, "centroid_id"), key_col).select(
        "centroid_id",
        F.posexplode(as_double(F.col(vec_col))).alias("i", "x"),
    )
    # the state table is |cells| x dim rows (KB) — collapse it to ONE
    # partition so a persisted copy never inherits the corpus scan's
    # width (measured r10: a 2M-vector build left the 512-row
    # checkpoint spread over ~800 near-empty partitions, taxing every
    # later O(batch) update with their scheduling)
    return (
        d.groupBy("centroid_id", "i")
        .agg(
            F.sum(F.round("x", 6).cast("decimal(18,6)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .repartition(1)
    )


def ivf_incremental_update(
    existing_stats: DataFrame,
    batch: DataFrame,
    centroids: DataFrame,
    drift_threshold: float = 0.9999,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """Incremental ANN index maintenance, O(batch) regardless of
    corpus size: assign ONLY the incoming batch into the EXISTING
    cells (stream-static-style broadcast join against the persisted
    centroid table — the ``docs_incremental_dedup`` pattern on the
    vector axis), merge the batch's per-(cell, dim) moment partials
    with the persisted ``ivf_cell_stats`` state by exact decimal
    addition, and emit the drift-triggered recluster gate: per cell,
    the cosine between the OLD running mean and the UPDATED running
    mean (``emb_label_drift``'s centroid-cosine machinery). A cell
    whose mean moved past ``drift_threshold`` — or that is brand-new
    (no existing members, NULL cosine) — flags ``needs_recluster``;
    everything else keeps serving the existing index untouched.

    Determinism: moment sums are DECIMAL(18,6) partials (exact
    addition, < 2^53 after scaling so the double cast is exact); the
    two means divide identically on both engines; cosine terms
    quantize products to DECIMAL(28,9) (the label-drift discipline).
    Cost: the corpus never re-scans — batch assignment is
    O(|batch| x cells) broadcast work and the merge touches
    |cells| x dim rows.

    This function returns the GATE; the production loop persists the
    advanced state from the companion ``ivf_merged_state`` (same
    batch, same centroids) after each ingest.
    """
    bs = ivf_cell_stats(batch, centroids, vec_col, key_col)
    o = existing_stats.select(
        "centroid_id",
        "i",
        F.col("s").alias("s_o"),
        F.col("n").alias("n_o"),
    )
    b = bs.select(
        "centroid_id",
        "i",
        F.col("s").alias("s_b"),
        F.col("n").alias("n_b"),
    )
    m = o.join(b, ["centroid_id", "i"], "full_outer").select(
        "centroid_id",
        "i",
        "n_o",
        "n_b",
        F.when(
            F.col("n_o") > 0, F.col("s_o").cast("double") / F.col("n_o")
        ).alias("om"),
        (
            (
                F.coalesce(F.col("s_o"), F.lit(0).cast("decimal(18,6)"))
                + F.coalesce(F.col("s_b"), F.lit(0).cast("decimal(18,6)"))
            ).cast("double")
            / (
                F.coalesce(F.col("n_o"), F.lit(0))
                + F.coalesce(F.col("n_b"), F.lit(0))
            )
        ).alias("nm"),
    )
    q9 = lambda c: F.round(c, 9).cast("decimal(28,9)")  # noqa: E731
    s = m.groupBy("centroid_id").agg(
        F.max("n_o").cast("long").alias("n_existing"),
        F.max("n_b").cast("long").alias("n_batch"),
        F.sum(q9(F.col("om") * F.col("nm"))).cast("double").alias("_dot"),
        F.sum(q9(F.col("om") * F.col("om"))).cast("double").alias("_na"),
        F.sum(q9(F.col("nm") * F.col("nm"))).cast("double").alias("_nb"),
    )
    # guard the 0/0 case explicitly: an all-zero mean vector gives
    # _na = 0, and Spark (ANSI off) yields NULL for 0.0/0.0 while
    # DuckDB yields NaN (which DuckDB orders GREATER than any value,
    # flipping the gate) — declare NULL cosine -> needs_recluster in
    # both engines instead (review r10)
    cos = F.when(
        (F.col("_na") > 0) & (F.col("_nb") > 0),
        F.col("_dot") / (F.sqrt(F.col("_na")) * F.sqrt(F.col("_nb"))),
    )
    return s.select(
        "centroid_id",
        F.coalesce("n_existing", F.lit(0)).alias("n_existing"),
        F.coalesce("n_batch", F.lit(0)).alias("n_batch"),
        cos.alias("centroid_cosine"),
        F.coalesce(cos < F.lit(drift_threshold), F.lit(True)).alias(
            "needs_recluster"
        ),
    )


def ivf_merged_state(
    existing_stats: DataFrame,
    batch: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """The UPDATED persisted state for a production ingest loop: the
    batch's per-(cell, dim) moment partials merged into
    ``existing_stats`` by exact decimal addition — same schema as
    ``ivf_cell_stats`` (``centroid_id, i, s, n``), so the caller
    replaces the persisted table with this result after each batch and
    the next ``ivf_incremental_update`` call sees the advanced state
    (ADVICE r10: the drift gate alone discarded the merge, so
    successive ingests never compounded).

    Mergeability is the pinned invariant: this output equals
    ``ivf_cell_stats`` over (existing ∪ batch) bit-for-bit
    (``test_ivf_merged_state_equals_full_recompute``). Collapsed to
    ONE partition like the from-scratch build, so persisted state
    never inherits a scan's width. Cost is O(batch): one broadcast
    assignment plus a |cells| x dim merge.
    """
    bs = ivf_cell_stats(batch, centroids, vec_col, key_col)
    return (
        existing_stats.select("centroid_id", "i", "s", "n")
        .unionAll(bs.select("centroid_id", "i", "s", "n"))
        .groupBy("centroid_id", "i")
        .agg(
            F.sum("s").cast("decimal(18,6)").alias("s"),
            F.sum("n").cast("long").alias("n"),
        )
        .repartition(1)
    )


def mean_vectors(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """Element-wise mean vector per group, fully JVM-side: posexplode
    dims → (group, pos) hash aggregate → re-assemble via struct-sorted
    collect_list. The explode blowup (rows × dim) collapses in the
    map-side partial aggregate, so the shuffle carries |groups|·dim
    doubles — the same pattern that beat the interpreted HOF fold in
    the SimHash aggregate."""
    ex = df.select(group_col, F.posexplode(as_double(F.col(vec_col))))
    per_dim = ex.groupBy(group_col, "pos").agg(F.avg("col").alias("v"))
    return per_dim.groupBy(group_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "v"))),
            lambda s: s["v"],
        ).alias("cv")
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    max_iter: int = 5,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    track_history: bool = True,
) -> tuple[DataFrame, list[float]]:
    """Spherical k-means (Lloyd's, cosine assignment) for IVF centroid
    training. Seeds = the first ``k`` vectors by key (deterministic).

    Each iteration is one broadcast-assign (``centroid_assign``: the
    centroid table is tiny) plus one mean-update (``mean_vectors``:
    map-side combinable) — at 100 TB that is two scans' worth of work
    per iteration with shuffles of only |k|·dim state. The per-
    iteration mean assignment similarity (the spherical objective) is
    collected driver-side — model state, not data — and returned as
    the convergence history.

    Returns ``(centroids, history)``: centroids as (centroid_id, cv)
    ready for ``centroid_assign`` / ``ivf_topk_cosine``; history of
    mean cosine per iteration (non-decreasing up to fp noise — Lloyd's
    monotonicity, asserted in tests).

    The centroid model is MATERIALIZED between iterations with
    ``localCheckpoint`` (k rows of model state, not data): leaving it
    lazy chains every prior iteration into the next plan (plan size
    doubles per iteration — measured 17.8 s for 4 iterations at
    sf0.01), and inlining the floats as literals forces a fresh
    codegen compile per iteration. Checkpointing keeps every
    iteration's plan SHAPE identical, so generated code is reused.

    ``track_history=False`` computes the objective only for the first
    and last iteration (2 extra jobs instead of ``max_iter``) — the
    convergence statement most callers need.

    Members are L2-NORMALIZED before every mean update: the spherical
    objective's maximizing centroid is the mean of unit vectors, and
    averaging RAW vectors lets one large-norm member drag the centroid
    and DECREASE the objective (Lloyd's monotonicity would silently
    break on any non-unit-norm corpus). Cosine assignment is
    scale-invariant, so normalizing changes nothing else.
    """
    import math

    spark = df.sparkSession
    v = as_double(F.col(vec_col))
    nrm = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    # The normalized+cast member table is MATERIALIZED once
    # (spill_checkpoint — the semdedup codegen-barrier pattern):
    # every iteration's unrolled dot chain references the vector ~130
    # times per pair, and without the barrier CollapseProject inlines
    # the interpreted normalization fold into every element_at site
    # (measured: 2.2 s per assignment job at sf0.1 vs ~0.3 s against
    # the materialized column). The per-row norm of the normalized
    # vector is precomputed as a column for the same reason.
    df = df.select(
        F.col(key_col),
        F.when(nrm > 0, F.transform(v, lambda x: x / nrm)).otherwise(v).alias(
            vec_col
        ),
    )
    df = spill_checkpoint(
        df.select(
            key_col,
            vec_col,
            F.sqrt(
                F.aggregate(
                    F.transform(as_double(F.col(vec_col)), lambda x: x * x),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
            ).alias("_vnorm"),
        )
    )
    # Seeds collected driver-side: k rows of MODEL state (not data) —
    # the centroid table lives on the driver between iterations, so no
    # localCheckpoint jobs and no join-back for the empty-cluster
    # guard. Each iteration ships the k×dim floats back out as a
    # LocalRelation (values, not literal expressions, so the generated
    # code is shape-stable across iterations and codegen caches hit).
    seed_rows = df.orderBy(key_col).limit(k).select(vec_col).collect()
    cents: list[tuple[int, list[float]]] = [
        (i, [float(x) for x in r[0]]) for i, r in enumerate(seed_rows)
    ]
    dim = len(cents[0][1]) if cents else 0
    history: list[float] = []
    # ONE job with ONE exchange per Lloyd iteration (r11 optimization —
    # was assign + objective + join-back + posexplode-mean +
    # checkpoint, ~6 jobs and 3 exchanges a fit): the whole centroid
    # model ships as a single-row broadcast carrying an
    # array<struct<id, cv, cn>>, each member row argmaxes over that
    # array LOCALLY (array_max over (sim, -id) structs — the same
    # comparator as the old max-by-struct aggregate, no per-key
    # shuffle), and the per-(centroid, pos) mean/count/objective
    # partials come from one map-combinable aggregate collected as
    # k·dim model rows. The objective is Σ per-centroid sim sums /
    # Σ counts — the same quantity as the old avg(sim), same fp-noise
    # class (Lloyd's monotonicity tolerance is 1e-9; double
    # accumulation order was never deterministic in the hash aggregate
    # either way). The per-pair cosine is the sequential left-fold
    # order (dot_sql) over the materialized member vector; the
    # centroid norm is precomputed driver-side (one multiply per pair).
    # The expensive array_max is projected BELOW the posexplode
    # Generate, so it runs once per member row, not per dimension.
    best_sql = (
        "array_max(transform(cents, c -> struct("
        f"({dot_sql(vec_col, 'c.cv', dim)}) / (_vnorm * c.cn) AS sim, "
        "-c.id AS neg_id)))"
    )
    for it in range(max_iter):
        cdf = spark.createDataFrame(
            [
                (
                    [
                        # sequential left-fold sum — the exact summation
                        # order of the Spark-side sqrt(fold) it replaces
                        (i, cvec, math.sqrt(sum(x * x for x in cvec)))
                        for i, cvec in cents
                    ],
                )
            ],
            "cents array<struct<id:int,cv:array<double>,cn:double>>",
        )
        assigned = df.crossJoin(F.broadcast(cdf)).selectExpr(
            f"{best_sql} AS _best", f"{vec_col} AS _v"
        )
        ex = assigned.select(
            (-F.col("_best.neg_id")).cast("integer").alias("centroid_id"),
            F.col("_best.sim").alias("sim"),
            F.posexplode("_v"),
        )
        stats = ex.groupBy("centroid_id", "pos").agg(
            F.avg("col").alias("v"),
            F.sum("sim").alias("s"),
            F.count("sim").alias("n"),
        )
        rows = stats.collect()  # k·dim rows of MODEL state
        ssum = {}
        ns = {}
        means: dict[int, dict[int, float]] = {}
        for r in rows:
            cid = int(r["centroid_id"])
            means.setdefault(cid, {})[r["pos"]] = r["v"]
            if r["pos"] == 0:
                ssum[cid] = float(r["s"]) if r["s"] is not None else 0.0
                ns[cid] = int(r["n"])
        tot_n = sum(ns.values())
        if track_history or it in (0, max_iter - 1):
            history.append(
                float(sum(ssum[c] for c in sorted(ssum)) / tot_n)
                if tot_n
                else 0.0
            )
        if it == max_iter - 1:
            break
        # empty-cluster guard: a centroid that receives zero members
        # disappears from the groupBy — carry its previous position
        # forward so exactly k centroids always survive (emptied seeds
        # from duplicate vectors would otherwise shrink the model)
        new = {
            cid: [float(d[p]) for p in sorted(d)] for cid, d in means.items()
        }
        cents = [(i, new.get(i, prev)) for i, prev in cents]
    centroids = spark.createDataFrame(cents, "centroid_id int, cv array<double>")
    return centroids, history


def binary_codes(
    df: DataFrame, vec_col: str = "embedding", key_col: str = "vec_id"
) -> DataFrame:
    """Sign-quantized binary codes: bit i = (embedding[i] > 0), packed
    into two 32-bit halves (lo = dims 0-31, hi = dims 32-63) — two
    longs per vector, no sign-bit overflow games. 32× smaller than
    float32 vectors; Hamming distance over the codes approximates
    angular distance (the classic binary-sketch retrieval trick).

    The sketch covers the FIRST 64 dimensions; wider vectors are
    prefix-sketched (the upper bound on the hi branch also keeps the
    sum inside exact-double/long range — an unbounded ``pos >= 32``
    would overflow on wide vectors).

    Computed via posexplode + one map-side-combinable sum per half
    (bit·2^pos is exact in double for pos ≤ 31), so the packing is a
    single shuffle of 2 longs per vector and every expression is
    codegen'd — and identically computable in SQL, so the codes are
    exactly oracle-checkable end to end.
    """
    ex = df.select(F.col(key_col), F.posexplode(as_double(F.col(vec_col))))
    bit = (F.col("col") > 0).cast("int")
    lo = F.sum(
        F.when(F.col("pos") < 32, bit * F.pow(F.lit(2.0), F.col("pos"))).otherwise(
            F.lit(0.0)
        )
    ).cast("long")
    hi = F.sum(
        F.when(
            (F.col("pos") >= 32) & (F.col("pos") < 64),
            bit * F.pow(F.lit(2.0), F.col("pos") - 32),
        ).otherwise(F.lit(0.0))
    ).cast("long")
    return ex.groupBy(key_col).agg(lo.alias("code_lo"), hi.alias("code_hi"))


def quantize_query(query_vec: list[float]) -> tuple[int, int]:
    """Sign-quantize a query vector with the same (lo, hi) packing as
    ``binary_codes`` — driver-side, two ints."""
    lo = sum(1 << i for i in range(min(len(query_vec), 32)) if query_vec[i] > 0)
    hi = sum(
        1 << (i - 32) for i in range(32, min(len(query_vec), 64)) if query_vec[i] > 0
    )
    return lo, hi


def hamming_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    exclude_key: int | None = None,
) -> DataFrame:
    """Top-k nearest by Hamming distance over binary codes.

    The query code is quantized driver-side and folded into codegen as
    two LITERALS (same pattern as ``topk_cosine``) — no second plan
    branch, no crossJoin, no extra scan. bit_count(xor) over two longs
    per comparison with per-partition TakeOrdered heaps; at scale this
    runs a full-corpus scan at ~2 B/dim instead of 4 float bytes, or
    prunes further when combined with the IVF partitioning.
    """
    qlo, qhi = quantize_query(query_vec)
    codes = binary_codes(df, vec_col, key_col)
    if exclude_key is not None:
        codes = codes.filter(F.col(key_col) != exclude_key)
    dist = (
        F.bit_count(F.col("code_lo").bitwiseXOR(F.lit(qlo)))
        + F.bit_count(F.col("code_hi").bitwiseXOR(F.lit(qhi)))
    ).cast("int")
    return (
        codes.select(key_col, dist.alias("hamming"))
        .orderBy("hamming", key_col)
        .limit(k)
    )


def rrf_fuse(
    ranked: list[DataFrame],
    key_col: str = "vec_id",
    rrf_k: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of multiple retrieval rankings (the
    standard hybrid-search combiner): score(d) = Σ_lists 1/(rrf_k +
    rank_list(d)), over candidates appearing in any list.

    Inputs carry (key, rank) with 1-based ranks. Deterministic across
    engines: each term is one exact IEEE division, the per-key sum has
    ≤ |lists| commutatively-added terms, and the final top-k tie-breaks
    on the key.

    Scale: the expensive part is the upstream rankers (each already a
    TakeOrdered scan); fusion itself touches ≤ Σ k_i rows — union,
    one tiny agg, one tiny sort, no full-corpus work.
    """
    from functools import reduce

    u = reduce(
        DataFrame.unionByName, [r.select(key_col, "rank") for r in ranked]
    )
    return (
        u.groupBy(key_col)
        .agg(
            F.sum(F.lit(1.0) / (F.lit(rrf_k) + F.col("rank"))).alias("rrf_score"),
            F.count(F.lit(1)).alias("n_lists"),
        )
        .orderBy(F.desc("rrf_score"), key_col)
        .limit(k)
    )


# Candidate-pair bytes per merge-regime join task (~64 B/pair row):
# sized so the prune_k partial's local sort stays in task memory
# (32 cores sharing a 16-32 g heap → ~0.5-1 g each) with spills that
# are small and freed fast — see the width pin in knn_candidate_pairs.
_PAIR_TASK_BYTES = 256 * 1024 * 1024


def _parse_size_bytes(raw: str) -> int:
    """Parse a Spark size conf string ('10MB', '10485760', '1g',
    '-1') into bytes, mirroring Spark's byteStringAs suffixes."""
    s = str(raw).strip().lower()
    units = {
        "b": 1,
        "k": 1 << 10,
        "kb": 1 << 10,
        "m": 1 << 20,
        "mb": 1 << 20,
        "g": 1 << 30,
        "gb": 1 << 30,
        "t": 1 << 40,
        "tb": 1 << 40,
        "p": 1 << 50,
        "pb": 1 << 50,
    }
    for suf in sorted(units, key=len, reverse=True):
        if s.endswith(suf):
            return int(float(s[: -len(suf)]) * units[suf])
    return int(float(s))


def _pair_build_bytes(
    df: DataFrame,
    n_assign: int,
    dim: int | None,
    n_rows: int | None,
    pair_cols: list[str],
) -> int:
    """Estimated bytes of the pair join's BUILD side (the ``assigned``
    relation: every vector replicated into its ``n_assign`` probed
    cells, flattened to ``dim`` doubles + norm when dim is known).

    With an exact ``n_rows`` (callers that already hold a cached
    count) the estimate is rows × exact flattened row width; otherwise
    it falls back to Catalyst's sizeInBytes for the pruned projection
    (the same statistic the planner's own broadcast decision reads) —
    an underestimate for compressed sources, which the 1.5× inflation
    partially restores. Either way the estimate is computed ONCE at
    plan-build time, so the join regime cannot flip run-to-run the way
    AQE's runtime-size decision does near the threshold.
    """
    if n_rows is not None and dim is not None:
        # key + centroid_id + norm + dim doubles + per-row overhead
        return n_rows * n_assign * ((dim + 2) * 8 + 48)
    stats = (
        df.select(*pair_cols)
        ._jdf.queryExecution()
        .optimizedPlan()
        .stats()
        .sizeInBytes()
    )
    return int(min(int(stats), 1 << 60) * n_assign * 1.5)


def _iroot(n: int, p: int) -> int:
    """Largest integer r with r**p <= n — EXACT integer arithmetic
    (a float ``n ** (1/p)`` mis-rounds near perfect powers, e.g.
    4096^(1/3) = 15.999…), so the declared tier sizes replay
    identically in Python, numpy references, and the oracle SQL's
    bounded-search formulation."""
    if n <= 0:
        return 0
    r = int(round(n ** (1.0 / p)))
    while r > 1 and r**p > n:
        r -= 1
    while (r + 1) ** p <= n:
        r += 1
    return r


# Declared branching bound for the hierarchical tier chain. Separate
# from coarse_threshold (the flat-vs-hierarchical gate, 64): a small
# branch makes the level count grow one band sooner (L3 from k=81,
# L4 from k=729, ...), which is what keeps per-row assignment work
# O(branch * L) = O(log k) INSIDE each measured scale decade instead
# of only across band flips — the round-8 answer to the sf10
# rehearsal's Theta(N^1.5) two-level measurement (SCALE.md r07). A
# declared-blocking constant replayed in the oracle arms' band
# literals (80 / 728 / 6560) — regenerate together.
TIER_BRANCH = 8


def _tier_sizes(n_centroids: int, branch: int) -> list[int]:
    """Declared tier-size chain for L-level hierarchical assignment:
    the smallest L >= 2 with ``iroot(k, L) <= branch``, then tier
    sizes ``s_l = r ** (L - l)`` for l = 1..L-1 (tier 0 is the full
    centroid set). L=2 reproduces the historical two-level chain
    exactly (s_1 = isqrt(k)); each level's branching factor is ~r <=
    branch, so descent work per row is O(L * probe * branch) =
    O(log k). Returns [] when k <= branch (flat-equivalent chain)."""
    if n_centroids <= branch:
        return []
    level = 2
    while _iroot(n_centroids, level) > branch:
        level += 1
    r = _iroot(n_centroids, level)
    return [r ** (level - lv) for lv in range(1, level)]


# broadcast a descent map only below this row count — above it the
# map itself is corpus-scaled (k = N/250 rows of flattened vectors)
# and must flow through a shuffled hash join on the cell id instead
# of the driver. Join strategy never changes results.
_MAP_BCAST_MAX_ROWS = 2_000_000


def _probe_descend(
    rows: DataFrame,
    key_col: str,
    vec_col: str,
    extra_cols: list[str],
    tiers: list[DataFrame],
    tier_rows: list[int],
    maps: dict[int, DataFrame],
    probe: int,
    target: int,
) -> DataFrame:
    """Descend ``rows`` (key, vec, *extras) from the top tier to tier
    ``target``: score ALL top-tier cells (<= branch of them), keep the
    top-``probe`` per key, then at each lower tier score only the
    members (via the tier's top-1 parent map) of the kept cells and
    keep top-``probe`` again. Returns (key, vec, *extras, _cell) with
    ``_cell`` a tier-``target`` cell id. Every rank is the declared
    (sim DESC, cell_id ASC) order, replayed verbatim in the oracle."""
    top_i = len(tiers) - 1
    par = tiers[top_i].select(
        F.col("centroid_id").alias("_pid"), F.col("cv").alias("_pv")
    )
    sim = cosine(as_double(F.col(vec_col)), as_double(F.col("_pv")))
    w = Window.partitionBy(key_col).orderBy(F.desc("_sim"), F.asc("_cell"))
    cand = (
        rows.select(key_col, vec_col, *extra_cols)
        .crossJoin(F.broadcast(par))
        .select(
            key_col,
            vec_col,
            *extra_cols,
            F.col("_pid").alias("_cell"),
            sim.alias("_sim"),
        )
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= probe)
        .select(key_col, vec_col, *extra_cols, "_cell")
    )
    for lvl in range(top_i - 1, target - 1, -1):
        m = maps[lvl]
        mdf = (
            F.broadcast(m) if tier_rows[lvl] <= _MAP_BCAST_MAX_ROWS else m
        )
        msim = cosine(as_double(F.col(vec_col)), as_double(F.col("_mv")))
        cand = (
            cand.join(mdf, F.col("_cell") == F.col("_mp"))
            .select(
                key_col,
                vec_col,
                *extra_cols,
                F.col("_mc").alias("_ncell"),
                msim.alias("_sim"),
            )
            .withColumnRenamed("_ncell", "_cell")
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= probe)
            .select(key_col, vec_col, *extra_cols, "_cell")
        )
    return cand


def assign_cells(
    df: DataFrame,
    centroids: DataFrame,
    n_assign: int = 1,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    extra_cols: list[str] | None = None,
    n_centroids: int | None = None,
    coarse_threshold: int = 64,
    coarse_probe: int = 2,
    tier_branch: int | None = None,
) -> DataFrame:
    """Top-``n_assign`` IVF cell assignment shared by every
    cell-blocked operator (kNN candidate pairs, SemDeDup clustering):
    returns ``(centroid_id, key, vec, *extra_cols)``, one row per
    probed cell, ranked by (cosine DESC, centroid_id ASC).

    Two regimes (see ``knn_candidate_pairs``'s docstring for the full
    rationale): the flat broadcast cross-join scores N×k cosines —
    O(N²/250) once the cell count k = N/250 scales with the corpus —
    and past ``coarse_threshold`` cells (caller declares
    ``n_centroids``) assignment goes L-LEVEL hierarchical IVF
    (``_tier_sizes``): nested centroid prefixes of sizes r^(L-1) ..
    r^1 (r = iroot(k, L) <= coarse_threshold) form a coarse tree;
    each tier member maps top-1 to its parent tier (self-preference
    on ties); every vector scores the <= coarse_threshold top-tier
    cells and probe-descends (top-``coarse_probe`` kept per tier),
    ranking only the mapped members of kept cells at each step —
    O(N · L · r) = O(N log N), the same declared-argmax construction
    repeated per level, replayed verbatim in the oracle SQL's
    scalar-k arms (flat k <= 64, L=2 for k <= 4224, L=3 for k <=
    274624 — deeper regimes start at ~68M vectors under the N/250
    cell rule, beyond any oracle-checkable corpus, and are declared
    engine-only). At L=2 the construction — and therefore every hash
    — is bit-identical to the historical two-level path (coarse
    count isqrt(k)); below the threshold (every driver SF) the flat
    path is the round-5 expression tree unchanged.

    Each tier map self-prefers on exact ties (a member of the parent
    tier always maps to itself — for descent-built maps the self
    candidate is explicitly unioned in), so every cell at every tier
    retains at least its own twin from the tier below, a probed cell
    can never be empty, and no vector can silently lose all
    candidates on degenerate corpora (review r07).
    """
    extra_cols = extra_cols or []
    w_rank = F.row_number().over(
        Window.partitionBy(key_col).orderBy(F.desc("_sim"), F.asc("centroid_id"))
    )
    if n_centroids is not None and n_centroids > coarse_threshold:
        # chain branch defaults to min(TIER_BRANCH, coarse_threshold):
        # callers that shrink the flat gate for tests get a matching
        # chain; production (threshold 64) gets the declared 8
        tb = (
            tier_branch
            if tier_branch is not None
            else min(TIER_BRANCH, coarse_threshold)
        )
        sizes = _tier_sizes(n_centroids, tb)
        n_levels = len(sizes) + 1
        tiers = [centroids] + [
            centroids.filter(F.col("centroid_id") < s).select(
                "centroid_id", "cv"
            )
            for s in sizes
        ]
        tier_rows = [n_centroids] + sizes
        # maps[l]: tier-l member -> its top-1 tier-(l+1) parent, as
        # (_mc child id, _mv child vec, _mp parent id). The topmost
        # map is an exact cross-join argmax (both sides <=
        # branch^2 x branch rows); lower maps probe-descend through
        # the maps already built — linear in k, never k x sqrt(k).
        w_self = Window.partitionBy("centroid_id").orderBy(
            F.desc("_sim"),
            F.desc(F.col("_qid") == F.col("centroid_id")),
            F.asc("_qid"),
        )
        par_top = tiers[n_levels - 1].select(
            F.col("centroid_id").alias("_qid"), F.col("cv").alias("_qv")
        )
        top_sim = cosine(as_double(F.col("cv")), as_double(F.col("_qv")))
        maps: dict[int, DataFrame] = {
            n_levels
            - 2: (
                tiers[n_levels - 2]
                .crossJoin(F.broadcast(par_top))
                .select("centroid_id", "cv", "_qid", top_sim.alias("_sim"))
                .withColumn("_rk", F.row_number().over(w_self))
                .filter(F.col("_rk") == 1)
                .select(
                    F.col("centroid_id").alias("_mc"),
                    F.col("cv").alias("_mv"),
                    F.col("_qid").alias("_mp"),
                )
            )
        }
        for lvl in range(n_levels - 3, -1, -1):
            probed = _probe_descend(
                tiers[lvl],
                "centroid_id",
                "cv",
                [],
                tiers,
                tier_rows,
                maps,
                coarse_probe,
                lvl + 2,
            )
            m_above = maps[lvl + 1]
            mdf = (
                F.broadcast(m_above)
                if tier_rows[lvl + 1] <= _MAP_BCAST_MAX_ROWS
                else m_above
            )
            # candidate parents at tier lvl+1 = mapped members of the
            # kept tier-(lvl+2) cells, self EXCLUDED from the probe
            # side and re-added explicitly for members of tier lvl+1
            # (exactly once), so the self-preference row always
            # exists regardless of which cells the descent kept
            cand = (
                probed.join(mdf, F.col("_cell") == F.col("_mp"))
                .filter(F.col("_mc") != F.col("centroid_id"))
                .select(
                    "centroid_id",
                    "cv",
                    F.col("_mc").alias("_qid"),
                    F.col("_mv").alias("_qv"),
                )
            )
            selfrows = tiers[lvl].filter(
                F.col("centroid_id") < sizes[lvl]
            ).select(
                "centroid_id",
                "cv",
                F.col("centroid_id").alias("_qid"),
                F.col("cv").alias("_qv"),
            )
            m_sim = cosine(as_double(F.col("cv")), as_double(F.col("_qv")))
            built = (
                cand.unionByName(selfrows)
                .select("centroid_id", "cv", "_qid", m_sim.alias("_sim"))
                .withColumn("_rk", F.row_number().over(w_self))
                .filter(F.col("_rk") == 1)
                .select(
                    F.col("centroid_id").alias("_mc"),
                    F.col("cv").alias("_mv"),
                    F.col("_qid").alias("_mp"),
                )
            )
            # truncate lineage when the tree is deep: lower maps and
            # the vector descent both re-reference this frame, and at
            # L >= 3 the un-checkpointed plan would inline the whole
            # upper tree once per consumer. Tier-l maps are s_l rows
            # (tier 0: k = N/250) — serialized disk-evictable.
            if n_levels >= 3:
                built = spill_checkpoint(built)
            maps[lvl] = built
        vprobe = _probe_descend(
            df, key_col, vec_col, extra_cols, tiers, tier_rows, maps,
            coarse_probe, 1,
        )
        # each tier-0 centroid lives in exactly ONE tier-1 cell
        # (top-1 map), so the final join can never duplicate a
        # (vector, centroid) candidate — no distinct before the rank
        m0 = maps[0]
        m0df = (
            F.broadcast(m0)
            if tier_rows[0] <= _MAP_BCAST_MAX_ROWS
            else m0
        )
        cand_sim = cosine(as_double(F.col(vec_col)), as_double(F.col("_mv")))
        scored = vprobe.join(m0df, F.col("_cell") == F.col("_mp")).select(
            key_col,
            vec_col,
            *extra_cols,
            F.col("_mc").alias("centroid_id"),
            cand_sim.alias("_sim"),
        )
    else:
        sim_c = cosine(as_double(F.col(vec_col)), as_double(F.col("cv")))
        scored = df.select(key_col, vec_col, *extra_cols).crossJoin(
            F.broadcast(centroids)
        ).select(
            key_col, vec_col, *extra_cols, F.col("centroid_id"), sim_c.alias("_sim")
        )
    return (
        scored.withColumn("_rk", w_rank)
        .filter(F.col("_rk") <= n_assign)
        .select("centroid_id", key_col, vec_col, *extra_cols)
    )


def knn_candidate_pairs(
    df: DataFrame,
    centroids: DataFrame,
    n_assign: int = 2,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    dim: int | None = None,
    label_col: str | None = None,
    carry_labels: bool = False,
    broadcast_pairs: bool | None = None,
    n_rows: int | None = None,
    n_centroids: int | None = None,
    coarse_threshold: int = 64,
    coarse_probe: int = 2,
    tier_branch: int | None = None,
    prune_k: int | None = None,
) -> DataFrame:
    """The scored candidate-pair stage of ``knn_join_blocked``: every
    ordered pair of distinct vectors co-resident in at least one
    probed IVF cell, with its exact cosine — (``vec_id``,
    ``neighbor_id``, ``cosine_sim``), distinct.

    ``prune_k`` (round 11): cut the TRANSIENT build shuffle, not just
    the stored list. The round-9 prune (``prune_pairs_group_topk``)
    bounded the checkpoint, but it ranks AFTER this function's
    terminal ``distinct`` — whose exchange still carried the full
    Σ cells |cell|² candidate volume (~100 KB/vector; the 200 GB
    transient that made the sf100 build a host-disk bound, SCALE.md
    r10). With ``prune_k`` set, a ``dense_rank() <= prune_k`` filter
    over the consumers' exact rank order runs BEFORE the distinct and
    compiles to the two-phase ``WindowGroupLimit``: each mapper keeps
    at most the per-(vec_id[, neighbor_label]) top-``prune_k``
    DISTINCT scores it produced, so the exchange carries
    O(occurrences · groups · k) rows per vector instead of the
    candidate volume. dense_rank — not row_number — is what keeps the
    partial LOSSLESS under the duplicate rows the distinct exists to
    collapse: a pair co-resident in two probed cells appears twice
    with an identical (cosine_sim, neighbor_id) key, ties share one
    dense rank, and the order is total on distinct rows (neighbor_id
    tie-break), so ``dense_rank <= k`` keeps exactly the distinct
    top-k plus its duplicates — per mapper a superset of that
    mapper's contribution to the global top-k, hence
    rank_k(distinct(partial(raw))) = rank_k(distinct(raw)) (pinned by
    ``test_knn_pair_prune_lossless``). Downstream consumers MUST
    (and do) end in a per-group top-j with j <= prune_k — the same
    contract as the stored prune.

    Split out so SEVERAL consumers can rank the SAME pair list (the
    ``_jaccard_pairs_cached`` pattern on the documents side): the pair
    scoring — assignment cross-join, cell equi-join, unrolled cosine —
    is the dominant cost of every kNN-shaped entry, and a production
    pipeline persists this pair table once and fans the graph /
    mining stages out from it.

    ``label_col`` modes:
    - ``carry_labels=False`` (the single-consumer hard-negative path):
      the cross-label predicate is pushed INTO the pair join, so
      same-label cosines are never computed.
    - ``carry_labels=True`` (the shared-cache path): no label
      predicate; the pair list carries ``vec_label`` /
      ``neighbor_label`` so consumers can filter after the fact.
      Filtering commutes with scoring and with the distinct (labels
      are functions of the keys), so a consumer that filters
      ``vec_label != neighbor_label`` gets bit-identical rows to the
      pushed-down path.

    Assignment regimes (``n_centroids`` / ``coarse_threshold``): the
    flat assignment is a broadcast cross-join scoring N×k cosines —
    O(N²/250) once the cell count k = N/250 scales with the corpus,
    the one super-linear stage the sf1→sf3 rehearsal measured (exp₃
    1.21 at 60k vectors, SCALE.md round 6). When the caller declares
    ``n_centroids`` and it exceeds ``coarse_threshold``, assignment
    goes L-LEVEL hierarchical IVF (``_tier_sizes``, round 8): nested
    centroid prefixes of sizes r^(L-1)..r (r = iroot(k, L) <=
    coarse_threshold) form a coarse tree, each tier maps top-1 into
    the tier above (self-preference on ties), and every row
    probe-descends keeping top-``coarse_probe`` per tier —
    O(N·L·r) = O(N log N), the same declared-argmax construction
    repeated per level, replayed verbatim in the oracle SQL's
    scalar-k arms, so results stay hash-exact at every
    oracle-checkable scale (arms cover L <= 3, k <= 274624). At L=2
    (64 < k <= 4224) this IS the historical two-level path
    bit-for-bit (coarse count isqrt(k)); below the threshold (every
    driver SF: k = 8–20) the flat path runs UNCHANGED — bit-identical
    to round 5.

    See ``knn_join_blocked`` for the blocking declaration, the
    ``dim``-unrolled cosine rationale, and the ``broadcast_pairs``
    regime selection — all of which live here.
    """
    label_cols = [label_col] if label_col else []
    if broadcast_pairs is None:
        thr = _parse_size_bytes(
            df.sparkSession.conf.get(
                "spark.sql.autoBroadcastJoinThreshold", "10485760"
            )
        )
        est = _pair_build_bytes(
            df, n_assign, dim, n_rows, [key_col, vec_col, *label_cols]
        )
        broadcast_pairs = 0 < est <= thr
    assigned = assign_cells(
        df,
        centroids,
        n_assign=n_assign,
        vec_col=vec_col,
        key_col=key_col,
        extra_cols=label_cols,
        n_centroids=n_centroids,
        coarse_threshold=coarse_threshold,
        coarse_probe=coarse_probe,
        tier_branch=tier_branch,
    )
    if dim is not None:
        # FLATTEN the vector to ``dim`` double columns before pairing.
        # Two measured traps at millions of candidate pairs (sf0.1,
        # 8 M pairs): (1) the zip_with/aggregate fold evaluates
        # interpreted (~167 s); (2) even an unrolled element_at chain
        # over the array column stays off the fast path (~28 s). Flat
        # per-dimension columns turn the pair cosine into straight
        # multiply-add column arithmetic (measured 5 s) with the SAME
        # left-associated summation order — bit-identical to the
        # oracle's sequential list_dot_product. Norms are computed once
        # per (vector, cell) row, not twice per pair.
        # selectExpr: ONE py4j call for the dim+2-column projection —
        # the Column-chain form paid ~3 py4j round trips per dim of
        # pure plan-build latency (see dot_sql)
        vd = as_double(F.col(vec_col))
        assigned = assigned.withColumn("_vd", vd).selectExpr(
            "centroid_id",
            key_col,
            *label_cols,
            f"sqrt({dot_sql('_vd', '_vd', dim)}) AS _norm",
            *[f"_vd[{i}] AS _e{i}" for i in range(dim)],
        )
    # The per-pair projection below is the operator's hot loop; AQE
    # coalesces the tiny assigned exchange (N·n_assign rows) to ONE
    # partition, which serializes millions of candidate-pair cosines
    # onto one core (measured 141 s single-task at sf0.1). An explicit
    # round-robin repartition is user-specified, so AQE keeps all
    # partitions of the probe side busy. Two regimes for the join
    # itself: below autoBroadcastJoinThreshold the build side
    # broadcasts and the probe's repartition IS the parallelism
    # (asserted in test_plan_audit); above it Spark shuffle-joins on
    # centroid_id, where parallelism comes from the scaled cell count
    # (max(8, N//250) cells) and the probe repartition is one wasted
    # small exchange — acceptable, since that regime is exactly where
    # broadcasting would OOM the driver.
    par = df.sparkSession.sparkContext.defaultParallelism
    # both regimes PINNED by hint: without one, the planner's static
    # estimate and AQE's runtime size can disagree near the threshold
    # and the strategy flips run-to-run (the measured 3.8s <-> 15s)
    if broadcast_pairs:
        a = assigned.repartition(par).alias("a")
        b = F.broadcast(assigned.alias("b"))
    else:
        # Merge regime: pin the join width from the estimated
        # CANDIDATE volume, not the input volume. AQE's coalescing
        # sizes reduce tasks from the MAP bytes, and this join
        # EXPANDS ~|cell|-fold — measured r11 at 2M vectors: AQE
        # coalesced the pair stage to 110 tasks whose per-task local
        # sort (the prune_k partial) spilled ~2.7 GB each, 32
        # concurrently — a host-disk cliff that narrow tasks remove
        # entirely. Explicit same-width co-partitioning on the
        # equi-key doubles as the join distribution (zero further
        # exchange; a cell's pairs stay in one task, bounded because
        # cell occupancy is bounded by construction — which is also
        # why forgoing AQE skew-split on the user repartition costs
        # nothing here).
        width = par
        if n_rows is not None:
            cells = n_centroids or max(8, n_rows // 250)
            cand_rows = (n_rows * n_assign) ** 2 // max(cells, 1)
            width = int(
                min(max(cand_rows * 64 // _PAIR_TASK_BYTES, par), 4096)
            )
        a = assigned.repartition(width, "centroid_id").alias("a")
        b = assigned.repartition(width, "centroid_id").alias("b").hint(
            "merge"
        )
    if dim is not None:
        # one parsed expression — the Column-op loop was ~2·dim py4j
        # round trips of plan-build latency (see dot_sql); the string
        # parses to the identical left-associated tree
        pair_sim = F.expr(
            "(0.0D"
            + "".join(f" + a._e{i} * b._e{i}" for i in range(dim))
            + ") / (a._norm * b._norm)"
        )
    else:
        pair_sim = cosine(
            as_double(F.col(f"a.{vec_col}")), as_double(F.col(f"b.{vec_col}"))
        )
    pair_pred = (F.col("a.centroid_id") == F.col("b.centroid_id")) & (
        F.col(f"a.{key_col}") != F.col(f"b.{key_col}")
    )
    if label_col and not carry_labels:
        pair_pred = pair_pred & (
            F.col(f"a.{label_col}") != F.col(f"b.{label_col}")
        )
    carried = (
        [
            F.col(f"a.{label_col}").alias("vec_label"),
            F.col(f"b.{label_col}").alias("neighbor_label"),
        ]
        if label_col and carry_labels
        else []
    )
    out = a.join(b, pair_pred).select(
        F.col(f"a.{key_col}").alias("vec_id"),
        F.col(f"b.{key_col}").alias("neighbor_id"),
        pair_sim.alias("cosine_sim"),
        *carried,
    )
    if prune_k is not None:
        grp = ["vec_id"] + (
            ["neighbor_label"] if (label_col and carry_labels) else []
        )
        w = Window.partitionBy(*grp).orderBy(
            F.desc("cosine_sim"), F.asc("neighbor_id")
        )
        out = (
            out.withColumn("_dr", F.dense_rank().over(w))
            .filter(F.col("_dr") <= prune_k)
            .drop("_dr")
        )
    # a pair co-resident in BOTH probed cells appears twice with the
    # identical fold-computed sim — exact-duplicate rows, one survives
    # (labels, when carried, are functions of the keys, so the wider
    # distinct keeps exactly the same pair set)
    return out.distinct()


def knn_topk_from_pairs(
    pairs: DataFrame, k: int = 3, cross_label_only: bool = False
) -> DataFrame:
    """Rank a scored candidate-pair list (``knn_candidate_pairs``
    output) into each vector's top-k neighbors. With
    ``cross_label_only`` the pair list must carry ``vec_label`` /
    ``neighbor_label`` (``carry_labels=True``) and only disagreeing
    pairs survive — NULL labels never pair, matching the pushed-down
    predicate's SQL null semantics bit-for-bit.

    Scale: a bounded window per vector over ≤ n_assign·max_cell rows —
    the cheap tail of the kNN build, which is the point of caching the
    pair list across consumers.
    """
    if cross_label_only:
        pairs = pairs.filter(F.col("vec_label") != F.col("neighbor_label"))
    w_top = Window.partitionBy("vec_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        pairs.select("vec_id", "neighbor_id", "cosine_sim")
        .withColumn("rank", F.row_number().over(w_top))
        .filter(F.col("rank") <= k)
        .select("vec_id", "rank", "neighbor_id", "cosine_sim")
    )


def prune_pairs_group_topk(
    pairs: DataFrame, k: int, group_col: str | None = "neighbor_label"
) -> DataFrame:
    """Lossless build-time prune of a scored candidate-pair list
    before it is checkpointed: keep each vector's top-``k`` rows per
    (``vec_id``, ``group_col``) by the consumers' exact rank order
    (``cosine_sim`` DESC, ``neighbor_id`` ASC) — so the STORED list is
    O(N·L·k) rows (L = label cardinality, a handful) instead of the
    full Σ cells |cell|² candidate volume. At sf10 the unpruned
    checkpoint was 72 GB co-resident with the 48 g heap — THE
    single-JVM storage wall (SCALE.md r07); every consumer ultimately
    keeps a per-vector top-k, so rows outside every group's top-k can
    never be observed.

    Commutation proof (why per-GROUP, not per-vector, partials): both
    checkpoint consumers have the form "drop whole neighbor-label
    groups, then row_number() per vec_id over (cosine_sim DESC,
    neighbor_id ASC), keep rank <= j" with j <= k:

    - ``emb_knn_join`` drops nothing (j=3);
    - ``emb_hard_negatives`` drops the group whose ``neighbor_label``
      equals ``vec_label`` — and NULL-label groups, since SQL
      ``vec_label != neighbor_label`` is never true on NULL. The
      label is a FUNCTION of vec_id, so per vec_id the filter removes
      whole (vec_id, neighbor_label) groups, never part of one.

    For any union U of surviving groups, the top-j of U under a total
    order is contained in the union of each group's top-j (a row
    outside its own group's top-k has k better rows in its own group
    alone, all of which are in U). The rank order is TOTAL per group
    ((vec_id, neighbor_id) is unique after the distinct), so per-group
    top-k is deterministic and the prune is exact — pinned by
    ``test_knn_pair_prune_lossless`` and by the driver hashes of both
    consumers.

    Scale: the rank filter compiles to the two-phase
    ``WindowGroupLimit`` (partial per-mapper limit BEFORE the
    exchange, CI-pinned in test_plan_audit), so the pair expansion is
    cut to <= k rows per group per mapper as it is produced — the
    full list never exists on disk OR in the shuffle that feeds the
    checkpoint. With ``group_col=None`` (an unlabeled pair list) the
    partial is per vec_id alone.
    """
    keys = ["vec_id"] + ([group_col] if group_col else [])
    w = Window.partitionBy(*keys).orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("_pr", F.row_number().over(w))
        .filter(F.col("_pr") <= k)
        .drop("_pr")
    )


def knn_join_blocked(
    df: DataFrame,
    centroids: DataFrame,
    k: int = 3,
    n_assign: int = 2,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    dim: int | None = None,
    neg_label_col: str | None = None,
    broadcast_pairs: bool | None = None,
    n_rows: int | None = None,
    n_centroids: int | None = None,
    coarse_threshold: int = 64,
    coarse_probe: int = 2,
    tier_branch: int | None = None,
) -> DataFrame:
    """Approximate KNN self-join (the kNN-graph builder behind semantic
    dedup and diversity sampling): every vector gets its top-k cosine
    neighbors among vectors sharing at least one of its ``n_assign``
    nearest IVF cells.

    The ANN structure is DECLARED, not incidental: candidates are
    exactly "co-resident in some probed cell", so an oracle can replay
    the same blocking and the result is bit-reproducible — recall vs
    the exact kNN graph is a measured property (rises with n_assign),
    not a correctness gamble.

    Scale: 100 % JVM — multi-probe assignment is a broadcast
    cross-join + per-key rank, candidates come from ONE equi-join
    shuffled on the cell id (pair space Σ cells |cell|², never N²),
    and top-k per vector is a bounded window over ≤ n_assign·max_cell
    rows per vector. Pass ``dim`` to run the per-pair cosine as an
    UNROLLED codegen chain with per-vector precomputed norms — the HOF
    fold evaluates interpreted and at millions of pairs it dominates
    the whole operator (measured 167 s → ~9 s at sf0.1, identical
    bits); without ``dim`` the fold path is kept for unknown widths.

    ``neg_label_col``: hard-negative mining mode (contrastive
    training-data assembly) — candidate pairs are additionally
    required to DISAGREE on this label column, so the result is each
    vector's top-k most-similar cross-label neighbors (the hardest
    negatives in its probed cells). Rows with a NULL label never form
    pairs (SQL null-comparison semantics, identical in the oracle).
    The predicate is pushed into the pair join here (same-label
    cosines are never computed); callers sharing one pair list across
    consumers use ``knn_candidate_pairs(carry_labels=True)`` +
    ``knn_topk_from_pairs(cross_label_only=True)``, which is
    bit-identical.

    ``broadcast_pairs``: the pair join has two regimes — broadcast
    (small corpora: the scaled cell count bottoms out at 8 and
    SMJ/cell-count parallelism collapses, AQE coalesces the pair
    expansion to 1-2 tasks and the strategy flips run-to-run near the
    10 MB threshold, measured 3.8 s vs 12-15 s for the SAME plan at
    sf0.1) and sort-merge on the cell id (production N: thousands of
    cells, memory-safe, broadcasting would OOM the driver). By default
    (``None``) the regime is CHOSEN AT PLAN-BUILD TIME from the
    estimated build-side bytes (``_pair_build_bytes``: exact when the
    caller passes its cached ``n_rows``, Catalyst sizeInBytes
    otherwise) vs ``spark.sql.autoBroadcastJoinThreshold`` — and then
    PINNED with an explicit broadcast/merge hint so AQE's runtime-size
    re-decision can't flip it. Pass True/False to override.
    """
    pairs = knn_candidate_pairs(
        df,
        centroids,
        n_assign=n_assign,
        vec_col=vec_col,
        key_col=key_col,
        dim=dim,
        label_col=neg_label_col,
        carry_labels=False,
        broadcast_pairs=broadcast_pairs,
        n_rows=n_rows,
        n_centroids=n_centroids,
        coarse_threshold=coarse_threshold,
        coarse_probe=coarse_probe,
        tier_branch=tier_branch,
        # the sole consumer is the per-vector top-k below, so the
        # map-side dense_rank partial (round 11) is lossless here by
        # the same argument as the shared-checkpoint build
        prune_k=k,
    )
    return knn_topk_from_pairs(pairs, k=k)


def pq_codes(
    df: DataFrame,
    n_codes: int = 16,
    n_subspaces: int = 8,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    codebook_rows: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Product-quantization codes: split each vector into
    ``n_subspaces`` contiguous sub-vectors and assign each to its
    nearest codebook entry by squared L2 (argmin, ties to the lower
    code). Output one row per (vector, subspace) with the code and
    the subspace quantization error — the IVF-PQ compression step
    (Jégou et al., TPAMI 2011): 64 float32 dims become 8 4-bit codes.

    Codebook convention: the sub-vectors of the first ``n_codes``
    vectors (``vec_id < n_codes``) — the same deterministic seed rule
    as the IVF centroids (``_centroids_scaled``), so the oracle can
    replay the assignment exactly (no trained state to ship). The
    codebook is collected to the driver (n_codes × dim floats — the
    ``_query_vec`` precedent) and unrolled into codegen literals.

    Shape: explode per subspace (each row = one dsub-dim sub-vector),
    broadcast-join the 128-row literal codebook table (built by
    exploding a literal array over ``spark.range(1)`` — no driver RDD,
    no parquet), compute one small 8-dim unrolled distance chain per
    joined row, and take the per-(vector, subspace) argmin as a
    map-side-combinable ``min(struct(dist, code))``.

    Why NOT the all-literal single-projection form: inlining 16
    codes × 8 subspaces of literal coefficients into one projection
    either overflows Janino (fully inlined), silently falls back to
    INTERPRETED eval after CollapseProject re-merges any staged
    columns (measured 10.9 s vs 0.7 s at sf0.1), or — even when it
    runs — costs seconds of driver-side analysis per plan build on a
    ~100k-node expression tree. The join form keeps every expression
    codegen-sized, the plan small, and is the shape that still works
    when the codebook is trained state instead of a literal.

    Determinism: distances expand as dot(v,v) - 2·dot(v,c) + dot(c,c)
    with every dot a left-fold in index order, matching DuckDB's
    sequential list_dot_product bit-for-bit; dot(c,c) folds
    driver-side in the same order; min(struct(dist, code)) breaks
    exact-tie distances toward the lower code in both engines.
    """
    # codebook_rows: pre-collected [(key, [floats])] seed rows (the
    # catalog memoizes them per corpus file — r11); collected here
    # only when the caller has none
    rows = codebook_rows or sorted(
        df.filter(F.col(key_col) < n_codes).select(key_col, vec_col).collect(),
        key=lambda r: r[0],
    )
    if len(rows) < n_codes:
        raise ValueError(
            f"corpus has only {len(rows)} vectors with {key_col} < "
            f"{n_codes}; cannot seed the PQ codebook"
        )
    dim = len(rows[0][1])
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by {n_subspaces} subspaces")
    dsub = dim // n_subspaces
    # codebook[code][s] = (subvector floats, dot(c,c) via left fold)
    cb: list[list[tuple[list[float], float]]] = []
    for r in rows:
        v = [float(x) for x in r[1]]
        subs = []
        for s in range(n_subspaces):
            c = v[s * dsub : (s + 1) * dsub]
            cc = 0.0
            for x in c:
                cc = cc + x * x
            subs.append((c, cc))
        cb.append(subs)

    spark = df.sparkSession
    # 128-row literal codebook table (code, s, cv[dsub], cc) via ONE
    # SQL VALUES string: building the same table from F.lit() columns
    # costs ~1.2k py4j round-trips (~3 s of driver time PER PLAN
    # BUILD, measured); one server-side parse is milliseconds. The
    # 'D' suffix forces DOUBLE literals (bare decimals parse as
    # DECIMAL), and repr() round-trips doubles exactly.
    rows_sql = ", ".join(
        "({}, {}, array({}), {}D)".format(
            code,
            s,
            ", ".join(f"{x!r}D" for x in cb[code][s][0]),
            repr(cb[code][s][1]),
        )
        for code in range(n_codes)
        for s in range(n_subspaces)
    )
    cb_df = spark.sql(
        f"SELECT CAST(_code AS INT) AS _code, CAST(_cs AS INT) AS _cs, "
        f"_cv, _cc FROM (VALUES {rows_sql}) AS t(_code, _cs, _cv, _cc)"
    )

    # explode per subspace: each row carries one dsub-dim sub-vector
    ex = df.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(n_subspaces - 1))).alias("_s"),
        as_double(F.col(vec_col)).alias("_v"),
    ).select(
        F.col(key_col),
        F.col("_s").cast("int").alias("_s"),
        F.slice("_v", F.col("_s") * dsub + 1, dsub).alias("_sv"),
    )

    def sv(d: int) -> Column:
        return F.element_at("_sv", d + 1)

    aa: Column = F.lit(0.0)
    for d in range(dsub):
        aa = aa + sv(d) * sv(d)
    ac: Column = F.lit(0.0)
    for d in range(dsub):
        ac = ac + sv(d) * F.element_at("_cv", d + 1)
    dist = aa - F.lit(2.0) * ac + F.col("_cc")

    scored = ex.join(
        F.broadcast(cb_df), F.col("_s") == F.col("_cs")
    ).select(
        F.col(key_col),
        F.col("_s"),
        F.struct(dist.alias("d"), F.col("_code").alias("c")).alias("_cand"),
    )
    return (
        scored.groupBy(key_col, "_s")
        .agg(F.min("_cand").alias("_best"))
        .select(
            F.col(key_col),
            F.col("_s").alias("subspace"),
            F.col("_best.c").alias("code"),
            F.col("_best.d").alias("sub_err"),
        )
    )


def semdedup_stats(
    df: DataFrame,
    centroids: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    dim: int | None = None,
    n_centroids: int | None = None,
    coarse_threshold: int = 64,
    coarse_probe: int = 2,
    tier_branch: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings and dropping, within each
    cluster, every vector that has a strictly-smaller-keyed cluster
    member with cosine >= ``threshold`` — a DOMINANCE rule, evaluated
    against ALL smaller-keyed members (kept or themselves dropped),
    which is what makes it a single self-join instead of a sequential
    scan. On a similarity CHAIN (a~b, b~c, a!~c) it therefore drops
    one more member than sequential greedy keep-first would (b
    disqualifies c even though b itself was dropped): drop counts are
    an upper bound on the paper's greedy pass, deterministic on the
    key order, and replayed identically by the oracle. Returns
    per-cluster ``(centroid_id, n_members, n_dropped, n_kept)``.

    The blocking is DECLARED (1-NN assignment to the given centroids,
    ties on centroid_id), so an oracle can replay it exactly; the
    approximation — cross-cluster near-dups survive — is structural,
    never arithmetic.

    Scale: assignment is the shared ``assign_cells`` helper (top-1
    here): flat broadcast cross-join + per-key rank at driver SFs,
    L-LEVEL coarse-probe-descended past ``coarse_threshold`` cells
    when the caller declares ``n_centroids`` — O(N log N), the
    round-8 fix for the Θ(N^1.5) two-level assignment the sf10
    rehearsal measured on THIS operator (exp 1.51, exactly its then-
    declared N·√k arithmetic, SCALE.md r07; the sf3 rehearsal had
    measured the flat regime quadratic before that, exp₃ 1.99). The pair space stays sum over cells of
    |cell|^2, bounded by the scaled cell count (see
    ``_centroids_scaled``); with ``dim`` the pair cosine runs as
    flat-column codegen multiply-adds (the ``knn_join_blocked``
    kernel — the HOF fold is 10-100x slower at pair volume). Only
    (cluster, key) pairs shuffle out of the join.
    """
    assigned = assign_cells(
        df,
        centroids,
        n_assign=1,
        vec_col=vec_col,
        key_col=key_col,
        n_centroids=n_centroids,
        coarse_threshold=coarse_threshold,
        coarse_probe=coarse_probe,
        tier_branch=tier_branch,
    )
    if dim is not None:
        # selectExpr: one py4j call, one parsed projection (see
        # dot_sql — the Column-chain form cost ~3 py4j trips per dim
        # of plan-build latency per rep)
        vd = as_double(F.col(vec_col))
        flat = assigned.withColumn("_vd", vd).selectExpr(
            "centroid_id",
            key_col,
            f"sqrt({dot_sql('_vd', '_vd', dim)}) AS _norm",
            *[f"_vd[{i}] AS _e{i}" for i in range(dim)],
        )
        # Codegen barrier: without it the window filter + 64 casts +
        # norm chain + pair products fuse into one generated method
        # that overflows Janino's 64 KB limit and the whole stage
        # falls back to INTERPRETED eval (measured 4.3 s vs 1.5 s at
        # sf0.1, with an ERROR in the log). localCheckpoint
        # materializes the flattened table once (disk-spillable,
        # executor-local — same order of cost as the shuffle write
        # the pair join does anyway) and truncates the lineage, so
        # the join stage compiles against ready columns. The staged
        # alternative (separate projections) does NOT work:
        # CollapseProject re-merges them (the pq_codes lesson).
        # spill_checkpoint (serialized, disk-evictable) because this
        # table scales with the corpus — N rows x 64 flat doubles of
        # DESERIALIZED heap rows was the measured sf3 memory residue
        # (SCALE.md r07).
        flat = spill_checkpoint(flat)
    else:
        flat = assigned
    # membership counts read the CHECKPOINTED table: computing them
    # from `assigned` would re-run the whole assignment stage (coarse
    # cross-join + two window ranks in the two-level regime) a second
    # time per action, since the checkpoint truncates the lineage the
    # exchange reuse would need (review r06). One row per assigned
    # row either way — identical counts.
    members = flat.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    # explicit repartition: AQE coalesces the tiny assigned exchange to
    # one partition and would serialize the pair loop (the measured
    # knn_join_blocked trap); round-robin keeps every core busy.
    par = df.sparkSession.sparkContext.defaultParallelism
    a = flat.repartition(par).alias("a")
    b = flat.alias("b")
    if dim is not None:
        # one parsed expression instead of ~2·dim py4j calls (dot_sql)
        pair_sim = F.expr(
            "(0.0D"
            + "".join(f" + a._e{i} * b._e{i}" for i in range(dim))
            + ") / (a._norm * b._norm)"
        )
    else:
        pair_sim = cosine(
            as_double(F.col(f"a.{vec_col}")), as_double(F.col(f"b.{vec_col}"))
        )
    dropped = (
        a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col(f"a.{key_col}") < F.col(f"b.{key_col}")),
        )
        .filter(pair_sim >= F.lit(threshold))
        .select(
            F.col("a.centroid_id").alias("centroid_id"),
            F.col(f"b.{key_col}").alias("_dropped"),
        )
        .distinct()
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n_dropped"))
    )
    return (
        members.join(dropped, "centroid_id", "left")
        .select(
            "centroid_id",
            "n_members",
            F.coalesce(F.col("n_dropped"), F.lit(0)).alias("n_dropped"),
            (
                F.col("n_members")
                - F.coalesce(F.col("n_dropped"), F.lit(0))
            ).alias("n_kept"),
        )
    )


def mmr_rerank(
    df: DataFrame,
    k: int = 10,
    lam: float = 0.5,
    query_col: str = "query_id",
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    rel_col: str = "rel_score",
) -> DataFrame:
    """Maximal Marginal Relevance reranking (Carbonell & Goldstein
    1998): per query, greedily select ``k`` candidates maximizing
    ``lam·relevance − (1−lam)·max_cosine_to_already_selected`` — the
    post-retrieval diversification pass that keeps a near-dup-heavy
    top-k from collapsing to one semantic cluster (the retrieval-side
    complement of SemDeDup's corpus-side fix). Ties break on the
    smaller key; selection order returns as ``mmr_rank`` (1-based)
    with the marginal ``mmr_score`` that won each round. The
    redundancy penalty is CLAMPED at 0 (max_sim starts at zero): a
    candidate anti-correlated with everything picked counts as
    non-redundant, never as a bonus — the semantics the
    ``emb_mmr_rerank`` oracle replays with greatest(…, 0).

    Scale shape: reranking is inherently PER-QUERY SEQUENTIAL over a
    BOUNDED candidate list (the retriever's top-N, N ≤ ~1k), so the
    distribution axis is queries, not candidates: one shuffle on
    ``query_col``, then an Arrow-batched ``applyInPandas`` runs the
    O(k·N) greedy with normalized-matrix dot products per group.
    Millions of queries parallelize perfectly; nothing touches the
    driver. (Contrast ``cosine_near_dup_pairs``, whose driver-collect
    is guarded at 1e5 rows — here the per-GROUP bound is structural:
    the retriever already capped N.)
    """
    import numpy as np
    import pandas as pd

    # derive the passthrough column types from the input — hardcoding
    # long/double would break string query/document ids at Arrow time
    in_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_fields = (
        f"{query_col} {in_types[query_col]}, {key_col} {in_types[key_col]}, "
        f"{rel_col} {in_types[rel_col]}, mmr_rank long, mmr_score double"
    )

    def rerank(pdf: pd.DataFrame) -> pd.DataFrame:
        q = pdf[query_col].iloc[0]
        ids = pdf[key_col].to_numpy()
        # float64 copy is for score arithmetic ONLY; the output emits
        # the ORIGINAL values so an integer rel_col round-trips Arrow
        # without an unsafe float64->long cast
        rel_orig = pdf[rel_col].reset_index(drop=True)
        rel = pdf[rel_col].to_numpy(dtype=np.float64)
        mat = np.array(list(pdf[vec_col]), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        mat = mat / norms
        n = len(ids)
        selected: list[int] = []
        max_sim = np.zeros(n)
        picked = np.zeros(n, dtype=bool)
        rows = []
        for rank in range(1, min(k, n) + 1):
            score = lam * rel - (1.0 - lam) * max_sim
            score[picked] = -np.inf
            # argmax with smaller-key tiebreak: order candidates by
            # (-score, id) via lexsort
            order = np.lexsort((ids, -score))
            best = order[0]
            picked[best] = True
            selected.append(best)
            rows.append((q, ids[best], rel_orig.iloc[best], rank, score[best]))
            sims = mat @ mat[best]
            max_sim = np.maximum(max_sim, sims)
        return pd.DataFrame(
            rows, columns=[query_col, key_col, rel_col, "mmr_rank", "mmr_score"]
        )

    return (
        df.select(query_col, key_col, rel_col, vec_col)
        .groupBy(query_col)
        .applyInPandas(rerank, out_fields)
    )


def mmr_rerank_scored(
    pairs: DataFrame,
    k: int = 10,
    lam: float = 0.5,
    query_col: str = "query_id",
    key_col: str = "vec_id",
    rel_col: str = "rel_score",
    nbr_col: str = "neighbor_id",
    sim_col: str = "pair_sim",
) -> DataFrame:
    """MMR greedy over PRE-SCORED candidates — the oracle-exact (and
    100 TB) formulation of ``mmr_rerank``: every cosine the greedy
    consults (relevance AND candidate-pair redundancy) is computed
    ONCE, JVM-side, by the sequential-fold ``cosine`` that
    bit-matches DuckDB's ``list_dot_product`` — so the Python stage
    only does argmax/max/multiply/subtract over floats both engines
    hold identically, and the selection sequence is deterministic
    cross-engine (the plain ``mmr_rerank`` recomputes sims with
    numpy's pairwise-summed matmul, which is bit-INcomparable to any
    SQL fold and fine only engine-internally).

    Input: one row per candidate×co-candidate pair within a query —
    ``(query_col, key_col, rel_col, nbr_col, sim_col)``, left-joined
    so a single-candidate query keeps one null-neighbor row. Output:
    ``(query_col, key_col, rel_col, mmr_rank, mmr_score)``, ranks
    1..k per query in greedy order with the winning marginal score;
    the redundancy penalty is clamped at 0 exactly as ``mmr_rerank``
    (and the ``emb_mmr_rerank`` oracle's ``greatest(max_sim, 0)``).

    Scale shape: one shuffle on ``query_col``; each group is the
    retriever's bounded top-N candidates squared (N ≤ ~1k → ≤ 1M tiny
    rows), so millions of queries parallelize on the query axis and
    the O(k·N) greedy runs Arrow-batched per group with zero vector
    math in Python.
    """
    import numpy as np
    import pandas as pd

    in_types = {f.name: f.dataType.simpleString() for f in pairs.schema.fields}
    out_fields = (
        f"{query_col} {in_types[query_col]}, {key_col} {in_types[key_col]}, "
        f"{rel_col} {in_types[rel_col]}, mmr_rank long, mmr_score double"
    )

    def rerank(pdf: pd.DataFrame) -> pd.DataFrame:
        q = pdf[query_col].iloc[0]
        cand = (
            pdf.drop_duplicates(subset=[key_col])
            .sort_values(key_col)
            .reset_index(drop=True)
        )
        ids = cand[key_col].to_numpy()
        rel_orig = cand[rel_col].reset_index(drop=True)
        rel = cand[rel_col].to_numpy(dtype=np.float64)
        n = len(ids)
        pos = {v: i for i, v in enumerate(ids)}
        simm = np.zeros((n, n))
        pp = pdf[pdf[nbr_col].notna()]
        rows_i = [pos[v] for v in pp[key_col]]
        rows_j = [pos[v] for v in pp[nbr_col]]
        simm[rows_i, rows_j] = pp[sim_col].to_numpy(dtype=np.float64)
        max_sim = np.zeros(n)
        picked = np.zeros(n, dtype=bool)
        out = []
        for rank in range(1, min(k, n) + 1):
            score = lam * rel - (1.0 - lam) * max_sim
            score[picked] = -np.inf
            order = np.lexsort((ids, -score))
            best = order[0]
            picked[best] = True
            out.append((q, ids[best], rel_orig.iloc[best], rank, score[best]))
            max_sim = np.maximum(max_sim, simm[:, best])
        return pd.DataFrame(
            out, columns=[query_col, key_col, rel_col, "mmr_rank", "mmr_score"]
        )

    return (
        pairs.select(query_col, key_col, rel_col, nbr_col, sim_col)
        .groupBy(query_col)
        .applyInPandas(rerank, out_fields)
    )


def ndcg_at_k(
    results: DataFrame,
    ideal: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    key_col: str = "vec_id",
    rank_col: str = "rank",
    gain_col: str = "gain",
    quantize: int | None = None,
) -> DataFrame:
    """NDCG@k per query: ``results`` carries the system ranking
    (query, key, rank), ``ideal`` the graded relevance (query, key,
    gain ≥ 0). DCG = Σ gain/log2(rank+1) over the top-k; IDCG ranks
    the ideal gains by (gain desc, key asc) — the deterministic
    tie-break rule used across the catalog. Output: (query, dcg,
    idcg, ndcg) — the graded companion of the exact-overlap
    recall@10 entries (emb_ivf_recall / emb_matryoshka_recall /
    emb_pq_recall), for when near-misses should score partial credit.

    Scale: two shuffles on the query key (results⋈gains equi-join +
    the ideal-ranking window, both bounded by k and the per-query
    judgment count); the division is one double op per query.

    ``quantize``: round each DCG/IDCG term to that many decimals and
    sum in DECIMAL — Spark's double aggregation has no pinned
    addition order, so a hash-gated catalog entry needs the exact
    associative sum (the ``docs_unigram_nll`` pattern). Default None
    keeps raw double sums (production use, where last-ulp
    reproducibility doesn't matter).
    """
    lg = lambda r: F.log2(r.cast("double") + 1.0)  # noqa: E731
    if quantize is not None:
        qd = f"decimal(18,{quantize})"
        term = lambda g, r: F.sum(  # noqa: E731
            F.round(g / lg(r), quantize).cast(qd)
        ).cast("double")
    else:
        term = lambda g, r: F.sum(g / lg(r))  # noqa: E731
    sys_k = results.filter(F.col(rank_col) <= k).join(
        ideal.select(query_col, key_col, gain_col), [query_col, key_col], "left"
    )
    dcg = sys_k.groupBy(query_col).agg(
        term(
            F.coalesce(F.col(gain_col), F.lit(0.0)), F.col(rank_col)
        ).alias("dcg")
    )
    w = Window.partitionBy(query_col).orderBy(
        F.desc(gain_col), F.asc(key_col)
    )
    ideal_k = ideal.withColumn("_ir", F.row_number().over(w)).filter(
        F.col("_ir") <= k
    )
    idcg = ideal_k.groupBy(query_col).agg(
        term(F.col(gain_col), F.col("_ir")).alias("idcg")
    )
    # anchor on the JUDGED query set: a query with judgments but no
    # system results is the failure NDCG must punish — it scores 0,
    # it doesn't vanish (which would inflate a mean-over-queries).
    # Queries with results but no judgments are unscorable and drop.
    return idcg.join(dcg, query_col, "left").select(
        query_col,
        F.coalesce("dcg", F.lit(0.0)).alias("dcg"),
        "idcg",
        F.when(F.col("idcg") > 0, F.coalesce("dcg", F.lit(0.0)) / F.col("idcg"))
        .alias("ndcg"),
    )


def dim_stats(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-DIMENSION corpus statistics over an embedding column: count,
    mean, second moment, and variance for each coordinate — the
    whitening-input / anisotropy profile (a dimension with near-zero
    variance is dead; a mean far from 0 is the common-offset problem
    mean-centering fixes). Complements ``emb_pair_sim_hist`` (pairwise
    collapse view) with the coordinate-wise view.

    Determinism: components widen float->double EXACTLY, quantize to
    DECIMAL(8,5) (ROUND 5 — the unigram-NLL pattern), then rescale to
    INTEGER hundred-thousandths (``ui = xq×1e5``, exact decimal
    arithmetic) so BOTH sums are INTEGER-VALUED decimals — the
    catalog's integer-cents lesson taken to its conclusion. A
    fractional decimal->double cast diverges cross-engine once the
    unscaled value passes ~2^52 (DuckDB divides the int128 by
    10^scale in floating point, a second rounding the JVM's
    string-parse path above 2^52 doesn't take), but an INTEGER
    decimal->double cast is ONE correctly-rounded conversion in both
    engines at any magnitude up to int64 range (~9.2e18 — ~6e15
    unit-scale rows per dim before the squared sum reaches it;
    verified bit-equal across 2^52..2^62 probes). The trailing
    ``/1e5`` (``/1e10`` for squares) and ``/n`` are then bit-identical
    IEEE ops, identical to the pre-rescale formulation below 2^52.
    NULL/NaN/|x|>=1000 components are excluded identically in both
    engines (see the filter comment), so ``n_vecs`` counts in-domain
    observations.

    Scale: posexplode fans out x dim, but the per-dim aggregate
    map-side combines to |dims| rows per task before the one tiny
    shuffle (64 groups). No join, no window.
    """
    # NULL / NaN / |x| >= 1000 components are outside the stats domain
    # in BOTH engines (Spark's NaN- or overflow->decimal cast yields
    # NULL, DuckDB's ERRORS — the identical-predicate convention from
    # the stateful fold; the magnitude bound also catches ±Inf and is
    # exactly the DECIMAL(8,5) capacity, so no in-domain component can
    # silently NULL inside the quantize); n_vecs therefore counts
    # in-domain observations per dimension
    x = (
        emb.select(F.posexplode(vec_col).alias("dim", "x"))
        .filter(
            F.col("x").isNotNull()
            & ~F.isnan(F.col("x"))
            & (F.abs(F.col("x")) < F.lit(1000.0))
        )
        .select(
            "dim",
            # integer hundred-thousandths: xq (DECIMAL(8,5)) × 1e5 is
            # integer-valued by construction; the cast to scale 0 is
            # exact, and ui*ui is then the scale-10 product's unscaled
            # value — same math, integer-decimal representation
            (
                F.round(F.col("x").cast("double"), 5).cast("decimal(8,5)")
                * 100000
            )
            .cast("decimal(14,0)")
            .alias("ui"),
        )
    )
    n = F.count(F.lit(1))
    mean = F.sum(F.col("ui").cast("decimal(38,0)")).cast("double") / F.lit(
        1e5
    ) / n
    e2 = F.sum(
        (F.col("ui") * F.col("ui")).cast("decimal(38,0)")
    ).cast("double") / F.lit(1e10) / n
    return x.groupBy("dim").agg(
        n.cast("long").alias("n_vecs"),
        mean.alias("mean"),
        e2.alias("second_moment"),
        (e2 - mean * mean).alias("variance"),
    )
