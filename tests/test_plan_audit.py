"""Plan-quality gate (VERDICT r01 next-round 10): every catalog query's
physical plan is audited in CI for the anti-patterns that kill 100 TB
runs — row-at-a-time Python evaluation and cartesian products — plus
spot assertions that the dim joins the design relies on actually
broadcast. Arrow-batched Python (ArrowEvalPython / FlatMapGroupsInPandas
/ MapInPandas) is allowed: those are the engine's sanctioned slow
paths."""

from __future__ import annotations

import pytest

from tools.plan_audit import audit, formatted_plan
from wistia_data_pipeline_project_spark.plans import QUERIES


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    # audit the COLD structural plans: entries that .cache() an
    # intermediate get cache-manager plan substitution
    # (InMemoryTableScan + an extra exchange) when an earlier test in
    # the shared session happened to execute them — which made the
    # exchange-count pin order-dependent (measured: running
    # test_catalog_oracle first drifted 10 entries by +1 exchange).
    # SQL-cache eviction is a perf-only operation; the one-slot
    # localCheckpoint slots are RDD storage and are not touched.
    spark.catalog.clearCache()
    out = {}
    for name, fn in QUERIES.items():
        out[name] = formatted_plan(fn(spark, sf_dir))
    return out


def test_catalog_covers_all_queries(plans):
    assert len(plans) >= 48


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_plan_antipatterns(plans, name):
    _, warns = audit(name, plans[name])
    assert not warns, f"{name}: {warns}"


@pytest.mark.parametrize(
    "name",
    [
        "q3_top_orders",
        "q5_region_revenue",
        "customers_with_orders",
        # round-4 multi-join family: the dim chains must broadcast
        "q7_nation_trade",
        "q9_profit_by_nation_year",
        "q16_supplier_variety",
    ],
)
def test_dim_joins_broadcast(plans, name):
    plan = plans[name]
    assert "BroadcastHashJoin" in plan, f"{name} dim join must broadcast"
    assert "SortMergeJoin" not in plan, f"{name} shuffled a broadcastable dim"


@pytest.mark.parametrize("name", ["q8_market_share", "q10_returned_revenue_topk"])
def test_dim_chain_broadcasts_customer_may_shuffle(plans, name):
    """q8/q10 join customer, which is region/date-filtered but still
    fact-sized at 100 TB — a shuffle join there is the correct static
    plan (AQE converts to broadcast when a filter makes it small). The
    nation/region/part/supplier chain must still broadcast."""
    assert "BroadcastHashJoin" in plans[name], f"{name} lost its dim broadcasts"


def test_knn_join_pair_loop_stays_parallel(spark, sf_dir):
    """The kNN candidate-pair cosine loop must run as an AQE
    broadcast join probed through the explicit round-robin repartition
    (the parallelism carrier): statically Spark plans a sort-merge
    join, and without the user repartition AQE coalesces the tiny
    exchange and serializes the hot loop (the measured 141 s
    pathology) — so the assertion reads the FINAL adaptive plan after
    execution, not the static one. Drives the pair BUILDER directly
    (the catalog entries rank a localCheckpoint'ed shared pair list,
    whose consumer plans are just Scan ExistingRDD + Window — the
    hot loop lives in the builder)."""
    from wistia_data_pipeline_project_spark.operators import similarity as S
    from wistia_data_pipeline_project_spark.plans.catalog_emb import (
        _centroids_scaled,
        _nvec,
        _query_vec,
    )
    from wistia_data_pipeline_project_spark.sources.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    df = S.knn_candidate_pairs(
        emb,
        _centroids_scaled(sf_dir, emb),
        n_assign=4,
        dim=len(_query_vec(spark, sf_dir, 0)),
        label_col="label",
        carry_labels=True,
        n_rows=_nvec(sf_dir, emb),
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "BroadcastHashJoin" in plan
    assert "REPARTITION_BY_NUM" in plan


def test_q6_pushes_filters_into_scan(plans):
    assert "PushedFilters: [" in plans["q6_forecast_revenue"]
    # at least one real pushed predicate (not an empty list)
    pushed = [
        seg
        for seg in plans["q6_forecast_revenue"].split("PushedFilters: [")[1:]
        if not seg.startswith("]")
    ]
    assert pushed


# Entries allowed to contain a materialized (localCheckpoint'ed)
# intermediate: iterative training (k-means model state), the
# two-pass heavy-hitter candidate scheme, and the connected-components
# label iteration. Everything else must build a single lazy plan.
MATERIALIZING = {
    "emb_kmeans_quality",
    # per-round peeling checkpoints over the PAIR graph (two longs
    # per near-dup member, serialized spill level) + the shared
    # jaccard pair checkpoint it consumes — not a driver collect
    "docs_kcore_2",
    # the 16-byte aHash code table + the representative list are
    # spill-checkpointed (both feed two consumers); executor-local,
    # never a driver collect — the mm_image_near_dup precedent
    "mm_image_dedup_cascade",
    "events_heavy_hitters",
    "docs_dup_clusters",
    # inherits connected_components' per-iteration localCheckpoint
    # (the label table, two longs per near-dup member — not the corpus)
    "docs_dedup_keep_best",
    # localCheckpoint of the flattened (norm + per-dim) assignment
    # table as a codegen barrier — without it the fused pair-join
    # stage overflows Janino's 64 KB method limit and runs
    # interpreted (see similarity.semdedup_stats). Executor-local and
    # disk-spillable, not a driver collect.
    "emb_semdedup",
    # inherits connected_components' per-iteration localCheckpoint
    # (cluster-label table of the near-dup subset, not the corpus)
    "docs_leakage_safe_split",
    # prefix table + candidate list spill-checkpoints (r11): both
    # feed multiple consumers (self-join sides, verify semi-joins) —
    # prefix-shingle/pair-volume, executor-local, not a driver collect
    "docs_prefix_jaccard",
    # the capped shingle table checkpoint in _pair_intersections
    # (r11) — feeds both self-join sides and the sizes aggregate
    "docs_containment",
    # the window-fingerprint stream checkpoint in
    # remove_duplicated_spans (r11) — feeds df-count and covered join
    "docs_span_removal",
    # consume the shared _jaccard_pairs_cached checkpoint (the scored
    # near-dup pair list reused across seven entries — pair-volume,
    # executor-local, not a driver collect)
    "docs_triangle_stats",
    "docs_ngram_jaccard",
    "docs_simhash_quality",
    "docs_editdist_verify",
    "docs_minhash_estimate_error",
    "docs_source_overlap",
    # tenth consumer of the shared jaccard pair checkpoint (the
    # threshold-sensitivity curve reads the scored list once)
    "docs_dedup_threshold_curve",
    # pagerank's per-round checkpointed rank table (two columns,
    # graph-node-sized) — the iterative-plan pin, not a collect
    "docs_pagerank",
    # bpe_train is inherently driver-coordinated (ONE winning pair
    # returns per round) and the entry's output IS that driver-side
    # merge list; the corpus-sized work all happens in the vocab
    # collapse + per-round vocab scans
    "docs_bpe_merges",
    # aHash code table localCheckpoint'ed (16 B/image) so the
    # pigeonhole self-join doesn't decode the corpus twice —
    # executor-local, not a driver collect
    "mm_image_near_dup",
    # the expectation REPORT is by design a driver-assembled local
    # relation: run_expectations collects only scalar metrics (one
    # row per expectation) — the corpus-sized work is the single
    # aggregate pass + anti-join underneath
    "events_quality_contract",
    # consume the shared _knn_pairs_cached checkpoint (the scored
    # kNN candidate-pair list ranked by both entries — candidate-pair
    # volume, executor-local, not a driver collect)
    "emb_knn_join",
    "emb_hard_negatives",
    # the exact-duplicate group table (one row per DISTINCT vector)
    # is spill-checkpointed: reps + sizes both consume it, and the
    # un-checkpointed plan would run the vector-key collapse twice —
    # executor-local, never a driver collect (the image-cascade
    # precedent)
    "emb_near_dup_cascade",
    # the persisted IVF index state (_ivf_stats_cached, cells x dim
    # moment rows) is the one-slot checkpoint the incremental update
    # merges into — KB-sized, executor-local, never a driver collect
    "emb_ivf_incremental",
    # the rolling-HLL distinct (user, day) frame routes through the
    # same one-slot checkpoint helper (three consumers; was a bare
    # session-pinned .cache() before r10 — ADVICE r09)
    "events_rolling_hll_7d",
    # the per-order basket array spill-checkpoint (r11): one lineitem
    # scan + one orderkey collect_set shuffle feeds the item
    # frequencies, the order totals AND the pair expansion —
    # basket-volume, executor-local, not a driver collect
    "orders_basket_lift",
    # the distinct (group, token) table spill-checkpoint (r11): one
    # tokenize+distinct pass feeds the per-group sizes and both sides
    # of the intersection self-join — token-volume, executor-local
    "docs_vocab_overlap",
}


def test_stratified_sample_uses_window_group_limit(plans):
    """The rank-filter must compile to WindowGroupLimit (per-mapper
    k-row heaps before the shuffle) — the property that makes the
    deterministic sample reservoir-shaped instead of a full sort."""
    assert "WindowGroupLimit" in plans["docs_stratified_sample"]


def test_knn_rank_consumers_use_window_group_limit(plans):
    """The top-k rank over the shared scored-pair checkpoint must
    compile to the TWO-PHASE WindowGroupLimit (partial per-mapper
    top-k before the exchange) — at sf10 the pair list is ~4e8 rows
    and a full per-vector sort would dominate the consumers' cost
    (SCALE.md r08: with this plan the re-rank is I/O-bound on the
    checkpoint tier, not compute-bound)."""
    for name in ("emb_knn_join", "emb_hard_negatives"):
        assert plans[name].count("WindowGroupLimit") >= 2, name


def test_no_collect_in_query_builders(plans):
    """Building every catalog plan must not leave a driver-side
    collect footprint: plans exist for all entries without any
    CollectLimit-to-driver pattern in the final plan."""
    for name, plan in plans.items():
        assert "Scan ExistingRDD" not in plan or name in MATERIALIZING, (
            f"{name} materialized an RDD on the driver"
        )


def test_knn_family_pair_join_broadcasts(spark, sf_dir):
    """The small-N pair-join regime is PINNED to broadcast for the
    shared kNN pair builder (serving emb_knn_join and
    emb_hard_negatives): the SMJ fallback parallelizes by cell count,
    which bottoms out at 8 on catalog corpora — AQE then coalesces
    the pair expansion to 1-2 tasks and the strategy flips run-to-run
    near the threshold (measured 3.8s vs 12-15s). A SortMergeJoin
    appearing here means the broadcast_pairs hint was lost. Audits
    the builder's static plan (the catalog entries' own plans read
    the shared checkpoint)."""
    from wistia_data_pipeline_project_spark.operators import similarity as S
    from wistia_data_pipeline_project_spark.plans.catalog_emb import (
        _centroids_scaled,
        _nvec,
        _query_vec,
    )
    from wistia_data_pipeline_project_spark.sources.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    plan = formatted_plan(
        S.knn_candidate_pairs(
            emb,
            _centroids_scaled(sf_dir, emb),
            n_assign=4,
            dim=len(_query_vec(spark, sf_dir, 0)),
            label_col="label",
            carry_labels=True,
            n_rows=_nvec(sf_dir, emb),
        )
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, (
        "kNN pair join fell back to SortMergeJoin"
    )


def test_exchange_counts_pinned(plans, sf_dir):
    """Structural plan-cost pin (VERDICT r09 next-round 3): every
    entry's exchange count and join strategies must match the
    committed snapshot (``tests/plan_pins.json``, regenerated by
    ``SPARK_GRAFT_CPUS=8 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001
    python tools/plan_audit.py --pins tests/plan_pins.json`` — join
    strategies legitimately differ between SFs AND, since
    preferSortMergeJoin=false (r11), with the session core count
    (shuffled-hash eligibility scales with advisory×partitions), so
    the pin must be generated under the TEST session's config:
    sf0.001 at 8 cores, while PLANS.md stays the sf0.01 audit). An entry
    that silently gains an exchange (or trades a broadcast join for a
    shuffle join) fails HERE, not three rounds later in a bench-map
    diff — the r09 ``initialPartitionNum`` tax was only caught that
    slow way. A legitimate plan change is made visible by
    regenerating the snapshot so the diff is reviewed in the commit."""
    import json
    import os

    from tools.plan_audit import counters

    path = os.path.join(os.path.dirname(__file__), "plan_pins.json")
    with open(path) as fh:
        snap = json.load(fh)
    assert snap["sf_dir"] == sf_dir, (
        f"plan_pins.json was generated at {snap['sf_dir']}, tests run "
        f"at {sf_dir} — regenerate with SPARK_GRAFT_SF_DIR={sf_dir}"
    )
    pinned = snap["pins"]
    missing = set(plans) - set(pinned)
    assert not missing, f"entries without a pin: {sorted(missing)}"
    drift = {}
    for name, plan in plans.items():
        c = counters(plan)
        got = [c["n_exchange"], c["n_reused"], c["joins"]]
        if got != pinned[name]:
            drift[name] = {"plan": got, "pinned": pinned[name]}
    assert not drift, (
        "plan structure drifted from tests/plan_pins.json "
        f"(exchanges, reused, joins): {drift}"
    )


def test_plan_audit_notes_keys_are_catalog_entries():
    """Every curated PLANS.md note must name a live catalog entry —
    a rename would otherwise silently drop its note from the next
    --markdown regeneration (review r04)."""
    import __spark_entry__ as m
    from tools.plan_audit import NOTES

    stale = set(NOTES) - set(m.queries())
    assert not stale, f"NOTES keys without catalog entries: {sorted(stale)}"


def test_knn_two_level_assignment_plan_shape(spark, sf_dir):
    """The TWO-LEVEL assignment regime (n_centroids forced past the
    threshold — the same builder call _knn_pairs_cached makes once a
    corpus crosses ~16k vectors) must keep the plan inside the
    declared envelope: coarse scoring and the cmap/probe joins all
    broadcast (BHJ/BNLJ only), the pair loop still rides the explicit
    round-robin repartition, and no cartesian or Python-eval node
    appears. Without this, a regression in the two-level branch (a
    lost broadcast hint flipping cmap to SMJ) would pass the audit —
    the flat-path test above never builds this plan (review r06)."""
    from wistia_data_pipeline_project_spark.operators import similarity as S
    from wistia_data_pipeline_project_spark.plans.catalog_emb import (
        _centroids_scaled,
        _nvec,
        _query_vec,
    )
    from wistia_data_pipeline_project_spark.sources.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    df = S.knn_candidate_pairs(
        emb,
        _centroids_scaled(sf_dir, emb),
        n_assign=4,
        dim=len(_query_vec(spark, sf_dir, 0)),
        label_col="label",
        carry_labels=True,
        n_rows=_nvec(sf_dir, emb),
        n_centroids=100,  # force the regime on the small fixture
        coarse_threshold=64,
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "REPARTITION_BY_NUM" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    import re

    joins = set(re.findall(r"(\w*Join\w*)", plan))
    assert joins <= {"BroadcastHashJoin", "BroadcastNestedLoopJoin"}, joins


def test_dpp_scan_prunes_partitions(spark, sf_dir):
    """events_dpp_weekend_scan must carry a DPP subquery in the
    partitioned fact scan's PartitionFilters (VERDICT r09 next-round
    8): the dim-side comparison predicate plants
    dynamicpruningexpression(event_date IN dynamicpruning#N), so only
    the matching date partitions' files are listed/read at runtime."""
    from wistia_data_pipeline_project_spark.plans import QUERIES

    df = QUERIES["events_dpp_weekend_scan"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = [
        line for line in plan.splitlines()
        if "dynamicpruningexpression(event_date" in line
    ]
    assert lines, f"no DPP subquery on the fact scan:\n{plan[:2000]}"
    assert any("PartitionFilters" in line for line in lines)


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """events_bucketed_cohort_join's 100 TB plan: with broadcast
    disabled (at scale BOTH sides are fact-sized), the user-keyed
    join must ride the bucket layout — SortMergeJoin over bucket
    scans with ZERO exchange on either input; the only exchange in
    the whole query is the final cohort rollup. At the tiny test SF
    the natural plan broadcasts the profile side instead (also
    correct — the bucketing is a strict superset: it costs nothing
    when broadcast wins)."""
    from wistia_data_pipeline_project_spark.plans import QUERIES

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERIES["events_bucketed_cohort_join"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "SelectedBucketsCount" in plan, "join inputs are not bucket scans"
    n_exchange = plan.count("Exchange") - plan.count("ReusedExchange")
    assert n_exchange == 1, (
        f"expected ONLY the rollup exchange, got {n_exchange}:\n{plan[:1500]}"
    )


def test_aqe_skew_join_splits_hot_key(spark, sf_dir):
    """events_skew_join_topvalues' runtime story (VERDICT r10
    next-round 7): under production-scaled skew thresholds AQE must
    mark the hot-key SortMergeJoin ``skew=true`` — the hot partition
    (70% of events on k = 0) splits into advisory-sized chunks with
    the matching dim rows replicated — and the result must be
    IDENTICAL to the default-threshold run (the split moves work,
    never rows). The entry's terminal TakeOrdered has no required
    distribution, so AQE applies the split without
    forceOptimizeSkewedJoin."""
    from wistia_data_pipeline_project_spark.plans import QUERIES

    tuned = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
        # without this floor (default 1MB) the upstream distinct
        # coalesces to ONE partition and the join's hot partition has
        # single-mapper provenance — unsplittable by construction,
        # since skew splitting works at map-output granularity
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    baseline = QUERIES["events_skew_join_topvalues"](spark, sf_dir).collect()
    prev = {k: spark.conf.get(k, None) for k in tuned}
    for k, v in tuned.items():
        spark.conf.set(k, v)
    try:
        df = QUERIES["events_skew_join_topvalues"](spark, sf_dir)
        split = df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "skew=true" in plan, (
        f"AQE did not split the skewed join:\n{plan[:2000]}"
    )
    assert split == baseline


def test_aqe_skew_join_splits_hot_key_shuffled_hash(spark, sf_dir):
    """Skew-under-SHJ evidence (VERDICT r11 what's-wrong 1): the
    session default prefers shuffled-hash joins
    (``preferSortMergeJoin=false``, session.py), whose build side
    cannot spill — the stated defense is AQE's skew-split, which
    supports ShuffledHashJoinExec since Spark 3.2 (SPARK-35447 family).
    This pin PROVES that defense fires: the
    ``events_skew_join_topvalues`` data shape (70% of events on the
    planted hot key) joined under an explicit ``shuffle_hash`` hint
    must plan a ShuffledHashJoin, get ``skew=true`` at runtime under
    production-scaled thresholds, and return rows identical to the
    entry's merge-hinted plan — the split moves work, never rows.
    Plan evidence committed at ``plans/r12/skew_shj_skewsplit.txt``.
    """
    from pyspark.sql import functions as F

    from wistia_data_pipeline_project_spark.plans import QUERIES
    from wistia_data_pipeline_project_spark.sources.io import load_table

    tuned = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
        # the tiny test dim would broadcast and hide both the SHJ and
        # the skew (same reason the entry needs a join hint at all)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    baseline = QUERIES["events_skew_join_topvalues"](spark, sf_dir).collect()
    prev = {k: spark.conf.get(k, None) for k in tuned}
    for k, v in tuned.items():
        spark.conf.set(k, v)
    try:
        e = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("user_id").isNotNull() & F.col("value").isNotNull())
            .select(
                F.when(F.col("user_id") % 10 < 7, F.lit(1))
                .otherwise(F.col("user_id"))
                .cast("long")
                .alias("k"),
                "event_id",
                "value",
            )
            .distinct()
        )
        c = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").cast("long").alias("k"), "c_mktsegment"
        )
        df = (
            e.join(c.hint("shuffle_hash"), "k")
            .orderBy(F.desc("value"), F.asc("event_id"))
            .limit(10)
            .select("k", "event_id", "value", "c_mktsegment")
        )
        split = df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "ShuffledHashJoin" in plan, f"not a SHJ plan:\n{plan[:2000]}"
    assert "skew=true" in plan, (
        f"AQE did not split the skewed SHUFFLED-HASH join:\n{plan[:2000]}"
    )
    assert split == baseline
