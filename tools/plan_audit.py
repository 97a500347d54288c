"""Physical-plan audit: for each catalog query, report the plan
properties that matter at 100 TB — pushed filters, pruned read
schemas, join strategies, exchange count, whole-stage-codegen
coverage, and Python-eval operators.

Usage: ``python tools/plan_audit.py [query ...]`` (default: all).
Prints one line per query plus a WARN for each smell:
- scan with no ReadSchema pruning when the query projects few columns
- SortMergeJoin against a side small enough to broadcast
- row-at-a-time BatchEvalPython (pandas/Arrow paths are fine)
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wistia_data_pipeline_project_spark.session import get_spark  # noqa: E402


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def counters(plan: str) -> dict:
    """The plan facts both renderers report — ONE parse per plan."""
    # count operator NODES from the tree section ("(3) Exchange"), not
    # raw substring hits — the details section repeats every node name
    nodes = re.findall(r"\(\d+\) ([A-Za-z]+)", plan)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    warns = []
    if "BatchEvalPython" in plan:
        warns.append("row-at-a-time Python UDF in plan")
    if "CartesianProduct" in plan:
        warns.append("cartesian product")
    return {
        "n_exchange": sum(1 for n in nodes if n == "Exchange"),
        "n_reused": sum(1 for n in nodes if n == "ReusedExchange"),
        "joins": sorted({n for n in nodes if "Join" in n}),
        "n_codegen": len(set(re.findall(r"codegen id : (\d+)", plan))),
        "n_pushed": sum(1 for p in pushed if p.strip()),
        "n_scans": len(pushed),
        "warns": warns,
    }


def audit(name: str, plan: str) -> tuple[str, list[str]]:
    c = counters(plan)
    summary = (
        f"{name}: exchanges={c['n_exchange']} (reused={c['n_reused']}) "
        f"joins={c['joins'] or '-'} codegen_stages={c['n_codegen']} "
        f"scans_with_pushdown={c['n_pushed']}/{c['n_scans']}"
    )
    return summary, c["warns"]


# Curated per-entry plan rationale, rendered into PLANS.md's notes
# column next to any automated warns — living here (not hand-edited
# into PLANS.md) so `--markdown` regenerates the WHOLE table and the
# annotations survive. No '|' characters (markdown cell).
NOTES = {
    "mm_audio_vad_segments": "decode emits n_frames energy rows per clip; one asset shuffle serves lag + island windows + aggregate",
    "events_activity_bitmap": "bit_or combines map-side - the user shuffle carries 8-byte masks; anchor is a 1-row broadcast",
    "events_rolling_hll_7d": "sliding merge shuffles |days|x7 sketch blobs; exact twin exists only to gate the estimate",
    "emb_ivf_nprobe_curve": "one shared cell assignment; each arm adds a probe-filtered top-k scan; 3-arm union",
    "docs_dedup_threshold_curve": "tenth consumer of the shared jaccard pair checkpoint; explode(x3) + grouped count",
    "docs_pii_redact": "pure projection - chained regexp_replace, no shuffle before output",
    "events_holt_backtest": "same shape as events_holt_linear: daily pre-agg, one key shuffle, partition-scan fold",
    "events_holt_linear": "partition-scan fold (fold_scan pattern): repartition-by-key + sortWithinPartitions + one mapInPandas; daily pre-agg collapses map-side, <=24 rows per key reach Python",
    "events_session_concurrency": "two-level sweep: (day,hour) bucket windows + tiny per-day carry prefix - no global ordered window; instant stream exploded once, sessionization exchange reused at runtime",
    "docs_curriculum_order": "stage assignment and h60 hashing are codegen projections; only shuffle is the 4-partition per-stage rank window",
    "docs_containment": "hot-shingle df cap adds a freq-agg + broadcast-anti subtree per branch; identical exchanges dedupe at runtime",
    "emb_knn_join": "ranks the shared scored-pair checkpoint (_knn_pairs_cached), top-k pruned per (vec_id, neighbor_label) at build time (r09 - stored list O(N*labels*k)); pair-join broadcast pinned inside the builder (small-N regime; see SCALE.md); assignment goes two-level past 64 cells (audited plan is the driver-SF flat path)",
    "q2_min_cost_supplier": "SMJ is the min-cost join-back on pre-aggregated supply rows (AQE broadcasts at runtime)",
    "events_skew_join_topvalues": "planted hot key (70% on k=1); merge hint keeps the SMJ so AQE splits the skewed partition at runtime (skew=true pinned by test); distinct sits BELOW the join shuffle (an agg between shuffle and join makes AQE decline) and terminal TakeOrdered has no distribution requirement",
    "q11_important_parts": "BNLJ = the 1-row scalar-threshold broadcast",
    "q21_waiting_suppliers": "one shuffle computes all three per-order EXISTS facts",
    "orders_market_basket": "order-local pair expansion, TakeOrdered top-25",
    "emb_pq_codes": "zero pre-output shuffles; staged projections keep codegen bounded",
    "emb_pq_adc_topk": "ADC lookup-table scan + TakeOrdered",
    "docs_dedup_keep_best": "window runs on near-dup subset only; pair list from the shared checkpoint",
    "docs_substring_dedup": "windows shuffle as md5, no pair expansion",
    "docs_unigram_nll": "BNLJ = the 1-row total broadcast",
    "docs_ngram_jaccard": "serves the shared scored-pair checkpoint (_jaccard_pairs_cached); steady-state plan reads the materialized list",
    "docs_simhash_near_dup": "md5_64 hash — pipeline fully SQL-oracled",
    "docs_simhash_quality": "exact side reads the shared pair checkpoint; simhash side computed fresh",
    "docs_editdist_verify": "pair list from the shared checkpoint; Levenshtein on 64-char prefixes only",
    "docs_leakage_safe_split": "CC over the shared pair checkpoint; draw on the cluster id",
    "docs_triangle_stats": "degree-oriented wedge join over the shared pair checkpoint",
    "docs_pagerank": "6 checkpointed rounds over the shared pair checkpoint; audited plan is the final round's output",
    "docs_winnowing": "sliding-min window + (doc,fp) distinct agg",
    "docs_zipf_fit": "global rank over aggregated vocab (user-deciles caveat); docs_zipf_fit_scalable is the bit-identical decomposed-rank swap-in",
    "docs_zipf_fit_scalable": "rank decomposed: per-cnt offsets (window over DISTINCT counts only) + row_number partitioned by cnt; offs broadcast back",
    "emb_mmr_rerank_exact": "BNLJ = the 2-row query-vector broadcast (non-equi self-exclusion); top-16 per query via two-phase WindowGroupLimit; candidate pair join broadcast (<=256 rows per query); greedy is applyInPandas over pre-scored JVM-fold floats - zero vector math in Python",
    "emb_semdedup": "SMJ = pair join on centroid_id; flattened table localCheckpoint'ed as codegen barrier (allowlisted in the no-collect gate)",
    "emb_ivf_recall": "two top-k heaps + 10x10 overlap join",
    "emb_matryoshka_recall": "coarse pass projects 16/64 dims",
    "orders_rfm_scores": "three global ntiles share one single-partition sort (user-deciles caveat); orders_rfm_banded is the no-sort swap-in",
    "orders_rfm_banded": "12 disc-quantile cut points in ONE aggregate pass broadcast back; range assign by comparison - no global sort (approx_percentile swap documented for distinct-heavy 1e8+ domains, SCALE.md r07)",
    "events_user_deciles_banded": "9 disc-quantile boundaries broadcast back to the cached user table; no single-partition window (same approx swap note)",
    "events_play_conversion_attribution": "calls streaming_play_conversion_join on batch inputs; compound (visitor, media) equi-key SMJ with the 4h range predicate inside - no cartesian",
    "nation_yoy_revenue": "lag window over (nation,year) aggregate",
    "docs_dsir_weights": "256-row bucket LM broadcast; BNLJ = 1-row totals",
    "events_hll_rollup": "daily sketches merge map-side; exact branch gates the estimate",
    "emb_hard_negatives": "cross-label filter + rank over the shared pair checkpoint; bit-identical to the pushed-down predicate",
    "docs_incremental_dedup": "anti/semi joins on 16-byte fingerprints; batch-proportional work",
    "emb_centroid_classify": "640-row centroid-dim broadcast; quantized-decimal means keep the argmax hash-exact",
    "orders_cohort_ltv": "(cohort,age) grid window is tiny; one orders shuffle",
    "docs_bigram_nll": "bigram stats broadcast; BNLJ = 1-row vocab size",
    "events_session_paths": "user_id exchange shared by windows + rollup; top-25 TakeOrdered",
    "emb_pq_recall": "codes-only ADC scan + exact-L2 heap + 10x10 overlap",
    "events_dau_mau": "partial-distinct combines at both grains",
    "orders_delivery_percentiles": "one fact shuffle; 5 sorted priority groups",
    "docs_quality_funnel": "four nested conditional sums in ONE aggregate; 4-row stack unpivot",
    "events_attribution": "packed (us*10+code) running MAX carries touch time+channel in one BIGINT",
    "events_anomaly_zscore": "daily pre-agg is the only big shuffle; window over types-by-days rows",
    "orders_abc_pareto": "decimal cum-share window post-agg (1 row/customer); boundaries compared divisionless",
    "emb_pair_sim_hist": "3-row stride BNLJ; integer-key equi-join, unrolled dot kernel, ~60-group rollup",
    "events_linear_attribution": "RANGE-frame conditional counts share one user_id exchange; no join",
    "events_time_decay_attribution": "same single key exchange; decimal window sums with summation-headroom overflow gate",
    "docs_bpe_merges": "corpus collapses once to the vocab table; rounds are driver-coordinated by design",
    "docs_bpe_encode": "merges broadcast as a rank dict; Arrow-batched scan, no pre-count shuffle",
    "mm_image_near_dup": "aHash table localCheckpoint'ed (16 B/image) feeds both sides of the pigeonhole block join; payloads never shuffle",
    "events_quality_contract": "per-row expectations fold into ONE agg pass; referential check is a broadcast anti-join; only scalar metrics move",
    "events_stateful_watch_time": "partition-scan fold: ONE key-hashed exchange (dup resolution rides it as sort tie-breaks + scan drop), sortWithinPartitions, mapInPandas with cross-batch carry",
    "events_cms_user_counts": "events collapse map-side into per-day 4x1024 counter rows; merge + probe shuffle counters only, sketch broadcast into the probe join; top-20 via TakeOrdered",
    "customers_bloom_prune": "orders collapse map-side into per-year <=1KB bit-lane rows; OR-merge + probe shuffle lanes only, filter broadcast into the probe join; exact semi-join runs beside it so the hashed row shows the pruning rate",
    "docs_bm25_topk": "tfidf plan shape: cached narrow counts; BNLJ = 1-row stats broadcast; top-15 TakeOrdered",
    "docs_perplexity_buckets": "cached per-doc scores feed both the disc-bounds aggregate and the assignment; BNLJ = 1-row bounds broadcast",
    "events_time_weighted_avg": "one user_id exchange shared by the lead window and the map-combinable decimal agg",
    "orders_open_backlog": "sweep-line deltas replace the calendar range join; the unpartitioned running-sum window reads DISTINCT DAYS only (bounded by the day domain)",
    "emb_dim_stats": "posexplode fan-out collapses map-side to 64 dim rows before one tiny shuffle; no join",
    "events_rolling_actives_7d": "7-day cover explode of the DISTINCT user-day table (not raw events); partial-distinct combines on (user, day7); a window can't express a sliding DISTINCT",
    "docs_novelty": "shingles shuffle as md5 keys, payloads projected away; first-owner agg map-combines and the join-back reuses the fp key",
    "events_counter_delta": "one user_id exchange shared by the lag window and the combinable decimal agg (the watch-time fold shape)",
    "events_state_durations": "lead-1 window on the user exchange; (user,state) agg map-combines to n_users x n_states rows",
    "events_ohlc_daily": "ONE combinable (type,day) aggregate - min_by/max_by partials, no window, no sort",
    "events_m4_downsample": "per-key span table broadcast back; integer-div bucketing; output bounded 4 x buckets x keys",
    "events_interp_daily": "dailies collapse map-side before the spine explode + LOCF/NOCB windows; never a window over raw events",
    "docs_source_caps": "row_number cutoff per source partition; two-phase approx-threshold swap documented for mega-domain skew",
    "events_heartbeat_uptime": "uniform-width interval union telescopes to a lead-1 window + combinable agg; no interval join",
    "docs_kcore_2": "iterative peeling over the shared pair checkpoint: per round one degree agg + two node-keyed semi-joins; audited at fixpoint steady state",
    "mm_image_dedup_cascade": "exact-hash collapse to representatives BEFORE the pigeonhole join; bucket population bounded by DISTINCT codes - viral-duplicate immune (sf10 finding)",
    "events_trend_robust": "O(days^2) pair join over the DAILY pre-agg (bounded by day domain, not events); disc-median via rank pick, never interpolating percentile",
    "events_cusum_changepoint": "sequential CUSUM recursion replaced by its exact two-window closed form (cumsum - running-min) over the daily pre-agg; integer-scaled until one final division",
    "events_psi_drift": "bin counts collapse map-side to <=6 rows per (type,side); PSI terms DECIMAL(18,6)-quantized (libm ln ulp absorbed)",
    "emb_ivfpq_recall": "id-set overlap of the composed index vs the exact L2 heap; costs its two searches",
    "emb_ivfpq_adc_topk": "FAISS-IVFPQ shape: 2-row probe broadcast prunes cells; codes-vs-candidates semi-join is the one SMJ (AQE broadcasts it at driver SFs; at scale candidates are N*probe/k rows - SMJ is correct); both approximations declared + SQL-replayed",
    "emb_near_dup_cascade": "bit-identical vector collapse (map-combinable agg on the vector key) to representatives BEFORE the IVF-blocked verify; rep pair volume bounded by DISTINCT vectors - viral-copy immune (the image-cascade pattern)",
    "events_user_deciles_approx": "mergeable GK sketch bounds combiner state regardless of DISTINCT totals (the percentile_disc merge-map killer); 1-row bounds broadcast + one combinable gate agg",
    "emb_ivf_incremental": "O(batch) index maintenance: batch-only broadcast assignment + explode collapses map-side to cells x dim moment rows; existing-corpus state read from the one-slot checkpoint (never re-scanned); drift cosine is centroid-table-sized",
    "events_dpp_weekend_scan": "DPP demo: dynamicpruningexpression in the partitioned fact scan's PartitionFilters (CI-pinned, test_dpp_scan_prunes_partitions); dim broadcast doubles as the runtime filter",
    "events_bucketed_cohort_join": "co-located bucketed join: both sides bucketBy(8, user_id) - with broadcast off the SMJ needs ZERO join-side exchange (CI-pinned, test_bucketed_join_is_shuffle_free); at driver SF the profile side broadcasts instead (bucketing costs nothing when broadcast wins)",
}


def audit_row(name: str, plan: str) -> str:
    """One PLANS.md markdown table row (same counters as audit())."""
    c = counters(plan)
    notes = c["warns"] + ([NOTES[name]] if name in NOTES else [])
    return (
        f"| {name} | {c['n_exchange']} ({c['n_reused']} reused) "
        f"| {', '.join(c['joins']) or '—'} | {c['n_codegen']} "
        f"| {c['n_pushed']}/{c['n_scans']} | {'; '.join(notes) or '—'} |"
    )


def main() -> None:
    import __spark_entry__ as m

    argv = sys.argv[1:]
    markdown = "--markdown" in argv
    pins_out = None
    if "--pins" in argv:
        i = argv.index("--pins")
        if i + 1 >= len(argv):
            raise SystemExit("usage: plan_audit.py [--markdown | --pins OUT] [query ...]")
        pins_out = argv[i + 1]
        del argv[i : i + 2]
    argv = [a for a in argv if a != "--markdown"]

    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    qs = m.queries()
    # markdown mode audits in SORTED order: the catalog's rotation
    # order changes per round (plans/__init__.py), and the shared
    # checkpoint consumers' plans depend on which entry materialized
    # the checkpoint first — sorted order keeps the generated table
    # reproducible run-to-run
    names = argv or (sorted(qs) if (markdown or pins_out) else list(qs))
    pins: dict[str, list] = {}
    for name in names:
        try:
            plan = formatted_plan(qs[name](spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: EXPLAIN FAILED: {exc}")
            continue
        if pins_out:
            c = counters(plan)
            pins[name] = [c["n_exchange"], c["n_reused"], c["joins"]]
            continue
        if markdown:
            print(audit_row(name, plan))
            continue
        summary, warns = audit(name, plan)
        print(summary)
        for w in warns:
            print(f"  WARN {w}")
    if pins_out:
        import json

        with open(pins_out, "w") as fh:
            json.dump({"sf_dir": sf_dir, "pins": pins}, fh, indent=1, sort_keys=True)
        print(f"wrote {pins_out} ({len(pins)} entries at {sf_dir})")


if __name__ == "__main__":
    main()
