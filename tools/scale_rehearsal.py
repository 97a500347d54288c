"""Scale rehearsal: run the dedup/similarity family at two scale
factors and report per-entry wall-clock ratios + the scaling exponent
(log-time / log-data) — the cheapest way to catch a quadratic regime
or an AQE/join-strategy flip before the driver does (SCALE.md).

Usage:
    python tools/make_sf1.py                      # build /tmp/sf1
    python tools/scale_rehearsal.py [small_dir] [big_dir] [entry ...]

Prints one line per entry: small_s, big_s, ratio, exponent (data is
10x, so exponent = log10(ratio); linear ~1, quadratic ~2).
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

# docs_ngram_jaccard runs FIRST deliberately: it materializes the
# shared scored-pair checkpoint (_jaccard_pairs_cached) at each
# scale, so its row measures the pair-join cost and the later graph
# consumers (keep_best, leakage, triangles, pagerank) measure their
# own downstream stage — the session steady state a production
# pipeline would see.
DEFAULT_ENTRIES = [
    "docs_ngram_jaccard",
    "docs_minhash_near_dup",
    "docs_prefix_jaccard",
    "docs_dedup_keep_best",
    "docs_leakage_safe_split",
    "docs_triangle_stats",
    "docs_pagerank",
    "emb_semdedup",
    # emb_knn_join runs FIRST of the two kNN-graph entries: it
    # materializes the shared scored-pair checkpoint
    # (_knn_pairs_cached) at each scale, so its row measures the
    # cell-blocked pair build and emb_hard_negatives measures the
    # cross-label rank over the materialized list
    "emb_knn_join",
    "emb_hard_negatives",
    # VERDICT r04 item 4: decimal window sums at 10x attribution keys
    # (make_sf1 events offset user_id per copy) + sketch algebra at
    # 10x token volume into the same group count
    "events_linear_attribution",
    "events_time_decay_attribution",
    "docs_vocab_overlap",
    # round-5 promotions: the pigeonhole aHash pair join, the
    # one-agg-pass expectation contract, and the partition-scan
    # stateful fold (Arrow transfer scales with the events table)
    "mm_image_near_dup",
    "events_quality_contract",
    "events_stateful_watch_time",
    # sketch tables: events/orders collapse to <=4096 counter rows /
    # <=1024 bit lanes at the map-side combiner, so 10x data should
    # be scan-bound (bloom probes 10x customers too — still lanes)
    "events_cms_user_counts",
    "customers_bloom_prune",
    # round-6 additions: BM25 is scan+TakeOrdered (expect ~1.0 slope
    # on the corpus), perplexity buckets re-scan the cached scores,
    # the time-weighted avg is the watch-time fold's shuffle shape at
    # 10x users, and the backlog's running-sum input is the DAY
    # domain (should be flat as intervals grow 10x within the span)
    "docs_bm25_topk",
    "docs_perplexity_buckets",
    "events_time_weighted_avg",
    "orders_open_backlog",
    "emb_dim_stats",
    "events_rolling_actives_7d",
    "docs_novelty",
]


def main() -> int:
    args = sys.argv[1:]
    small = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    big = args[1] if len(args) > 1 else "/tmp/sf1"
    names = args[2:] or DEFAULT_ENTRIES

    import __spark_entry__ as m

    import os as _os

    # SPARK_GRAFT_REHEARSAL_MEM sizes the single local-mode heap
    # (default 16g). Since round 7 the data-scale checkpoints store
    # SERIALIZED disk-evictable bytes (ckpt.spill_checkpoint), so the
    # whole catalog rehearses at sf3 inside the default 16g — the
    # round-6 48g requirement is retired (SCALE.md r07). The knob
    # remains for experiments; SPARK_GRAFT_CKPT_LEVEL=DISK_ONLY
    # additionally forces checkpoints fully off-heap.
    # SPARK_GRAFT_REHEARSAL_PARTITIONS: a cluster scales shuffle
    # partitions with data; the fixed-32 local default starts
    # spilling around the 100x decade (SCALE.md r07 sf10 sweep) —
    # the knob separates partition pressure from algorithmic growth
    # the ENGINE session (round 9): rehearsals measure get_spark's
    # behavior — including the partitions-scale-with-data rule
    # (initialPartitionNum + AQE coalesce) — not a hand-built config.
    # The env knobs still override for controlled experiments.
    from wistia_data_pipeline_project_spark.session import get_spark

    spark = get_spark(
        app_name="scale-rehearsal",
        cpus=32,
        shuffle_partitions=int(
            _os.environ.get("SPARK_GRAFT_REHEARSAL_PARTITIONS", "32")
        ),
        driver_memory=_os.environ.get("SPARK_GRAFT_REHEARSAL_MEM", "16g"),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = m.queries()

    # SPARK_GRAFT_REHEARSAL_REPS > 1 reports the warm MEDIAN of that
    # many executions per (entry, scale) — the protocol behind the
    # medians recorded in SCALE.md (single-run mode bills cold
    # JVM/codegen to whichever side runs first; the graph table
    # documents that inversion). The q1 calibrator line prints first
    # either way so ambient noise is on the record.
    import os
    import statistics

    reps = max(1, int(os.environ.get("SPARK_GRAFT_REHEARSAL_REPS", "1")))

    def run(name: str, sf_dir: str) -> tuple[float, int]:
        times, n = [], 0
        for _ in range(reps):
            t0 = time.monotonic()
            n = qs[name](spark, sf_dir).count()
            times.append(time.monotonic() - t0)
        return statistics.median(times), n

    # calibration is best-effort: a docs/embeddings-only small dir has
    # no lineitem table for q1 — skip the line rather than abort the
    # whole rehearsal (review r05)
    try:
        cal, _ = run("q1_pricing_summary", small)
        print(f"q1 calibrator ({small}, reps={reps}): {cal:.2f} s "
              "(~0.64 s quiet-host true cost at sf0.1)")
    except Exception as exc:
        print(f"q1 calibrator skipped ({type(exc).__name__})")
    print(f"{'entry':28} {'small_s':>8} {'big_s':>8} {'ratio':>7} "
          f"{'exp':>5}  rows small->big")
    for name in names:
        try:
            ts, ns = run(name, small)
            tb, nb = run(name, big)
            ratio = tb / ts if ts > 0 else float("inf")
            exp = math.log10(ratio) if ratio > 0 else float("nan")
            print(f"{name:28} {ts:8.1f} {tb:8.1f} {ratio:7.2f} "
                  f"{exp:5.2f}  {ns}->{nb}")
        except Exception as exc:  # keep going; rehearsal is a survey
            print(f"{name:28} ERROR: {exc}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
