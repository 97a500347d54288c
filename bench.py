"""Benchmark harness (driver contract).

Runs every catalog query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "catalog_total_sec", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": s, ...}, "sf": 0.1}

Per-query time = logical-plan build + full execution into the noop
sink (computes every output column and row, no driver transfer — a
``collect`` would bill Python deserialization of 100k-row results to
the engine). A warmup query runs first so JVM/codegen startup isn't
billed to the first catalog entry.

Each query is executed twice and the MIN is reported: the host VM
shows multi-x run-to-run interference spikes on individual queries
(same plan, same data — measured 4 s vs 36 s across back-to-back
runs), and min-of-2 is the standard estimator of the query's true
cost under spiky external noise. Both executions are full runs of
the complete plan; nothing is cached between them beyond the
JVM/codegen warmth the first execution naturally leaves.

Knobs (env): ``SPARK_GRAFT_BENCH_REPS`` (default 2) executions per
query; ``SPARK_GRAFT_BENCH_STAT`` = ``min`` (default) or ``median``.
The driver run keeps the fast min-of-2; perf investigations use
``REPS=5 STAT=median`` to separate cold-compile/interference drift
from real regressions (the VERDICT r02 ±15% protocol).

Usage: ``python bench.py [query ...]`` (no args = all queries).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wistia_data_pipeline_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    names = sys.argv[1:] or list(qs)

    spark = get_spark(app_name="wistia-pipeline-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> None:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # warmup: JVM + parquet footer reads + codegen paths, not billed
    run("events_high_water_mark")
    # ... and the Python-worker pool + Arrow serde path: spawning the
    # pool is one-time session infra (~2-5 s PER CONCURRENT WORKER
    # SLOT) that would otherwise be billed to whichever pandas-path
    # query runs first (a 1-partition touch warms exactly one slot and
    # leaves the other 31 cold — measured as ~8 s billed to the first
    # mapInPandas catalog entry). 2×slots single-row partitions with
    # NO shuffle: every slot must run at least one task, and each task
    # forks its worker — deterministic full-pool coverage (a hashed
    # groupBy leaves a slot cold with probability ~e^-groups/slot).
    n_slots = spark.sparkContext.defaultParallelism

    def _identity(batches):
        yield from batches

    (
        spark.range(0, n_slots * 2, 1, n_slots * 2)
        .mapInPandas(_identity, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    stat = os.environ.get("SPARK_GRAFT_BENCH_STAT", "min")
    import statistics

    timings: dict[str, float] = {}
    for name in names:
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run(name)
            samples.append(time.perf_counter() - t0)
        est = statistics.median(samples) if stat == "median" else min(samples)
        timings[name] = round(est, 3)

    # Cold-outlier protocol (VERDICT r08 item 8): the host VM spikes
    # individual queries multi-x (a 21 s emb_ndcg against a 2.6 s
    # warm cost was the r09 map's worst phantom). An entry whose
    # reading exceeds 3x its OWN median across the committed
    # BENCH_full_r*.json history is re-executed once at END of run —
    # by then the ambient spike has usually passed — and the minimum
    # is reported, with BOTH readings stamped under "reruns" so the
    # record shows the outlier was measured, not discarded.
    reruns: dict[str, dict[str, float]] = {}
    try:
        from pathlib import Path as _HP

        hist: dict[str, list[float]] = {}
        for f in sorted(_HP(__file__).resolve().parent.glob("BENCH_full_r*.json")):
            try:
                for q, v in json.loads(f.read_text()).get("queries", {}).items():
                    if isinstance(v, (int, float)):
                        hist.setdefault(q, []).append(float(v))
            except (OSError, json.JSONDecodeError, AttributeError):
                continue
        flagged = [
            n
            for n in names
            if n in hist and timings[n] > 3 * statistics.median(hist[n])
        ]
    except OSError:
        flagged = []
    for name in flagged:
        t0 = time.perf_counter()
        run(name)
        again = round(time.perf_counter() - t0, 3)
        reruns[name] = {"cold": timings[name], "rerun": again}
        timings[name] = min(timings[name], again)

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "catalog_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if reruns:
        payload["reruns"] = reruns
    # self-describing provenance (VERDICT r07 item 8): "round" is the
    # BUILD round this bench ran in (1 + latest driver artifact —
    # the driver writes its round-N artifacts at END of round N), so
    # a BENCH_full_r{N+1} file written during round N's close no
    # longer needs the bench.py naming note to interpret.
    try:
        import re
        from pathlib import Path as _P

        _rounds = [
            int(m.group(1))
            for f in _P(__file__).resolve().parent.glob("*_r*.json")
            if (m := re.fullmatch(r"(?:BENCH|CORRECTNESS)_r(\d+)", f.stem))
        ]
        payload["round"] = max(_rounds, default=0) + 1
        payload["phase"] = "in-round build" if sys.argv[1:] else "full catalog"
    except OSError:
        pass
    print(json.dumps(payload))
    # The driver records only the stdout tail (2000 chars), which
    # truncates the per-query map past ~150 entries (VERDICT r06 item
    # 8) — persist the FULL map to repo files so round-over-round
    # diffs don't depend on the tail window. Round number = 1 + the
    # latest driver-written artifact round (the driver writes
    # BENCH_r{N}/CORRECTNESS_r{N} at END of round N, so during round
    # N+1 the max present is N). Best-effort: never fail the bench
    # over bookkeeping.
    if not sys.argv[1:]:  # full-catalog runs only, not focused ones
        try:
            import re
            from pathlib import Path

            root = Path(__file__).resolve().parent
            rounds = [
                int(m.group(1))
                for f in root.glob("*_r*.json")
                if (m := re.fullmatch(r"(?:BENCH|CORRECTNESS)_r(\d+)", f.stem))
            ]
            n = max(rounds, default=0) + 1
            for name in (f"BENCH_full_r{n:02d}.json", "BENCH_full_latest.json"):
                (root / name).write_text(json.dumps(payload, indent=1) + "\n")
        except OSError:
            pass


if __name__ == "__main__":
    main()
