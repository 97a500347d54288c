"""Compare two bench.py JSON outputs and flag per-query regressions.

The repo's perf protocol (BASELINE.md / VERDICT r02): a query is
"drifted" when it is >15% slower than its reference time AND the
delta is >0.5 s (sub-second entries jitter by multiples under host
interference without meaning anything). Usage:

    python tools/bench_diff.py BENCH_old.json BENCH_new.json [--band 0.15]

Exit code 1 when any regression exceeds the band — usable as a CI
gate between rounds.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    """Accepts bench.py's own JSON line ({"queries": {...}}), the
    driver's BENCH_r*.json wrapper ({"parsed": {...}} — or, when the
    driver truncated the stdout tail, best-effort regex recovery of
    the '"name": sec' pairs that survived truncation)."""
    import re

    with open(path) as f:
        doc = json.load(f)
    if isinstance(doc.get("queries"), dict):
        return doc["queries"]
    parsed = doc.get("parsed")
    if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
        return parsed["queries"]
    tail = doc.get("tail") or ""
    pairs = re.findall(r'"([a-z0-9_]+)":\s*([0-9]+\.[0-9]+)', tail)
    return {
        k: float(v)
        for k, v in pairs
        if k not in ("value", "sf")
    }


def diff(
    old: dict[str, float], new: dict[str, float], band: float = 0.15
) -> tuple[list[tuple[str, float, float]], list[str], list[str]]:
    """Returns (regressions, added, removed); regressions are
    (name, old_sec, new_sec) sorted by absolute slowdown."""
    common = sorted(set(old) & set(new))
    regs = [
        (n, old[n], new[n])
        for n in common
        if new[n] > old[n] * (1 + band) and new[n] - old[n] > 0.5
    ]
    regs.sort(key=lambda r: r[2] - r[1], reverse=True)
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    return regs, added, removed


def main() -> int:
    band = 0.15
    args: list[str] = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--band" or a.startswith("--band="):
            try:
                if "=" in a:
                    band = float(a.split("=", 1)[1])
                elif i + 1 < len(argv):  # space-separated form
                    band = float(argv[i + 1])
                    i += 1
                else:
                    print(__doc__)
                    return 2
            except ValueError:  # --band= / --band abc: usage, not a crash
                print(__doc__)
                return 2
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        print(__doc__)
        return 2
    old, new = load(args[0]), load(args[1])
    regs, added, removed = diff(old, new, band)
    common = set(old) & set(new)
    t_old = sum(old[n] for n in common)
    t_new = sum(new[n] for n in common)
    print(
        f"common {len(common)} entries: {t_old:.1f}s -> {t_new:.1f}s "
        f"({t_new / t_old:.2f}x)" if common else "no common entries"
    )
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    for n, o, w in regs:
        print(f"REGRESSION {n}: {o:.2f}s -> {w:.2f}s ({w / o:.2f}x)")
    return 1 if regs else 0


if __name__ == "__main__":
    sys.exit(main())
