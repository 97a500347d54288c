"""Query-catalog registry.

Importing the catalog modules registers every query/oracle pair; the
dicts are then REORDERED by verification history. The driver's
correctness gate checks the first 50 ``queries()`` entries per round,
so iteration order decides which entries get a fresh
``CORRECTNESS_r{N}`` row.

The ordering is COMPUTED from the committed ``CORRECTNESS_r*.json``
files (written by the driver each round) rather than hand-kept lists:
entries sort by (round of most recent green ascending, times
driver-green ascending, catalog registration order) — staleness
first, so the cohort whose evidence is oldest rotates back through
the window as a block. Consequences:

* a brand-new entry has zero green rounds (last-green 0) -> lands at
  the FRONT of the window and gets a driver row in its first round;
* an entry that errored or hash-mismatched re-enters the front until
  it goes green;
* among equally-stale entries, the less-validated (fewer greens)
  go first; well-established recent entries rotate past the window
  edge first.

An import-time assert fails when the count of never-green entries
exceeds the 50-entry window — the signal to stop adding catalog
entries until the backlog drains, instead of silently pushing an
unverified entry past the edge.
"""

import json
from pathlib import Path

from . import catalog_docs  # noqa: F401  (registers queries)
from . import catalog_emb  # noqa: F401
from . import catalog_mm  # noqa: F401
from . import catalog_scalar  # noqa: F401
from . import catalog_tpch  # noqa: F401
from . import catalog_ts  # noqa: F401
from . import catalog_windows  # noqa: F401
from .catalog import ORACLE, QUERIES

_WINDOW = 50  # driver checks the first 50 queries() entries per round


def _green_history(root: Path | None = None) -> dict[str, list[int]]:
    """Per entry, the sorted list of rounds with a driver-green row.

    Green means a full hash match, or — for entries STILL registered
    without an oracle (rows-only checks) — a clean run that produced
    rows. A historical rows-only row stops counting the moment the
    entry gains an oracle: it has then never been hash-checked and
    must re-enter the front of the window. Files that fail to parse
    are skipped: a corrupt history degrades to "never green", which
    only moves entries toward the front of the window (safe
    direction).
    """
    if root is None:
        root = Path(__file__).resolve().parents[2]
    greens: dict[str, list[int]] = {}
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            rnd = int(f.stem.split("_r")[-1])
            rows = json.loads(f.read_text())
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            ok = row.get("hash_match") is True or (
                # rows-only entry (no oracle registered, then or now):
                # ran clean
                name not in ORACLE
                and row.get("hash_match") is None
                and row.get("err") in (None, "no_oracle")
                and row.get("spark_rows") is not None
            )
            if ok:
                greens.setdefault(name, []).append(rnd)
    # sort NUMERICALLY: the file glob sorts lexicographically, which
    # diverges from round order at r100 vs r11 or with unpadded names
    # — and g[-1] (the latest green round) is load-bearing for the
    # staleness-first rotation (review r05)
    for rounds in greens.values():
        rounds.sort()
    return greens


def _priority_order(names: list[str]) -> list[str]:
    greens = _green_history()
    insertion = {n: i for i, n in enumerate(names)}

    def key(n: str):
        g = greens.get(n, [])
        return (g[-1] if g else 0, len(g), insertion[n])

    order = sorted(names, key=key)
    # The backlog guard only means something against real driver
    # history: a checkout without any CORRECTNESS_r*.json (fresh
    # fork, packaged install) would count EVERY entry never-green and
    # fail at import — degrade to registration order instead.
    if greens:
        n_front = sum(1 for n in names if not greens.get(n))
        assert n_front <= _WINDOW, (
            f"{n_front} never-green entries exceed the {_WINDOW}-entry "
            "correctness window — stop adding catalog entries until the "
            "driver backlog drains"
        )
    return order


_order = _priority_order(list(QUERIES))
_q = {n: QUERIES[n] for n in _order}
_o = {n: ORACLE[n] for n in _order if n in ORACLE}
QUERIES.clear()
QUERIES.update(_q)
ORACLE.clear()
ORACLE.update(_o)

__all__ = ["QUERIES", "ORACLE"]
