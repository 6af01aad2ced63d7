#!/usr/bin/env python
"""Evidence-currency ledger: which queries' driver-oracle proof is stale.

A query's green row in CORRECTNESS_rN.json certifies the code snapshot at
the end of build round N; if the module defining the query changed in a
LATER round, that evidence describes code that no longer exists. The
rotation in ``__spark_entry__`` already re-proves the stalest queries
first under the driver's ~50-slot budget — this tool just prints the
ledger so the state is inspectable without recomputing it by hand:

    PYTHONPATH=. python tools/staleness.py

One line per query: last-green round, the defining module, its
last-change round, and the verdict (CURRENT / STALE / NEVER). Exit code 0
always — staleness is a budgeting signal, not an error.
"""

from __future__ import annotations

import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    for p in (str(REPO), str(REPO / "tools")):
        if p not in sys.path:
            sys.path.insert(0, p)
    import __spark_entry__ as entry_mod

    last_green = entry_mod._last_green_round()
    changed = entry_mod._module_change_round()

    rows = []
    for name, fn in entry_mod.queries().items():
        green = last_green.get(name, -1)
        path = entry_mod._query_module_file(fn) or "?"
        # dep-aware (VERDICT r11 ask #3): currency is judged against the
        # latest change across the defining module AND its transitive
        # intra-package imports — a dedup.py edit stales the refine.py
        # span queries that execute through dedup's memo artifacts.
        change, via = entry_mod._effective_change_round(path, changed)
        if green < 0:
            state = "NEVER"
        elif change > green:
            state = "STALE"
        else:
            state = "CURRENT"
        rows.append((name, green, path, change, state, via))

    width = max(len(r[0]) for r in rows)
    for name, green, path, change, state, via in rows:
        g = "-" if green < 0 else f"r{green}"
        src = path if via == path else f"{path} (via {via})"
        print(f"{name:<{width}}  green={g:<4} changed=r{change:<3} "
              f"{state:<7} {src}")

    counts = Counter(r[4] for r in rows)
    by_module = Counter(r[5] for r in rows if r[4] == "STALE")
    print(f"\n{len(rows)} queries: {counts['CURRENT']} current, "
          f"{counts['STALE']} stale, {counts['NEVER']} never-proven")
    if by_module:
        print("stale by module: " + ", ".join(
            f"{m} x{n}" for m, n in by_module.most_common()))


if __name__ == "__main__":
    main()
