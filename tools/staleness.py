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


def _pregate_evidence() -> "tuple[int, str, set[str]] | None":
    """(round, head sha, green query names) of the LATEST pregate sweep.

    Mid-round, driver CORRECTNESS evidence necessarily lags every module
    the round touches; the pregate sweeps (tools/driver_sim.py --out)
    are the compensating head-of-round evidence (VERDICT r11 ask #2).
    Surfacing them here keeps the ledger honest in both directions: a
    STALE row whose module closure is untouched since a green pregate
    head is marked pregate-current instead of silently alarming."""
    import json
    import re

    latest = None
    # deterministic arm preference: within a round the PLAIN sweep is the
    # canonical evidence — sort it LAST so it wins over _durable (a bare
    # round-number key would leave the winner to glob order)
    for path in sorted(
        REPO.glob("PREGATE_r*.json"),
        key=lambda p: (
            int(re.sub(r"\D", "", p.stem) or 0),
            "durable" not in p.stem,
        ),
    ):
        try:
            d = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        head = d.get("head_after")
        container = d.get("results") or d.get("queries") or d
        rows = {
            k: v
            for k, v in container.items()
            if isinstance(v, dict) and "vals" in v
        }
        if not head or not rows:
            continue
        green = {
            k
            for k, v in rows.items()
            if v.get("rows") and v.get("schema") and v.get("vals")
        }
        rnd = int(re.sub(r"\D", "", path.stem) or 0)
        latest = (rnd, head, green)
    return latest


def _changed_since(head: str) -> "set[str] | None":
    """Repo-relative paths changed between ``head`` and the working tree
    (committed + staged + unstaged + untracked); None if git can't
    answer. NUL-separated output throughout: porcelain text quotes
    space-containing paths and renders renames as 'old -> new', both of
    which a whitespace split mangles into paths that never intersect a
    dep closure — silently marking a stale query pregate-current."""
    import subprocess

    def run_z(*args: str) -> "list[str] | None":
        try:
            r = subprocess.run(
                ["git", *args, "-z"],
                cwd=REPO, capture_output=True, text=True, timeout=30,
            )
        except (OSError, subprocess.SubprocessError):
            return None
        if r.returncode:
            return None
        return [p for p in r.stdout.split("\0") if p]

    # worktree (incl. staged) vs the evidence head — rename entries list
    # both sides as separate NUL fields, so old AND new paths intersect
    diff = run_z("diff", "--name-only", head)
    untracked = run_z("ls-files", "--others", "--exclude-standard")
    if diff is None or untracked is None:
        return None
    return set(diff) | set(untracked)


def main() -> None:
    for p in (str(REPO), str(REPO / "tools")):
        if p not in sys.path:
            sys.path.insert(0, p)
    import __spark_entry__ as entry_mod

    last_green = entry_mod._last_green_round()
    changed = entry_mod._module_change_round()

    pregate = _pregate_evidence()
    pregate_rnd, pregate_head, pregate_green = pregate or (0, "", set())
    since_pregate = _changed_since(pregate_head) if pregate else None
    deps = entry_mod._module_deps()

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
        # weaker-but-current pregate evidence: green in the latest sweep
        # AND the whole dep closure untouched since that sweep's head
        pg = False
        if state != "CURRENT" and since_pregate is not None:
            closure = {path} | set(deps.get(path, ()))
            pg = name in pregate_green and not (closure & since_pregate)
        rows.append((name, green, path, change, state, via, pg))

    width = max(len(r[0]) for r in rows)
    for name, green, path, change, state, via, pg in rows:
        g = "-" if green < 0 else f"r{green}"
        src = path if via == path else f"{path} (via {via})"
        tag = f"{state}+pregate-r{pregate_rnd}" if pg else state
        print(f"{name:<{width}}  green={g:<4} changed=r{change:<3} "
              f"{tag:<7} {src}")

    counts = Counter(r[4] for r in rows)
    by_module = Counter(r[5] for r in rows if r[4] == "STALE")
    n_pg = sum(1 for r in rows if r[6])
    print(f"\n{len(rows)} queries: {counts['CURRENT']} current, "
          f"{counts['STALE']} stale, {counts['NEVER']} never-proven")
    if pregate is not None and (counts["STALE"] or counts["NEVER"]):
        print(
            f"pregate evidence: {n_pg}/{counts['STALE'] + counts['NEVER']} "
            f"non-current queries are green in PREGATE_r{pregate_rnd} "
            f"(head {pregate_head or '?'}) with their dep closure "
            f"untouched since"
        )
    if by_module:
        print("stale by module: " + ", ".join(
            f"{m} x{n}" for m, n in by_module.most_common()))


if __name__ == "__main__":
    main()
