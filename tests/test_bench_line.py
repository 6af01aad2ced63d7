"""The bench stdout line's shed invariants, unit-tested (no Spark run).

The driver keeps only a ~2000-char stdout tail and parses the last line;
``bench._compact_stdout_line`` compacts the headline payload to fit.
These pins cover the three shed layers and the ADVICE r13 pair rule:
``queries`` and ``queries_inline`` must appear together or not at all.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from bench import _compact_stdout_line  # noqa: E402


def _headline(n_queries: int, extra: dict | None = None) -> tuple[dict, dict]:
    timings = {f"query_{i:03d}": 0.5 + i for i in range(n_queries)}
    headline = {
        "metric": "bench_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": 0.1,
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "queries_steady": dict(timings),  # always moves to detail
        "queries_fills": dict(timings),
        "note": "long attribution " * 50,
        **(extra or {}),
    }
    return headline, timings


def test_small_payload_passes_through_with_detail_pointer():
    headline, timings = _headline(5)
    d = json.loads(_compact_stdout_line(headline, timings))
    assert d["queries"] == headline["queries"]
    assert "queries_steady" not in d and "queries_fills" not in d
    assert d["note"].endswith("BENCH_DETAIL.json")


def test_over_budget_keeps_slowest_queries_and_counts_them():
    headline, timings = _headline(200)
    line = _compact_stdout_line(headline, timings)
    assert len(line) <= 1900
    d = json.loads(line)
    assert d["queries_inline"] == len(d["queries"]) > 1
    assert d["queries_full_map"] == "BENCH_DETAIL.json"
    # the kept entries are the SLOWEST ones
    kept_min = min(d["queries"].values())
    dropped = set(timings) - set(d["queries"])
    assert all(timings[k] <= kept_min for k in dropped)


def test_trim_tries_the_single_query_line_before_shedding():
    """r14 review fix: at a budget that fits exactly ONE inline query,
    the trim loop must emit the 1-query line instead of exiting on the
    over-budget 2-query line and letting the last-resort shed drop the
    map entirely."""
    headline, timings = _headline(200)
    # ADVICE r14: compute the budget from the payload itself instead of
    # scanning 180-400 for one that happens to work — build the exact
    # 1-query line the trim loop would emit and use its length as the
    # budget; the 2-query line is strictly longer, so the loop must pop
    # down to one entry and fit rather than exit over-budget at two.
    full = json.loads(_compact_stdout_line(headline, timings, budget=10**6))
    hl1 = dict(full)
    hl1["queries"] = {"query_199": round(timings["query_199"], 3)}
    hl1["queries_inline"] = 1
    hl1["queries_full_map"] = "BENCH_DETAIL.json"
    budget = len(json.dumps(hl1, separators=(",", ":")))
    d = json.loads(_compact_stdout_line(headline, timings, budget=budget))
    assert d["queries_inline"] == 1
    assert list(d["queries"]) == ["query_199"]  # the slowest


def test_shed_refills_inline_queries_after_dropping_families_band():
    """ADVICE r14: the budget a families_band shed frees must re-grow the
    inline query map — the emitted map has to match what a payload that
    never carried families_band gets at the same budget, not the 1-entry
    map the trim computed against the larger payload."""
    big_fixed = {"families_band": {f"fam_{i}": [1.0, 2.0] for i in range(60)}}
    headline, timings = _headline(200, extra=big_fixed)
    shed = json.loads(_compact_stdout_line(headline, timings, budget=600))
    assert "families_band" not in shed
    no_band_headline, _ = _headline(200)
    ref = json.loads(_compact_stdout_line(no_band_headline, timings, budget=600))
    assert shed["queries_inline"] == ref["queries_inline"] > 1
    assert shed["queries"] == ref["queries"]


def test_last_resort_shed_drops_queries_and_inline_count_together():
    """ADVICE r13: with fixed keys so bulky the per-query trim can't fit
    the budget, the shed must drop queries AND queries_inline as a pair —
    never a count without its map."""
    big_fixed = {"families_band": {f"fam_{i}": [1.0, 2.0] for i in range(60)}}
    headline, timings = _headline(200, extra=big_fixed)
    for budget in (1900, 1200, 900, 600, 400):
        line = _compact_stdout_line(headline, timings, budget=budget)
        d = json.loads(line)
        assert ("queries" in d) == ("queries_inline" in d), (budget, sorted(d))
    # budget 600: dropping families_band alone suffices — queries (with
    # their count) survive, shed in preference order
    mid = json.loads(_compact_stdout_line(headline, timings, budget=600))
    assert "families_band" not in mid
    assert "queries" in mid and mid["queries_inline"] == len(mid["queries"])
    # a budget below even the 2-query line sheds both bulky groups; the
    # record still parses with the scalar gates intact
    tight = json.loads(_compact_stdout_line(headline, timings, budget=200))
    assert "families_band" not in tight and "queries" not in tight
    assert "queries_inline" not in tight
    assert tight["metric"] == "bench_total"


def test_detail_paths_keep_legacy_name_and_add_per_core_copy():
    """r20 (VERDICT r19 ask #4): the full payload lands BOTH in the legacy
    BENCH_DETAIL.json (cross-round tooling) and in a per-core-count copy,
    so the driver's low-core scaling rerun can no longer clobber the
    full-registry map of the main run."""
    from bench import _detail_paths

    paths = _detail_paths(Path("/x"), "32")
    assert [p.name for p in paths] == [
        "BENCH_DETAIL.json",
        "BENCH_DETAIL_c32.json",
    ]
    assert _detail_paths(Path("/x"), "8")[1].name == "BENCH_DETAIL_c8.json"
