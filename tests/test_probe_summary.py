"""Probe summary envelope is honest about partial samples (ADVICE r16 #3).

``tools/probe_dedup_fill.summarize`` is the pure half of the fill
probe: child reps that errored (no ``stages`` key) must not silently
shrink a stage's envelope — each stage reports its own sample size
``n`` and the summary carries ``reps_failed``.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
for p in (str(REPO), str(REPO / "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)

from probe_dedup_fill import summarize  # noqa: E402


def _rep(**stages: float) -> dict:
    return {"stages": {k: {"s": v} for k, v in stages.items()}}


def test_full_sample_envelope():
    reps = [
        _rep(pairwise=10.0, components=8.0),
        _rep(pairwise=12.0, components=8.8),
        _rep(pairwise=11.0, components=8.4),
    ]
    out = summarize(reps, 3)
    assert out["reps"] == 3 and out["reps_failed"] == 0
    env = out["stage_envelope"]
    assert env["pairwise"] == {
        "n": 3,
        "min": 10.0,
        "max": 12.0,
        "spread_pct": 20.0,
    }
    assert env["components"]["n"] == 3


def test_failed_rep_visible_not_silently_dropped():
    # one rep errored, one rep returned JSON without a stages key: both
    # count as failed, and the surviving stage envelope says n=1
    reps = [
        _rep(pairwise=10.0),
        {"error": "OOM"},
        {"note": "valid json, no stages"},
    ]
    out = summarize(reps, 3)
    assert out["reps_failed"] == 2
    assert out["stage_envelope"]["pairwise"]["n"] == 1
    assert out["stage_envelope"]["pairwise"]["spread_pct"] == 0.0


def test_zero_min_reports_null_spread_not_crash():
    # a sub-resolution stage rounds to 0.0: spread_pct must be None,
    # not a ZeroDivisionError that loses every completed rep's summary
    out = summarize([_rep(fast=0.0), _rep(fast=0.01)], 2)
    env = out["stage_envelope"]["fast"]
    assert env["n"] == 2 and env["spread_pct"] is None


def test_all_reps_failed_yields_empty_envelope():
    out = summarize([{"error": "x"}, {"error": "y"}], 2)
    assert out["reps_failed"] == 2
    assert out["stage_envelope"] == {}


def test_stage_present_in_subset_of_reps_counts_only_those():
    # a rep that died mid-chain reports only the stages it finished —
    # later stages carry the smaller n
    reps = [_rep(pairwise=10.0, components=8.0), _rep(pairwise=11.0)]
    out = summarize(reps, 2)
    assert out["reps_failed"] == 0
    assert out["stage_envelope"]["pairwise"]["n"] == 2
    assert out["stage_envelope"]["components"]["n"] == 1


def test_malformed_stage_entry_skipped_not_keyerror():
    # ADVICE r17 #3: a stage entry without "s" (or that isn't a dict)
    # must be skipped per-stage, not raise KeyError and lose every
    # completed rep's summary
    reps = [
        _rep(pairwise=10.0, components=8.0),
        {"stages": {"pairwise": {"rows": 5}, "components": {"s": 8.4}}},
        {"stages": {"pairwise": "oops", "components": {"s": True}}},
    ]
    out = summarize(reps, 3)
    env = out["stage_envelope"]
    # rep 2's pairwise lacks "s"; rep 3's entries are a string and a
    # bool — none contribute, and n shows the shortfall per stage
    assert env["pairwise"]["n"] == 1
    assert env["components"]["n"] == 2
    # rep 3 contributed no valid stage at all -> counts as failed
    assert out["reps_failed"] == 1


def test_rep_with_all_malformed_stages_counts_failed():
    reps = [_rep(pairwise=10.0), {"stages": {"pairwise": {}}}]
    out = summarize(reps, 2)
    assert out["reps_failed"] == 1
    assert out["stage_envelope"]["pairwise"]["n"] == 1


def test_malformed_stages_container_counts_failed_not_attributeerror():
    # {"stages": null} / {"stages": [...]} are valid JSON a broken child
    # can emit: the container guard must score them as failed reps, not
    # raise AttributeError on .items() and lose the summary
    reps = [_rep(pairwise=10.0), {"stages": None}, {"stages": [1, 2]}]
    out = summarize(reps, 3)
    assert out["reps_failed"] == 2
    assert out["stage_envelope"]["pairwise"]["n"] == 1


def test_parse_child_rep_degrades_to_error_rep():
    from probe_dedup_fill import parse_child_rep

    # happy path: last stdout line is the rep object
    rep = parse_child_rep('noise\n{"stages": {"a": {"s": 1.0}}}\n', "")
    assert rep == {"stages": {"a": {"s": 1.0}}}
    # valid JSON but not an object (stray debug print / py4j noise) ->
    # one failed rep carrying stderr, never a TypeError in the parent
    assert parse_child_rep("42\n", "boom")["error"] == "boom"
    assert parse_child_rep("[1, 2]\n", "x") == {"error": "x"}
    assert parse_child_rep("null\n", "y") == {"error": "y"}
    # empty / non-JSON stdout
    assert parse_child_rep("", "dead") == {"error": "dead"}
    assert parse_child_rep("Traceback ...\n", "tb") == {"error": "tb"}
