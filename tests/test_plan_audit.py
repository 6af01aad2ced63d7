"""Registry-wide physical-plan smell gate (VERDICT r7 ask #5).

Runs ``tools.plan_audit.audit_registry`` — the same sweep the CLI tool
prints — inside the suite, so the two unconditional smells fail ``pytest``
red instead of only the manually-run tool:

* a ``CartesianProduct`` whose plan contains no broadcast anywhere, and
* any row-wise (non-Arrow) ``BatchEvalPython`` operator.

Marked ``slow``: it builds all ~130 registered plans at sf0.001 (~90 s,
a handful of the eager-construction queries run small jobs). Deselect
with ``-m 'not slow'`` for a quick loop.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_registry_plans_have_no_hard_smells(spark):
    for p in (str(REPO), str(REPO / "tools")):
        if p not in sys.path:
            sys.path.insert(0, p)
    from plan_audit import audit_registry

    rows, hard_fails = audit_registry(spark)
    assert not hard_fails, "\n".join(hard_fails)
    # The sweep must actually have covered the registry.
    import __spark_entry__ as entry_mod

    assert len(rows) == len(entry_mod.queries())


def test_keyed_sortagg_counter_skips_partial_and_merge_phases():
    """One logical aggregate = one count, regardless of how many physical
    phases Spark prints (ADVICE r12: a distinct aggregate's ``merge_``
    node inflated the advisory column). Key-less folds never count."""
    for p in (str(REPO), str(REPO / "tools")):
        if p not in sys.path:
            sys.path.insert(0, p)
    from plan_audit import count_keyed_sortaggs

    distinct_agg = "\n".join(
        [
            "SortAggregate(key=[k#1], functions=[partial_max(x#2)])",
            "SortAggregate(key=[k#1], functions=[merge_max(x#2)])",
            "SortAggregate(key=[k#1], functions=[max(x#2)])",
        ]
    )
    assert count_keyed_sortaggs(distinct_agg) == 1
    assert count_keyed_sortaggs(
        "SortAggregate(key=[], functions=[max(x#2)])"
    ) == 0
    two_logical = distinct_agg + (
        "\nSortAggregate(key=[g#3], functions=[min(y#4)])"
    )
    assert count_keyed_sortaggs(two_logical) == 2

    # A grouped DISTINCT has no aggregate functions: both phases print
    # ``functions=[]`` and match neither phase prefix, so they count as
    # a PAIR — one logical aggregate, not two (ADVICE r13).
    grouped_distinct = "\n".join(
        [
            "SortAggregate(key=[k#1], functions=[])",
            "SortAggregate(key=[k#1], functions=[])",
        ]
    )
    assert count_keyed_sortaggs(grouped_distinct) == 1
    # AQE eliding one phase still counts the aggregate once...
    assert count_keyed_sortaggs(
        "SortAggregate(key=[k#1], functions=[])"
    ) == 1
    # ...and pairs compose with ordinary phased aggregates.
    assert count_keyed_sortaggs(distinct_agg + "\n" + grouped_distinct) == 2
    # Pairing is PER KEY (r14 review fix): two single-phase grouped
    # distincts on DIFFERENT keys are two logical aggregates, not one
    # globally-paired ceil(2/2).
    two_keys_elided = "\n".join(
        [
            "SortAggregate(key=[a#1], functions=[])",
            "SortAggregate(key=[b#2], functions=[])",
        ]
    )
    assert count_keyed_sortaggs(two_keys_elided) == 2
    # Expr-id drift between phases must not split one logical grouped
    # distinct into two (ADVICE r14): keys are normalized by stripping
    # ``#<exprId>`` before pairing, so a partial printing k#1 and a
    # final printing k#7 still pair up as ONE aggregate.
    id_drift = "\n".join(
        [
            "SortAggregate(key=[k#1], functions=[])",
            "SortAggregate(key=[k#7], functions=[])",
        ]
    )
    assert count_keyed_sortaggs(id_drift) == 1
    # ...and merging two fully-phased distincts over the SAME-named
    # column is harmless: 4 nodes in one normalized bucket is still
    # ceil(4/2) = 2 logical aggregates.
    same_name_twice = "\n".join(
        [
            "SortAggregate(key=[k#1], functions=[])",
            "SortAggregate(key=[k#1], functions=[])",
            "SortAggregate(key=[k#9], functions=[])",
            "SortAggregate(key=[k#9], functions=[])",
        ]
    )
    assert count_keyed_sortaggs(same_name_twice) == 2
    # The documented inherent ambiguity (review r15): two same-NAMED
    # different-column aggregates whose partials were BOTH elided print
    # identically to one drifted pair — normalization deliberately reads
    # this as ONE (drift-robustness over the rarer double-elision).
    both_elided_same_name = "\n".join(
        [
            "SortAggregate(key=[k#1], functions=[])",
            "SortAggregate(key=[k#9], functions=[])",
        ]
    )
    assert count_keyed_sortaggs(both_elided_same_name) == 1
