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
