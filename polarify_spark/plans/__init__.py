"""Physical-plan inspection: the feedback loop for scale-shaped plans.

The reference delegates all planning to its host engine and never inspects
plans (SURVEY.md section 4); on Spark the plan IS the performance contract,
so this package makes the properties that matter at 100 TB — pushdown,
pruning, shuffle count, broadcast choice, codegen fusion — programmatically
checkable. The plan-shape tests in ``tests/test_plan_shapes.py`` pin them
so a regression that silently adds a shuffle or drops pushdown fails CI,
not the cluster.

LEDGER GUARD: read-only tooling consumed by tests/tools, deliberately
outside the staleness ledger's dep closures — code added here gets no
dep-aware re-proof and must never join a registered query's execution
path (see ``__spark_entry__._module_deps``; pinned by
``tests/test_driver_contract.py::
test_dep_model_exception_set_is_exactly_the_documented_hubs``).
"""

from __future__ import annotations

from .inspect import (
    assert_no_shuffle,
    broadcast_joins,
    exchange_count,
    plan_string,
    pushed_filters,
    read_schemas,
    wholestage_codegen_count,
)

__all__ = [
    "plan_string",
    "pushed_filters",
    "read_schemas",
    "exchange_count",
    "broadcast_joins",
    "wholestage_codegen_count",
    "assert_no_shuffle",
]
