"""Extension operators: the north-star LLM-data-pipeline set (build brief /
SURVEY.md section 7 stage 6), all built from public PySpark primitives.

Each submodule exposes ``QUERIES: dict[name, (spark_callable, oracle_sql)]``;
``EXTENSION_QUERIES`` merges them for the driver contract. ``oracle_sql`` may
be ``None`` for ops with no SQL-expressible oracle (driver then records a
rows-only check).

Registration is fail-loud on purpose: every submodule is imported
unconditionally, so a transitive import error inside any operator module
raises here instead of silently shrinking the driver's query registry (a
shrunken registry would run fewer queries, all green, and the correctness
gate would look healthy while coverage quietly dropped).
``tests/test_registry.py`` pins the exact registry counts as a second line
of defense.
"""

from __future__ import annotations

from typing import Callable

EXTENSION_QUERIES: dict[str, tuple[Callable, str | None]] = {}


def _register(module_queries: dict) -> None:
    for name, entry in module_queries.items():
        if name in EXTENSION_QUERIES:
            raise ValueError(f"duplicate extension query name: {name}")
        EXTENSION_QUERIES[name] = entry


from . import text  # noqa: E402
from . import corpus  # noqa: E402
from . import dedup  # noqa: E402
from . import similarity  # noqa: E402
from . import timeseries  # noqa: E402
from . import multimodal  # noqa: E402
from . import skew  # noqa: E402
from . import knn  # noqa: E402
from . import relational  # noqa: E402
from .. import streaming  # noqa: E402

_register(text.QUERIES)
_register(corpus.QUERIES)
_register(dedup.QUERIES)
_register(similarity.QUERIES)
_register(timeseries.QUERIES)
_register(multimodal.QUERIES)
_register(skew.QUERIES)
_register(knn.QUERIES)
_register(relational.QUERIES)
_register(streaming.QUERIES)
