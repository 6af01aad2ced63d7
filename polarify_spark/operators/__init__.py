"""Extension operators: the north-star LLM-data-pipeline set (build brief /
SURVEY.md section 7 stage 6), all built from public PySpark primitives.

Each submodule exposes ``QUERIES: dict[name, (spark_callable, oracle_sql)]``;
``EXTENSION_QUERIES`` merges them for the driver contract. ``oracle_sql`` may
be ``None`` for ops with no SQL-expressible oracle (driver then records a
rows-only check).
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

_register(text.QUERIES)

try:
    from . import dedup  # noqa: E402

    _register(dedup.QUERIES)
except ImportError:
    pass

try:
    from . import similarity  # noqa: E402

    _register(similarity.QUERIES)
except ImportError:
    pass

try:
    from . import timeseries  # noqa: E402

    _register(timeseries.QUERIES)
except ImportError:
    pass

try:
    from . import multimodal  # noqa: E402

    _register(multimodal.QUERIES)
except ImportError:
    pass

try:
    from . import skew  # noqa: E402

    _register(skew.QUERIES)
except ImportError:
    pass

try:
    from . import relational  # noqa: E402

    _register(relational.QUERIES)
except ImportError:
    pass

try:
    from .. import streaming  # noqa: E402

    _register(streaming.QUERIES)
except ImportError:
    pass
