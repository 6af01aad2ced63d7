"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator (SURVEY.md section 2 plus
the extension operator set) for the sf0.01 DuckDB correctness gate.

Query registries live next to the operators they exercise:
  - ``polarify_spark.queries.CORE_QUERIES``        — transpiler Q1-Q12
  - ``polarify_spark.operators.*.QUERIES``         — dedup / similarity /
    text / multimodal / time-series extension operators
"""

from __future__ import annotations

from collections.abc import Callable

try:
    import polarify_spark  # noqa: F401  — installed (pip install -e .)
except ImportError:
    # Fallback for running from a bare checkout without installation: put
    # the repo on sys.path for the driver, and on PYTHONPATH for the Python
    # worker processes (mapInPandas / applyInPandasWithState UDFs are
    # serialized by reference to polarify_spark.*, and driver-side sys.path
    # edits don't reach workers; PYTHONPATH does — workers spawn after the
    # first action, which is after this import).
    import os
    import sys
    from pathlib import Path

    _REPO_ROOT = str(Path(__file__).resolve().parent)
    if _REPO_ROOT not in sys.path:
        sys.path.insert(0, _REPO_ROOT)
    _pp = os.environ.get("PYTHONPATH", "")
    if _REPO_ROOT not in _pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{_REPO_ROOT}{os.pathsep}{_pp}" if _pp else _REPO_ROOT
        )

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def _last_green_round() -> dict[str, int]:
    """Query name -> latest round whose CORRECTNESS_r*.json has it green
    (rows+schema+hash). Files are replayed in round order; a non-green row
    in a later round REMOVES the name, so a regression re-prioritizes the
    query instead of hiding behind an old green row.

    The driver runs queries in registry order under a wall-clock budget
    (~50 slots per round for 60+ registered queries), so ordering by
    staleness makes each round's budget re-prove the oldest evidence first
    and newly-added queries (no evidence at all) before that.
    """
    import json
    import re
    from pathlib import Path

    repo = Path(__file__).resolve().parent
    files = sorted(
        repo.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.sub(r"\D", "", p.stem) or 0),
    )
    last_green: dict[str, int] = {}
    for path in files:
        rnd = int(re.sub(r"\D", "", path.stem) or 0)
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):  # truncated/partial write ('null', [])
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                last_green[name] = rnd
            else:
                last_green.pop(name, None)
    return last_green


def _registries() -> dict[str, tuple[Callable, str | None]]:
    from polarify_spark.queries import CORE_QUERIES

    merged: dict[str, tuple[Callable, str | None]] = {}
    merged.update(CORE_QUERIES)

    try:
        from polarify_spark.operators import EXTENSION_QUERIES

        merged.update(EXTENSION_QUERIES)
    except ImportError:  # extension set still landing
        pass

    # Least-recently-verified first: never-verified queries (and ones whose
    # latest driver row was red) lead, then ascending last-green round, so a
    # driver-side cap truncates the freshest evidence, not the gap — and the
    # whole registry re-verifies on a rolling cadence instead of aging out.
    # The sort is stable, so registry order breaks ties within a round.
    last_green = _last_green_round()
    return dict(
        sorted(merged.items(), key=lambda kv: last_green.get(kv[0], -1))
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Q1: the reference's canonical `signum` example, transpiled to a CaseWhen
    and applied to lineitem."""
    from polarify_spark.queries import CORE_QUERIES

    fn, _ = CORE_QUERIES["q1_signum_ifelse"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator; callables take (spark, sf_dir)."""
    return {name: fn for name, (fn, _sql) in _registries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted entries get rows-only checks."""
    return {name: sql for name, (_fn, sql) in _registries().items() if sql is not None}
