"""Helpers over ``df.explain`` output (the formatted physical plan)."""

from __future__ import annotations

import re
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def plan_string(df: "DataFrame", mode: str = "formatted") -> str:
    """The explain output as a string (what ``df.explain(mode)`` prints)."""
    try:
        return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
            df._jdf.queryExecution(), mode
        )
    except Exception:
        # fallback: capture stdout of df.explain (e.g. connect-mode clients)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode)
        return buf.getvalue()


def pushed_filters(df: "DataFrame") -> list[str]:
    """Every ``PushedFilters`` entry across the plan's parquet scans —
    empty means the scan reads all row groups unconditionally."""
    plan = plan_string(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        inner = m.group(1).strip()
        if inner:
            # split on commas outside parentheses: LessThan(k,100) is one entry
            out.extend(
                p.strip() for p in re.split(r",(?![^(]*\))", inner) if p.strip()
            )
    return out


def read_schemas(df: "DataFrame") -> list[list[str]]:
    """Per-scan column lists actually read from parquet (column pruning
    check: a 2-column projection must not list 16 columns here)."""
    plan = plan_string(df)
    schemas: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def exchange_count(df: "DataFrame") -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges — those
    move only the small side)."""
    plan = plan_string(df)
    # formatted mode: shuffles appear as a "(n) Exchange" detail entry
    # (broadcasts are "(n) BroadcastExchange"); simple mode: "Exchange <dist>"
    return len(re.findall(r"\(\d+\) Exchange\b", plan)) or len(
        re.findall(
            r"\bExchange (?:hash|range|RoundRobin|Single)", plan
        )
    )


def broadcast_joins(df: "DataFrame") -> list[str]:
    """The broadcast join operators in the plan (``BroadcastHashJoin`` /
    ``BroadcastNestedLoopJoin``)."""
    plan = plan_string(df)
    return re.findall(r"Broadcast\w*Join", plan)


def wholestage_codegen_count(df: "DataFrame") -> int:
    """Number of whole-stage-codegen spans; scalar pipelines should fuse
    into one."""
    plan = plan_string(df)
    ids = set(re.findall(r"codegen id : (\d+)", plan))
    return len(ids)


def assert_no_shuffle(df: "DataFrame") -> None:
    """Raise if the plan contains a shuffle exchange — the contract for
    scan-shaped operators (scalar projections, mapInPandas feature
    extraction): they must scale linearly with input splits."""
    n = exchange_count(df)
    if n:
        raise AssertionError(
            f"expected a shuffle-free plan but found {n} exchange(s):\n"
            + plan_string(df)
        )
