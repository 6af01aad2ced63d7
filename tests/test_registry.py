"""Registry integrity pins (VERDICT r5 ask #1).

The extension registry used to degrade silently: a transitive import error
inside any operator module would shrink the driver's query set while every
remaining query stayed green, so the correctness gate looked healthy as
coverage dropped. Registration is now unconditional
(``polarify_spark/operators/__init__.py``) and these pins are the tripwire:
deleting or breaking any operator module turns pytest red here instead of
quietly narrowing the gate.

When a new query is added on purpose, bump the counts here in the same
commit — that is the point: registry size changes must be deliberate.
"""

from __future__ import annotations

import __spark_entry__ as entry
from polarify_spark.operators import EXTENSION_QUERIES
from polarify_spark.queries import CORE_QUERIES

# Bump these deliberately when adding queries; never let them drift down.
EXPECTED_CORE = 13
# r8: +similarity_knn_index_serve (on-disk IVF serving)
# r9: +docs_strip_repeated_spans, +docs_leakage_safe_split,
#     +docs_decontaminate_spans (refine.py — the APPLY layer over the
#     span/cluster/decontamination detection queries)
EXPECTED_EXTENSION = 120
EXPECTED_TOTAL = EXPECTED_CORE + EXPECTED_EXTENSION


def test_core_registry_count_pinned():
    assert len(CORE_QUERIES) == EXPECTED_CORE


def test_extension_registry_count_pinned():
    assert len(EXTENSION_QUERIES) == EXPECTED_EXTENSION


def test_driver_contract_total_pinned():
    q = entry.queries()
    assert len(q) == EXPECTED_TOTAL
    # No overlap between core and extension names.
    assert len(set(CORE_QUERIES) | set(EXTENSION_QUERIES)) == EXPECTED_TOTAL


def test_every_module_contributes():
    """Each operator family must register at least one query — a module whose
    QUERIES dict went empty is as silent a failure as a missing import."""
    from polarify_spark import streaming
    from polarify_spark.operators import (
        bpe,
        corpus,
        dedup,
        knn,
        ml,
        multimodal,
        quality,
        refine,
        relational,
        search,
        similarity,
        skew,
        text,
        timeseries,
    )

    for mod in (text, corpus, dedup, similarity, knn, search, ml, quality, bpe, timeseries, multimodal, skew, relational, refine, streaming):
        assert mod.QUERIES, f"{mod.__name__}.QUERIES is empty"
        assert set(mod.QUERIES) <= set(EXTENSION_QUERIES)


def test_oracle_coverage_full():
    """Every registered query currently ships a DuckDB oracle; a query landing
    without one (rows-only check) must be a deliberate, visible choice."""
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(o) == set(q)


def test_callables_and_sql_shapes():
    for name, (fn, sql) in {**CORE_QUERIES, **EXTENSION_QUERIES}.items():
        assert callable(fn), name
        assert sql is None or (isinstance(sql, str) and sql.strip()), name


def test_rotation_demotes_changed_modules(monkeypatch):
    """A query whose implementing module changed after its last green round
    must sort with the no-evidence block (re-proven next gate), ahead of
    queries whose evidence is merely old (VERDICT r5 ask #2)."""
    names = list(entry.queries())
    lg = entry._last_green_round()
    ch = entry._module_change_round()
    assert ch, "git-based change map unavailable"

    stale_changed = [
        n for n in names
        if lg.get(n, -1) >= 0
        and ch.get(entry._query_module_file(entry.queries()[n]) or "", 0) > lg[n]
    ]
    if not stale_changed:  # nothing stale right now — exercise via fakes
        monkeypatch.setattr(entry, "_last_green_round", lambda: {n: 1 for n in names})
        monkeypatch.setattr(
            entry, "_module_change_round",
            lambda: {entry._query_module_file(f) or "": 99
                     for f in (entry.queries()[n] for n in names[:1])},
        )
        ordered = list(entry.queries())
        assert ordered[0] == names[0]
        return

    ordered = list(entry.queries())
    fresh = [n for n in names if lg.get(n, -1) >= 0 and n not in stale_changed]
    worst_stale = max(ordered.index(n) for n in stale_changed)
    best_fresh = min(ordered.index(n) for n in fresh)
    assert worst_stale < best_fresh, (
        f"changed-code query sorted after fresh-evidence query: "
        f"{stale_changed} vs first fresh at {best_fresh}"
    )
