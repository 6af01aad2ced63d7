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
    queries whose evidence is merely old (VERDICT r5 ask #2).

    VERDICT r9 #1: the old version only exercised the synthetic branch when
    the on-disk ledger happened to be clean, and its fake
    ``_module_change_round`` called ``entry.queries()`` from INSIDE the
    patched lambda — ``queries() -> _registries() -> fake -> queries()`` —
    so the moment staleness hit 0/0 the never-run path went live and died
    with RecursionError. Now: the name->module map is materialized into a
    plain dict BEFORE any monkeypatching, and the synthetic branch runs
    unconditionally (the real-ledger branch additionally runs when the disk
    state provides one), so both paths are exercised regardless of which
    CORRECTNESS_r*.json files exist.
    """
    fns = entry.queries()
    names = list(fns)
    # Snapshot BEFORE patching: the fakes below must be closed-over plain
    # data, never call back into entry.* (the r9 RecursionError).
    module_file = {n: entry._query_module_file(fns[n]) or "" for n in names}
    lg = entry._last_green_round()
    ch = entry._module_change_round()
    assert ch, "git-based change map unavailable"

    # Real-ledger branch: whenever the on-disk state has genuinely stale
    # queries, the live ordering must demote every one of them past none
    # of the fresh-evidence queries.
    stale_changed = [
        n for n in names
        if lg.get(n, -1) >= 0
        and entry._effective_change_round(module_file[n], ch)[0] > lg[n]
    ]
    if stale_changed:
        ordered = list(entry.queries())
        fresh = [n for n in names if lg.get(n, -1) >= 0 and n not in stale_changed]
        worst_stale = max(ordered.index(n) for n in stale_changed)
        best_fresh = min(ordered.index(n) for n in fresh)
        assert worst_stale < best_fresh, (
            f"changed-code query sorted after fresh-evidence query: "
            f"{stale_changed} vs first fresh at {best_fresh}"
        )

    # Synthetic branch (always runs): everything green at round 1, then one
    # module "changes" at round 99 — every query that module implements OR
    # that transitively imports it (dep-aware, VERDICT r11 ask #3) must
    # sort before every query from an untouched module. The fakes are plain
    # dicts captured above; they cannot recurse.
    target_file = module_file[names[0]]
    deps = entry._module_deps()
    fake_green = {n: 1 for n in names}
    fake_changed = {target_file: 99}
    monkeypatch.setattr(entry, "_last_green_round", lambda: dict(fake_green))
    monkeypatch.setattr(entry, "_module_change_round", lambda: dict(fake_changed))
    ordered = list(entry.queries())
    demoted = {
        n for n in names
        if module_file[n] == target_file
        or target_file in deps.get(module_file[n], ())
    }
    kept = set(names) - demoted
    assert demoted and kept, "fixture needs at least two distinct modules"
    worst_demoted = max(ordered.index(n) for n in demoted)
    best_kept = min(ordered.index(n) for n in kept)
    assert worst_demoted < best_kept, (
        f"synthetic-stale module {target_file} not fully demoted: "
        f"worst at {worst_demoted}, first fresh at {best_kept}"
    )


def test_ledger_dep_aware_cross_module_staleness():
    """VERDICT r11 ask #3, the exact hole: `docs_strip_repeated_spans` /
    `docs_decontaminate_spans` are defined in refine.py but execute
    through dedup.py's memo artifacts — under an injected change map
    where ONLY dedup.py changed after refine's green round, their
    effective change round must exceed that green round (STALE), and
    a query with no dedup dependency must stay CURRENT."""
    refine = "polarify_spark/operators/refine.py"
    deps = entry._module_deps()
    assert "polarify_spark/operators/dedup.py" in deps[refine], (
        "derived import graph lost the refine->dedup edge"
    )
    injected = {"polarify_spark/operators/dedup.py": 11}
    rnd, via = entry._effective_change_round(refine, injected)
    assert (rnd, via) == (11, "polarify_spark/operators/dedup.py")
    green = 10  # refine's r10 evidence predates the dedup r11 change
    assert rnd > green, "dedup-only edit must stale the refine queries"
    # an independent module (relational.py imports only ..functions)
    rel = "polarify_spark/operators/relational.py"
    assert entry._effective_change_round(rel, injected)[0] == 0


def test_module_deps_transitive_through_package_init():
    """A package-name import deps the package __init__ and, through the
    closure, the submodules it re-exports: dedup.py imports
    `..functions` names, so a change to functions/hashing.py must reach
    dedup's effective round."""
    deps = entry._module_deps()
    dd = deps["polarify_spark/operators/dedup.py"]
    assert "polarify_spark/functions/__init__.py" in dd
    assert "polarify_spark/functions/hashing.py" in dd
    # and the registry hub __init__ must NOT make everything depend on
    # everything: bpe.py never imports dedup
    assert "polarify_spark/operators/dedup.py" not in deps[
        "polarify_spark/operators/bpe.py"
    ]
