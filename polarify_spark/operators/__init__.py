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

LEDGER GUARD: this hub is deliberately OUTSIDE the staleness ledger's
dep closures (modeling it would stale every query on any change —
``__spark_entry__._module_deps``), so runtime code that lives here
(``release_shared_caches``) gets no dep-aware re-proof when edited; it
is covered by its own tests only, and must never become part of a
registered query's execution path. Pinned by ``tests/
test_driver_contract.py::
test_dep_model_exception_set_is_exactly_the_documented_hubs``.
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
from . import search  # noqa: E402
from . import ml  # noqa: E402
from . import quality  # noqa: E402
from . import bpe  # noqa: E402
from . import relational  # noqa: E402
from . import refine  # noqa: E402
from .. import streaming  # noqa: E402

_register(text.QUERIES)
_register(corpus.QUERIES)
_register(dedup.QUERIES)
_register(similarity.QUERIES)
_register(timeseries.QUERIES)
_register(multimodal.QUERIES)
_register(skew.QUERIES)
_register(knn.QUERIES)
_register(search.QUERIES)
_register(ml.QUERIES)
_register(quality.QUERIES)
_register(bpe.QUERIES)
_register(relational.QUERIES)
_register(refine.QUERIES)
_register(streaming.QUERIES)


def release_shared_caches(spark, scope: str = "all") -> None:
    """Drop cross-query shared artifacts: the dedup gram/signature memo
    (``dedup._DEDUP_MEMO``, scope ``"dedup"``), the ANN index memo
    (``similarity._ANN_MEMO``, scope ``"ann"``), or both plus the BPE
    trained-state memo (``bpe._BPE_MEMO``), the search-family index memo
    (``search._SEARCH_MEMO``: inverted index + charlm bigram counts), and
    every catalog-cached DataFrame (scope ``"all"``).

    The memos deliberately outlive single queries (an ANN index is built
    once per corpus and served many times), but a long-running session that
    has *finished* with a family of artifacts should be able to hand the
    storage memory back — e.g. a benchmark sweep leaving the dedup/docs
    groups (dedup memo dead, ANN cell assignments still to be reused by the
    similarity group), or a pipeline finishing with a corpus entirely.
    Blocks behind ``localCheckpoint`` are reclaimed by Spark's
    ContextCleaner once their RDD references are garbage-collected; the
    explicit driver-side GC pair below (Python first, so py4j releases the
    JVM refs, then the JVM) makes that reclamation prompt instead of
    whenever the next full GC happens."""
    import gc

    from . import dedup, similarity

    if scope not in ("all", "ann", "dedup"):
        raise ValueError(f"unknown release scope {scope!r}")
    if scope in ("all", "ann"):
        with similarity._ANN_MEMO_LOCK:
            similarity._ANN_MEMO.clear()
    if scope in ("all", "dedup"):
        # Quiesce in-flight simhash handle builds before the paired
        # clears (ADVICE r12): a builder that read a ``_DEDUP_MEMO``
        # entry before the registry clear but inserted its handle after
        # the handle-memo clear would leave a handle whose memo dict is
        # detached from the registry — ``_memo_src`` returns None and
        # later durable artifacts (simhash_pairs, triangles, pagerank)
        # get keyed off session-specific checkpoint plans. Builders hold
        # their per-key lock for the WHOLE build (``_memo.memo_build``),
        # so holding every per-key lock excludes them; the snapshot is
        # released before the acquisitions because a mid-build thread
        # takes the registry lock (briefly) for its final insert, and
        # holding registry-then-waiting-on-per-key would deadlock
        # against its per-key-then-registry order. Acquisition follows
        # dict insertion order, so two concurrent releases can't
        # deadlock each other either.
        with dedup._SIMHASH_HANDLE_LOCK:
            handle_locks = list(dedup._SIMHASH_HANDLE_LOCKS.values())
        # Acquire INSIDE the try and release only what was actually
        # acquired (ADVICE r13): an exception mid-loop (KeyboardInterrupt
        # between acquisitions) no longer strands already-held per-key
        # locks, which would permanently deadlock future handle builds
        # for those keys in this process. Residual (documented, CPython-
        # irreducible in pure Python): an interrupt delivered in the one
        # bytecode between acquire() returning and the append leaks that
        # single lock — pre-appending instead would release an
        # unacquired Lock (RuntimeError) when acquire() itself raises.
        acquired: list = []
        try:
            for hl in handle_locks:
                hl.acquire()
                acquired.append(hl)
            with dedup._DEDUP_MEMO_LOCK:
                del dedup._DEDUP_MEMO[:]
                dedup._SPAN_PLAN_CACHE.clear()
                # _SPAN_PLAN_LOCKS deliberately survives (the bpe
                # convention): a build mid-flight holds its per-key
                # lock, and clearing the registry would hand a racing
                # thread a FRESH lock — the duplicate-build race the
                # locks exist to prevent. Lock objects are content-free,
                # bounded by corpora ever seen.
            with dedup._SIMHASH_HANDLE_LOCK:
                # the O(1) (memo, banded) handle front-cache must drop
                # with the registry it points into, or a released dedup
                # memo would keep serving the old banded checkpoint.
                # Cleared AFTER the registry so no handle inserted
                # between the two clears can outlive both. Residual
                # (documented, not closed): a first-touch build for a
                # key whose per-key lock did not exist at snapshot time
                # is not excluded and can insert after this clear —
                # but ``_SIMHASH_HANDLE_LOCKS`` itself survives
                # releases, so that needs an sf_dir never seen by this
                # process with its multi-second build exactly
                # straddling the release call.
                dedup._SIMHASH_HANDLE_MEMO.clear()
        finally:
            for hl in acquired:
                hl.release()
    if scope == "all":
        from . import bpe, ml, search

        with ml._ML_MEMO_LOCK:
            # lock registry survives (the bpe convention) so a racing
            # thread can never duplicate a mid-flight training run
            ml._ML_MEMO.clear()

        with search._SEARCH_MEMO_LOCK:
            # wholesale clear drops the per-key build locks INSIDE each
            # memo dict (the _ANN_MEMO convention, unlike the separate
            # _BPE_BUILD_LOCKS registry): a release racing a mid-build
            # thread can at worst duplicate one index build — benign
            # Spark work, and in durable mode materialize()'s publish
            # protocol already absorbs concurrent same-key writers.
            del search._SEARCH_MEMO[:]
        with bpe._BPE_MEMO_LOCK:
            bpe._BPE_MEMO.clear()
            # _BPE_BUILD_LOCKS deliberately survives the release: a build
            # mid-flight holds its per-corpus lock, and clearing the
            # registry would hand a racing thread a FRESH lock — exactly
            # the duplicate-train race the locks exist to prevent. The
            # registry holds only content-free Lock objects, bounded by
            # the number of corpora ever seen.
    # the catalog cache is always safe to drop: the artifacts that carry
    # across query groups live in the memos as localCheckpoint snapshots,
    # not as catalog-cached plans
    spark.catalog.clearCache()
    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:  # noqa: BLE001 — a GC nudge must never fail a pipeline
        pass
