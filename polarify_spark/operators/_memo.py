"""Shared build-once insertion for the cross-query memos.

Three operator modules keep expensive, reused artifacts in module-level
memos (``similarity._ANN_MEMO``, ``dedup._DEDUP_MEMO``, ``bpe._BPE_MEMO``)
with one concurrency contract: two driver threads wanting the same key
share ONE build; different keys build concurrently; the registry lock is
held only for dict bookkeeping, never across a Spark job. This helper is
that contract written once — the hand-rolled copy in ``bpe`` had drifted
into a return-path race the shared form structurally can't have.
"""

from __future__ import annotations

import threading

_MISSING = object()


def memo_build(registry_lock, memo: dict, key, build, locks=None, trim=None):
    """Per-key locked check-and-insert into ``memo``; returns the entry.

    ``locks`` defaults to ``memo`` itself, with lock entries stored under
    ``("lock", key)`` — the similarity/dedup convention, safe there
    because nothing pops individual keys from a per-corpus memo dict.
    A memo that evicts plain keys (bpe's LRU) passes its separate lock
    registry so trims never count or drop lock entries.

    ``trim`` runs under ``registry_lock`` immediately after an insert
    (the LRU hook). The built value is returned from a LOCAL binding, not
    a re-read of the dict, so a concurrent eviction — another corpus's
    trim, or ``release_shared_caches`` clearing the memo — between insert
    and return can never surface as a ``KeyError``.
    """
    if locks is None:
        locks, lock_key = memo, ("lock", key)
    else:
        lock_key = key
    with registry_lock:
        lock = locks.setdefault(lock_key, threading.Lock())
    with lock:
        with registry_lock:
            value = memo.get(key, _MISSING)
        if value is _MISSING:
            value = build()
            with registry_lock:
                memo[key] = value
                if trim is not None:
                    trim()
        return value
