"""Shared build-once insertion and materialization for cross-query memos.

Three operator modules keep expensive, reused artifacts in module-level
memos (``similarity._ANN_MEMO``, ``dedup._DEDUP_MEMO``, ``bpe._BPE_MEMO``)
with one concurrency contract: two driver threads wanting the same key
share ONE build; different keys build concurrently; the registry lock is
held only for dict bookkeeping, never across a Spark job. This helper is
that contract written once — the hand-rolled copy in ``bpe`` had drifted
into a return-path race the shared form structurally can't have.

The MATERIALIZATION layer lives here too (hoisted from ``dedup`` in
round 12 so the ANN and BPE memos share it): eager ``localCheckpoint``
at a serialized storage level by default, or — when the session conf
``spark.polarify.artifacts.dir`` is set — a write-once durable parquet
artifact keyed by the canonicalized plan + input files of the memo's
corpus frame, committed with a filesystem-atomic marker file.
"""

from __future__ import annotations

import threading
from typing import TYPE_CHECKING

# pure-Python pyspark submodule: no JVM, no SparkSession — safe at import
# time even for transpiler-only users
from pyspark.storagelevel import StorageLevel as _StorageLevel

if TYPE_CHECKING:
    from typing import Callable

    from pyspark.sql import DataFrame

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


def corpus_memo_build(
    registry_lock, memo: dict, locks: dict, spark, key, build, cap: int = 4
):
    """Capped per-corpus memo of session-bound values (the bpe/ml
    trained-artifact shape): entries are stored as ``(session, value)``
    and a hit bound to a DIFFERENT SparkSession is evicted and rebuilt —
    memo values hold checkpoint-RDD-backed DataFrames, and serving them
    across sessions raises ``Cannot call methods on a stopped
    SparkContext`` (the guard ``_dedup_stage_memo``/``_ann_index_memo``
    get from their ``sparkSession is`` staging check, written once here
    for sf_dir-keyed memos). If a racing thread inserts a different
    session's build between our eviction and ``memo_build``'s check, the
    evict-and-build cycle RETRIES once (ADVICE r12 / VERDICT r13 #1):
    evicting the foreign entry again and rebuilding under the per-key
    lock restores the single-build contract after a session swap — the
    pre-r14 behavior handed EVERY new-session thread caught by the race
    a full unmemoized private rebuild. Eviction is not poisoning: the
    foreign caller already holds its value via ``memo_build``'s local
    binding. Only a PERSISTENT foreign racer (a second live session
    hammering the same key — not a real deployment shape; the guard
    exists for session restarts) exhausts the retry and falls back to a
    bounded private rebuild, never an unbounded ping-pong."""

    def trim() -> None:
        while len(memo) > cap:
            memo.pop(next(iter(memo)))

    for _attempt in (1, 2):
        with registry_lock:
            cur = memo.get(key)
            if cur is not None and cur[0] is not spark:
                memo.pop(key, None)
        entry = memo_build(
            registry_lock,
            memo,
            key,
            lambda: (spark, build()),
            locks=locks,
            trim=trim,
        )
        if entry[0] is spark:
            return entry[1]
    return build()


def overlap_fills(*thunks):
    """Run independent memo-fill thunks on concurrent driver threads
    (guide §2.6, "overlap independent jobs"): Spark happily schedules
    several jobs at once, so while one chain sits in its stage tail or a
    single-threaded driver phase (plan compile, checkpoint bookkeeping),
    the other chain's tasks back-fill the idle executors. Correct ONLY
    for memoized fills: each thunk must be idempotent, and
    :func:`memo_build`'s per-key locks already guarantee that two
    threads wanting the same artifact share one build — two chains that
    meet on a shared upstream artifact serialize on exactly that key and
    overlap everywhere else.

    Returns the thunks' results in order. ``pool.shutdown`` (the context
    exit) waits for every thread, so an exception from one chain never
    leaves the other running hidden; the first failure (in argument
    order) propagates."""
    if len(thunks) == 1:
        return [thunks[0]()]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]


#: session conf selecting the DURABLE artifact mode (VERDICT r10 ask #1).
#: Unset/empty (the default): memo artifacts are eager ``localCheckpoint``s
#: — fastest locally, but executor-loss-fragile on a real cluster (a lost
#: executor invalidates the checkpointed blocks mid-job, and at 100 TB the
#: window-hash table IS the expensive thing to lose). Set to a directory
#: (any Hadoop-FS URI: local path, hdfs://, s3a://): each memo artifact is
#: written ONCE as parquet under ``<dir>/<name>-<key>`` and read back — the
#: docstrings' "persisted signature table a pipeline writes next to the
#: corpus", made real. Artifacts are keyed by a sha256 of the canonicalized
#: logical plan of the memo's corpus frame, so the same (input files,
#: operator constants) reuse the artifact across sessions and a different
#: corpus can never collide into it. Static-input assumption as the memo:
#: if the corpus files change in place, clear the artifact dir.
ARTIFACTS_DIR_CONF = "spark.polarify.artifacts.dir"

#: storage level for localCheckpoint-backed memo artifacts: SERIALIZED
#: memory+disk, not Spark's localCheckpoint default (deserialized row
#: objects). Measured at R=100 (tools/probe_spans_steady.py, SCALE.md
#: round 11): the ~35M-row window table held as deserialized rows is the
#: r10 "spans steady 2.4-9.6 s" variance — steady walls [3.6, 10.8] s,
#: +/-38-79% of median, fill 27-40 s, all driver-heap GC; serialized
#: bytes give steady 2.2-2.8 s within +/-19% of median and fill 11-15 s.
#: Small artifacts (span set, pair tables) stay in memory as compact
#: bytes; only the corpus-positional tables spill. Module-global (not
#: per-call) so the scale probe can A/B it; ``None`` = Spark's default
#: (deserialized), kept reachable for the probe's baseline arm.
_CHECKPOINT_STORAGE = _StorageLevel.MEMORY_AND_DISK

#: commit marker created by :func:`materialize`'s durable publish, via
#: the filesystem-atomic ``createNewFile`` — deliberately DISTINCT from
#: parquet's ``_SUCCESS`` (ADVICE r11 #1): on object stores a dir rename
#: is a non-atomic file-by-file copy in which ``_SUCCESS`` can land
#: before the part files, so a reader gating on ``_SUCCESS`` could
#: observe a complete-looking but partial artifact. The marker is only
#: ever created AFTER every part file is fully in place. Underscore
#: prefix: Spark's parquet reader ignores ``_``-prefixed siblings.
COMMIT_MARKER = "_POLARIFY_COMMIT"

#: URI schemes where rename is a non-atomic copy: the durable publish
#: writes the final path directly and commits with the marker instead
#: of the tmp-dir/rename dance (ADVICE r11 #1's object-store clause).
_OBJECT_STORE_SCHEMES = frozenset(
    {"s3", "s3a", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs", "oss", "cos"}
)


#: sentinel: "use the module-level ``_CHECKPOINT_STORAGE``" (distinct from
#: an explicit ``None``, which selects Spark's default deserialized level).
_MODULE_DEFAULT = object()


def local_checkpoint(df: "DataFrame", storage=_MODULE_DEFAULT) -> "DataFrame":
    """Eager localCheckpoint at ``_CHECKPOINT_STORAGE`` — version-gated:
    the ``storageLevel`` parameter exists only on PySpark >= 4.0, and the
    package floor is ``pyspark>=3.5`` (pyproject). On 3.x the checkpoint
    falls back to Spark's default level (deserialized) — correct, just
    without the serialized-bytes GC win measured in SCALE.md round 11.

    ``storage`` overrides per artifact (the r11 verdict's select-per-
    artifact principle): serialized bytes win for corpus-positional GIANT
    tables (driver-heap GC — SCALE.md r11), but an artifact a session
    re-reads MANY times pays the per-read deserialization each pass —
    the logreg feature table (13 reads/training run) measured 5.2 s
    serialized vs 3.6 s at Spark's default deserialized level. Pass
    ``storage=None`` for such hot-re-read artifacts."""
    import inspect

    level = _CHECKPOINT_STORAGE if storage is _MODULE_DEFAULT else storage
    if level is not None and "storageLevel" in inspect.signature(
        df.localCheckpoint
    ).parameters:
        return df.localCheckpoint(eager=True, storageLevel=level)
    return df.localCheckpoint(eager=True)


def _require_classic(df: "DataFrame", what: str) -> None:
    """Durable artifacts reach through ``_jdf``/``sc._jvm`` (canonicalized
    plan string, Hadoop FileSystem API), which do not exist on Spark
    Connect sessions — fail fast with a descriptive error instead of the
    opaque ``AttributeError`` a Connect client would otherwise hit
    (ADVICE r11 #4). PERMANENT, by decision (VERDICT r13 #2): the commit
    protocol's atomicity is filesystem-API ``createNewFile``/rename —
    un-emulatable through Spark jobs — and a client-side proto-plan key
    would canonicalize differently from the JVM key, silently splitting
    the artifact namespace between classic writers and Connect readers.
    See README "Spark Connect and durable artifacts: out of scope"."""
    if not hasattr(df, "_jdf"):
        raise NotImplementedError(
            f"{what} requires a classic (non-Connect) SparkSession: the "
            f"artifact key reads the JVM-canonicalized plan and the "
            f"publish protocol drives the Hadoop FileSystem API. Unset "
            f"{ARTIFACTS_DIR_CONF} to fall back to localCheckpoint memos, "
            f"or run against a classic master."
        )


def artifact_key(key_df: "DataFrame") -> str:
    """Cross-session-stable identity of a pure plan: sha256 of the
    canonicalized logical plan string (expression ids normalized;
    operator constants included) PLUS the sorted input file listing.
    The file listing is load-bearing, not belt-and-braces: the canonical
    plan string prints relations WITHOUT their location, so two corpora
    differing only in path would otherwise key the SAME artifact and
    durable mode would silently serve one corpus the other's tables
    (pinned by test_artifact_key_stable_across_plan_instances). Worst
    case of the canonical form changing across Spark versions is a
    one-time artifact rebuild, never a wrong read."""
    import hashlib

    _require_classic(key_df, "durable artifact keying")
    s = key_df._jdf.queryExecution().analyzed().canonicalized().toString()
    files = "\n".join(sorted(key_df.inputFiles()))
    return hashlib.sha256(f"{s}\0{files}".encode()).hexdigest()[:16]


def materialize(
    df: "DataFrame",
    name: str,
    key_df: "DataFrame | None" = None,
    storage=_MODULE_DEFAULT,
) -> "DataFrame":
    """Materialize a memo artifact: eager ``localCheckpoint`` by default,
    or a write-once parquet artifact under ``ARTIFACTS_DIR_CONF`` when
    that conf is set (then read back — every consumer scans a durable
    table that survives executor loss and later sessions).

    Durable-mode write protocol (restart- and cross-process-safe).
    Readers gate on the :data:`COMMIT_MARKER` file inside the artifact
    dir, created with the filesystem-atomic ``createNewFile`` strictly
    AFTER every part file is in place — never on parquet's ``_SUCCESS``
    (non-atomic-copy hazard on object stores, ADVICE r11 #1). Writers:

    * rename-atomic filesystems (local, HDFS): write to a uniquely
      suffixed ``.tmp-`` sibling, rename into place, then commit. A
      racing winner publishing between our existence check and the
      rename makes Hadoop's rename move our tmp INSIDE the live dir as
      a child (it returns true rather than refusing) — detected and the
      nested child removed, so the loser can never leave duplicate part
      files behind. A dir WITHOUT the marker is replaceable (crashed
      writer's leftovers, an uncommitted racer, or a pre-marker-protocol
      artifact — the last is rebuilt once, never wrongly read).
    * object stores (s3a://, gs://, abfs://...): rename is a file-by-file
      copy, so the parquet write goes straight to the final path and the
      marker lands last. Cross-process write races here are benign for
      readers (marker-gated) but concurrent writers can interleave part
      files; the in-process memo lock serializes same-key builds, and
      same-key cross-process builds produce semantically identical rows.

    After a successful publish (or the skip-to-read path) sibling
    ``.tmp-`` dirs from crashed writers are best-effort reaped
    (ADVICE r11 #2) — this can abort a concurrently racing same-key
    writer's doomed tmp write, which then retries into the committed
    read path."""
    spark = df.sparkSession
    base = spark.conf.get(ARTIFACTS_DIR_CONF, "")
    if not base:
        return local_checkpoint(df, storage=storage)
    _require_classic(df, "durable artifact mode")
    key_src = df if key_df is None else key_df
    path = f"{base.rstrip('/')}/{name}-{artifact_key(key_src)}"
    sc = spark.sparkContext
    jvm = sc._jvm
    jpath = jvm.org.apache.hadoop.fs.Path
    hpath = jpath(path)
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
    marker = jpath(f"{path}/{COMMIT_MARKER}")
    success = jpath(f"{path}/_SUCCESS")

    def _committed() -> bool:
        # A valid commit carries BOTH files. The marker alone is not
        # enough: Hadoop's createNewFile creates missing parent dirs, so
        # a winner whose dst was deleted by a racer (its legitimate
        # uncommitted-dst cleanup) can otherwise resurrect an EMPTY dir
        # containing only the marker — and certify zero rows. Parquet's
        # own _SUCCESS proves the data write finished; the marker proves
        # the dir was fully in place when certified. Assumes the default
        # committer (marksuccessfuljobs=true) — ours, on every path that
        # writes these artifacts.
        return fs.exists(marker) and fs.exists(success)

    def _reap_tmp() -> None:
        try:
            for st in fs.globStatus(jpath(f"{path}.tmp-*")) or []:
                fs.delete(st.getPath(), True)
        except Exception:
            pass  # reaping is best-effort housekeeping, never load-bearing

    def _publish_once() -> None:
        scheme = (hpath.toUri().getScheme() or fs.getUri().getScheme() or "")
        if scheme.lower() in _OBJECT_STORE_SCHEMES:
            df.write.mode("overwrite").parquet(path)
            fs.createNewFile(marker)
            if not _committed():
                raise IOError(f"could not commit durable artifact at {path}")
            return
        import uuid

        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        tpath = jpath(tmp)
        df.write.mode("overwrite").parquet(tmp)
        # Re-check AFTER the (slow) write: a racing writer may have
        # COMMITTED meanwhile — defer to the winner and never delete a
        # VALIDLY committed dir (a reader in another session may already
        # hold a lazy frame over it). Anything else at dst — marker-less
        # leftovers, or a marker-only resurrect shell — is replaceable.
        if _committed():
            fs.delete(tpath, True)
            return
        if fs.exists(hpath):
            fs.delete(hpath, True)
        renamed = fs.rename(tpath, hpath)
        nested = jpath(f"{path}/{tmp.rsplit('/', 1)[-1]}")
        if renamed and not fs.exists(nested):
            # we own the dir. Clear ANY nested tmp child first (a racer
            # can rename its tmp INTO ours in the same instant ours
            # lands — theirs, not just a dir matching our own basename),
            # then commit and VALIDATE: if _SUCCESS is gone the dir was
            # deleted-and-resurrected under us — un-commit and retry.
            try:
                for st in fs.globStatus(jpath(f"{path}/*.tmp-*")) or []:
                    fs.delete(st.getPath(), True)
            except Exception:
                pass
            fs.createNewFile(marker)
            if not _committed():
                fs.delete(hpath, True)
                raise IOError(
                    f"durable artifact at {path} was displaced mid-commit"
                )
            return
        # lost the race: dst reappeared between our delete and rename,
        # so Hadoop nested our tmp inside it (or refused). Remove the
        # loser's data, then defer.
        if fs.exists(nested):
            fs.delete(nested, True)
        fs.delete(tpath, True)
        if not _committed():
            # winner renamed but crashed (or hasn't yet run
            # createNewFile). On a rename-atomic FS an existing dir is
            # complete content — its own parquet _SUCCESS proves the
            # write finished, so committing it ourselves is safe here
            # (and ONLY here; on object stores this inference is the
            # exact hazard the marker exists to close).
            if fs.exists(success):
                fs.createNewFile(marker)
                if not _committed():
                    # the dir vanished between the _SUCCESS check and
                    # our marker create (a further racer's cleanup) —
                    # never return a shell; the retry wrapper re-runs
                    raise IOError(
                        f"durable artifact at {path} was displaced "
                        f"mid-commit"
                    )
            else:
                raise IOError(
                    f"could not publish durable artifact at {path}"
                )

    # A concurrent same-key winner can break our attempt MID-FLIGHT in
    # ways no pre-check covers: its post-commit reap deletes our tmp
    # while our parquet job is writing it; its uncommitted-dst cleanup
    # removes the dir under our createNewFile. Every such abort leaves
    # the winner's VALID commit behind (or nothing), so the recovery is
    # always the same — if a validated commit exists now, that IS
    # success (pinned by
    # test_durable_publish_concurrent_writers_single_artifact, which
    # flaked ~1-in-4 before this wrapper). Retries cover the
    # abort-without-commit interleavings (a two-writer race resolves in
    # at most one displacement per opponent attempt); failing every
    # attempt with no commit is a genuine error and surfaces.
    for attempt in (1, 2, 3):
        if _committed():
            break
        try:
            _publish_once()
            break
        except Exception:
            if _committed():
                break
            if attempt == 3:
                raise
    _reap_tmp()
    return spark.read.parquet(path)


def read_artifact(key_df: "DataFrame", name: str) -> "DataFrame | None":
    """The committed durable artifact for ``(name, key_df)``, or ``None``
    when durable mode is off / nothing is committed yet.

    Exists for memo builds whose BUILD step runs eager driver-side work —
    iterative training loops with per-round checkpoints (Lloyd rounds,
    BPE merges, connected-components iterations). For those,
    :func:`materialize`'s own skip-to-read arrives too late: the training
    has already executed by the time the finished frame reaches it. A
    build that probes this first skips the whole loop on a later
    session's refill — read the index, don't retrain it."""
    spark = key_df.sparkSession
    base = spark.conf.get(ARTIFACTS_DIR_CONF, "")
    if not base:
        return None
    _require_classic(key_df, "durable artifact mode")
    path = f"{base.rstrip('/')}/{name}-{artifact_key(key_df)}"
    sc = spark.sparkContext
    jvm = sc._jvm
    marker = jvm.org.apache.hadoop.fs.Path(f"{path}/{COMMIT_MARKER}")
    success = jvm.org.apache.hadoop.fs.Path(f"{path}/_SUCCESS")
    fs = marker.getFileSystem(sc._jsc.hadoopConfiguration())
    # same validated gate as materialize(): marker AND _SUCCESS — a
    # marker-only dir is a resurrect shell, not a commit
    if fs.exists(marker) and fs.exists(success):
        return spark.read.parquet(path)
    return None
