"""Streaming job builders (see package docstring)."""

from __future__ import annotations

import threading
import uuid
from contextlib import contextmanager
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

WATERMARK = "2 hours"


@contextmanager
def scoped_shuffle_partitions(spark: "SparkSession", n: int):
    """Scoped (set/restore) override of ``spark.sql.shuffle.partitions``.

    For a NEW streaming query this conf fixes the state-store partition
    count — permanently, since a checkpointed query keeps its original
    count for life. Size it to expected STATE volume, not to the session's
    batch-shuffle default: every state partition is a store instance with
    per-micro-batch maintenance cost, so 32 stores over a few thousand
    rows is pure overhead, while a 100 TB keyed state wants hundreds.
    Scoped so batch plans in the same session are untouched.

    Serialized against every other scoped conf block in this process via
    ``sources.catalog.CONF_SCOPE_LOCK`` (session conf is session-global; a
    concurrent unscoped planner thread would still see the override —
    build streaming queries through these accessors)."""
    from ..sources.catalog import CONF_SCOPE_LOCK

    key = "spark.sql.shuffle.partitions"
    with CONF_SCOPE_LOCK:
        old = spark.conf.get(key)
        spark.conf.set(key, str(n))
        try:
            yield
        finally:
            spark.conf.set(key, old)


def streaming_events(
    spark: "SparkSession",
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> "DataFrame":
    """``readStream`` over the events parquet directory with the same
    nanos->micros timestamp normalization as the batch reader. A streaming
    source needs an explicit schema (no inference at plan time).

    ``max_files_per_trigger`` rate-limits the source (files per micro-batch)
    — under ``availableNow`` this is what splits a multi-file directory into
    multiple real micro-batches, exercising cross-batch operator state."""
    from ..sources import event_time_reader, normalize_event_ts

    # A streaming source needs an explicit schema, but events.ts has changed
    # physical type across generator versions (nano longs vs TIMESTAMP_MICROS)
    # — sniff via one footer-only batch read under the same reader confs, so
    # the stream schema always matches the files on disk.
    with event_time_reader(spark):
        ts_ddl = (
            spark.read.option("pathGlobFilter", "events*.parquet")
            .parquet(sf_dir)
            .schema["ts"]
            .dataType.simpleString()
        )
        schema = (
            f"event_id long, ts {ts_ddl}, user_id long, event_type string, "
            "value double, props string"
        )
        reader = (
            spark.readStream.schema(schema)
            .format("parquet")
            .option("pathGlobFilter", "events*.parquet")
        )
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        raw = reader.load(sf_dir)
    return normalize_event_ts(raw)


def streaming_windowed_counts(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Tumbling 1-hour windowed counts per event_type with an event-time
    watermark — the incremental twin of
    ``operators.timeseries.windowed_agg`` (same output schema)."""
    from pyspark.sql import functions as F

    events = streaming_events(spark, sf_dir).withWatermark("ts", WATERMARK)
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
            F.round(F.avg("value"), 4).alias("value_avg"),
        )
        .select(
            # floor (not a truncating cast) so pre-1970 windows match the
            # batch operator and its oracle
            F.floor(F.unix_timestamp(F.col("w.start")) / 3600)
            .cast("long")
            .alias("hour_id"),
            "event_type",
            "n_events",
            "value_sum",
            "value_avg",
        )
    )


def streaming_session_stats(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Per-user gap-based session aggregates via Spark's native
    ``session_window`` — the built-in complement of the custom
    ``applyInPandasWithState`` sessionizer: where that one emits a row per
    event (needing per-user cross-batch state it manages itself), this one
    lets the engine merge events into [first, last + gap) windows and
    aggregate them, with session state maintained by the state store.

    Boundary semantics: ``session_window`` starts a NEW session when the
    inter-event gap is >= the gap duration (an event landing exactly at
    the previous window's end does not extend it); the custom sessionizer
    and its shared batch oracle use strict >. The oracle for THIS query
    mirrors the >= rule, so both conventions stay pinned, each against its
    own engine-exact twin.

    Scale shape: state is per (user, open-session) and the state store
    shards on user_id. This registered query carries NO watermark and is
    drained in COMPLETE mode — deliberately: it drains a finite corpus
    and compares against a batch oracle, and in append mode sessions
    ending inside the final watermark horizon would never flush (the
    availableNow drain has no later event to advance the watermark past
    them), reading as missing rows. A real continuous deployment of this
    aggregation MUST add ``.withWatermark("ts", ...)`` and drain in
    append mode so closed sessions emit incrementally and their state
    evicts — complete mode retains every session ever seen, which is
    unbounded on an infinite stream."""
    from pyspark.sql import functions as F

    events = streaming_events(spark, sf_dir)
    return (
        events.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MINUTES} minutes").alias("w"),
            "user_id",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.col("n_events").cast("int").alias("n_events"),
            "value_sum",
        )
    )


def streaming_dedup(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Watermark-scoped streaming deduplication on the event id: emits each
    event once; duplicate arrivals inside the watermark horizon are dropped
    with bounded state (``dropDuplicatesWithinWatermark``)."""
    events = streaming_events(spark, sf_dir).withWatermark("ts", WATERMARK)
    return events.dropDuplicatesWithinWatermark(["event_id"]).select(
        "event_id", "user_id", "event_type"
    )


def streaming_funnel_join(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Stream-stream inner join with watermarks: click -> purchase
    conversions within 60 minutes, the incremental twin of
    ``operators.timeseries.range_join_funnel`` (same output rows).

    Both sides carry event-time watermarks and the join condition bounds
    purchase time relative to click time, which is what lets the state store
    evict: a buffered click older than watermark + 60min can never match a
    future purchase and is dropped. Without the time-range condition the
    join state grows without bound."""
    from pyspark.sql import functions as F

    events = streaming_events(spark, sf_dir)
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
        )
        .withWatermark("click_ts", WATERMARK)
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", WATERMARK)
    )
    from ..operators.timeseries import FUNNEL_WINDOW_MINUTES

    gap = F.col("purchase_ts").cast("double") - F.col("click_ts").cast("double")
    return clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {FUNNEL_WINDOW_MINUTES} MINUTES")
        ),
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        F.round(gap, 6).alias("secs_to_purchase"),
    )


# MUST equal operators.timeseries.SESSION_GAP_MINUTES: the custom
# sessionizer shares its batch oracle with timeseries.sessionize, so a
# divergent copy would surface only as a runtime oracle mismatch in the
# driver gate. A module-level import is impossible here (operators/
# __init__ imports this package to register the stream queries —
# circular), so the equality is pinned by
# tests/test_streaming_constants.py instead; funnel's window constant
# CAN use the import form because it resolves lazily inside the builder.
SESSION_GAP_MINUTES = 30


def streaming_sessionize(
    spark: "SparkSession",
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> "DataFrame":
    """Custom stateful streaming operator: gap-based sessionization via
    ``applyInPandasWithState`` — per-user state (last event time, session
    count) carried across micro-batches, Arrow-batched Python processing.

    Emits the same (event_id, user_id, session_idx) rows as the batch
    ``operators.timeseries.sessionize``, so the DuckDB oracle is shared.
    Gap arithmetic mirrors the batch/oracle form exactly: per-event epoch
    seconds as micros/1e6 in double, then subtracted.

    Scale design: state is per-user (bounded by the active-user set, not the
    event count); the state store shards on the group key so 1000 executors
    each hold 1/1000th of the users. In production the state would also be
    timeout-evicted (``GroupStateTimeout.EventTimeTimeout`` + watermark);
    availableNow test drains never time out.

    Within one micro-batch a group's rows can arrive as several Arrow
    chunks and ``applyInPandasWithState`` does NOT guarantee chunk order,
    so all chunks are concatenated and sorted once before the gap scan —
    sorting each chunk independently would compute gaps across out-of-order
    chunk boundaries. The memory bound is therefore one *group's* rows per
    micro-batch (not one Arrow batch); per-user event counts are bounded in
    practice, and micro-batch sizing (maxFilesPerTrigger / maxBytesPerTrigger)
    is the operational cap. *Across* micro-batches ordering comes from the
    source: the file source delivers files oldest-first, so event-time order
    across batches holds for time-partitioned input (the production layout)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_s = SESSION_GAP_MINUTES * 60

    def assign_sessions(key, pdf_iter, state: GroupState):
        import numpy as np
        import pandas as pd

        last_micros, n_sessions = (
            state.get if state.exists else (None, 0)
        )
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        micros = pdf["ts"].astype("int64").to_numpy() // 1000
        if len(micros):
            # vectorized gap test with the exact arithmetic of the batch
            # operator / oracle: per-event epoch seconds as micros/1e6 in
            # float64, then subtracted. A row-at-a-time Python loop here was
            # ~600k iterations per micro-batch — the whole operator's cost.
            sec = micros / 1e6
            prev = np.empty_like(sec)
            prev[1:] = sec[:-1]
            if last_micros is None:
                new_first = True
            else:
                new_first = (sec[0] - last_micros / 1e6) > gap_s
            new_session = np.empty(len(sec), dtype=bool)
            new_session[0] = new_first
            new_session[1:] = (sec[1:] - prev[1:]) > gap_s
            idx = n_sessions + np.cumsum(new_session)
            n_sessions = int(idx[-1])
            last_micros = int(micros[-1])
            yield pd.DataFrame(
                {
                    "event_id": pdf["event_id"],
                    "user_id": pdf["user_id"],
                    "session_idx": idx.astype("int32"),
                }
            )
        state.update((last_micros, n_sessions))

    events = streaming_events(spark, sf_dir, max_files_per_trigger).select(
        "event_id", "user_id", "ts"
    )
    return events.groupBy("user_id").applyInPandasWithState(
        assign_sessions,
        outputStructType="event_id long, user_id long, session_idx int",
        stateStructType="last_micros long, n_sessions int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_enrich_users(
    spark: "SparkSession",
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> "DataFrame":
    """Stream-static enrichment: live events joined to a precomputed
    per-user profile table (first-activity cohort day) — the canonical
    "enrich the stream with a dimension" pattern every production topology
    has, stateless on the stream side.

    Shape: the profile table is user-count-sized, built once in batch and
    materialized eagerly (a stream-static join re-evaluates the static
    side's *plan* every micro-batch — see streaming_decontaminate); the
    equi-join on user_id broadcasts the static side, so each micro-batch
    is one scan + map-side hash join: no stream state, no stream shuffle,
    append mode, and late or out-of-order events enrich identically
    because the dimension is time-invariant. At 100 TB/day the dimension
    either stays broadcast-sized (bounded user set) or the join falls back
    to a user_id-partitioned shuffle that AQE plans per micro-batch."""
    from pyspark.sql import functions as F

    from ..operators.timeseries import _events

    day = F.floor(F.unix_timestamp("ts") / 86400).cast("long")
    profiles = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.min(day).alias("cohort_day"))
        .localCheckpoint(eager=True)
    )
    events = streaming_events(spark, sf_dir, max_files_per_trigger)
    return events.join(F.broadcast(profiles), "user_id").select(
        "event_id",
        "user_id",
        "event_type",
        "cohort_day",
        (day - F.col("cohort_day")).alias("days_since_first"),
    )


STREAM_ENRICH_USERS_SQL = """
WITH cohorts AS (
  SELECT user_id,
         MIN(CAST(FLOOR(epoch(ts) / 86400) AS BIGINT)) AS cohort_day
  FROM events GROUP BY 1
)
SELECT e.event_id, e.user_id, e.event_type, c.cohort_day,
       CAST(FLOOR(epoch(e.ts) / 86400) AS BIGINT) - c.cohort_day
         AS days_since_first
FROM events e JOIN cohorts c USING (user_id)
"""


def run_to_memory_sink(
    stream_df: "DataFrame", output_mode: str = "append", timeout_s: int = 120
) -> "DataFrame":
    """Drain a streaming DataFrame with the ``availableNow`` trigger into an
    in-memory table and return it as a (batch) DataFrame.

    The memory sink materializes every output row on the driver — right for
    small aggregates (and the only built-in sink supporting ``complete``
    mode), wrong for row-per-event outputs: use :func:`run_to_parquet_sink`
    for those. Production sinks are kafka/delta/parquet with checkpoints."""
    name = f"sink_{uuid.uuid4().hex[:12]}"
    query = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = query.awaitTermination(timeout_s)
        if not finished:
            # a partial drain would surface downstream as a baffling oracle
            # mismatch; fail loudly at the actual cause instead
            raise TimeoutError(
                f"availableNow drain did not finish within {timeout_s}s"
            )
    finally:
        query.stop()
    return stream_df.sparkSession.table(name)


#: every parquet-sink dir this process mkdtemps (see run_to_parquet_sink);
#: reaped at interpreter exit — the returned DataFrame reads the dir, so
#: the earliest safe deletion point the helper itself can own is atexit.
#: Callers that drain in a loop (probes, benches) may rmtree entries
#: sooner once they are done with the returned frame.
_SINK_DIRS: list[str] = []


def _cleanup_sink_dirs() -> None:
    """Remove the sink dirs created by this process (atexit; callable
    directly by tests). ignore_errors: a dir a caller already reaped, or
    one still mid-write in a crashing process, must not mask the rest."""
    import shutil

    for d in _SINK_DIRS:
        shutil.rmtree(d, ignore_errors=True)
    del _SINK_DIRS[:]


def run_to_parquet_sink(
    stream_df: "DataFrame", timeout_s: int = 120
) -> "DataFrame":
    """Drain an append-mode streaming DataFrame into a temp parquet sink
    (with checkpoint) and read it back. Rows stay executor-side and
    columnar — draining a 600k-row sessionization this way is ~3x faster
    than the driver-materializing memory sink, and it exercises the sink
    shape production jobs actually use (file sink + checkpointLocation).
    The sink dir (output + checkpoint) is tracked in ``_SINK_DIRS`` and
    removed at interpreter exit — a long sweep of drains previously
    accumulated one orphaned dir per call under /tmp for the OS to reap."""
    import atexit
    import tempfile

    out_dir = tempfile.mkdtemp(prefix="polarify_stream_out_")
    if not _SINK_DIRS:
        # register on first use, once per process (the knn.-index pattern)
        if not getattr(_cleanup_sink_dirs, "_atexit_registered", False):
            atexit.register(_cleanup_sink_dirs)
            _cleanup_sink_dirs._atexit_registered = True
    _SINK_DIRS.append(out_dir)
    query = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = query.awaitTermination(timeout_s)
        if not finished:
            raise TimeoutError(
                f"availableNow drain did not finish within {timeout_s}s"
            )
    finally:
        query.stop()
    return stream_df.sparkSession.read.schema(stream_df.schema).parquet(out_dir)


#: sf_dir -> private JSONL export dir for this process (see
#: streaming_docs_jsonl). Guarded by _JSONL_EXPORT_LOCK.
_JSONL_EXPORT_DIRS: dict[str, str] = {}
_JSONL_EXPORT_LOCK = threading.Lock()

#: files in the JSONL export and files consumed per trigger by the
#: registered drains. 32 files with 8 per trigger keeps the FOUR real
#: micro-batches the continuous-ingest shape wants, but gives every
#: micro-batch 8 input splits instead of 1: a small JSONL file is one
#: scan partition, so the old 4-file/1-per-trigger layout ran each
#: batch's tokenize+gram projection essentially single-threaded (one
#: ~MB-scale file per trigger = one task while 31 threads idled —
#: measured ~5.1 s steady for stream_decontaminate at sf0.1, dominated
#: by that serial scan). This mirrors the real ingest shape too: a
#: corpus drop lands as MANY files and a micro-batch processes its file
#: set across the cluster, never file-serially.
_JSONL_EXPORT_FILES = 32
_JSONL_FILES_PER_TRIGGER = 8


def _docs_jsonl_stream(
    spark: "SparkSession",
    sf_dir: str,
    max_files_per_trigger: int = _JSONL_FILES_PER_TRIGGER,
) -> "DataFrame":
    """(doc_id, lang, text) as a rate-limited JSONL file stream: the
    documents table is exported once per process to a private JSON-lines
    directory (mkdtemp, memoized per sf_dir; ``_JSONL_EXPORT_FILES``
    files so the default ``maxFilesPerTrigger`` yields 4 real
    micro-batches with intra-batch parallelism — see the constants
    above), then read back with ``readStream`` under an explicit schema
    (streaming sources cannot infer)."""
    import tempfile

    from ..sources import write_jsonl

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    # per-process private export dir (mkdtemp: mode 0700, unpredictable
    # name), memoized per sf_dir so repeat calls in a session reuse one
    # export. A fixed md5(sf_dir)-derived path under /tmp was both
    # squattable on multi-user hosts and a write race between concurrent
    # sessions (driver gate + bench + pytest all export the same path).
    # locked check-then-insert (the memo_build contract every other memo
    # in the package follows): two driver threads wanting the same
    # corpus share ONE multi-second export instead of racing to run it
    # twice and orphaning the loser's mkdtemp dir. The lock is held
    # across the export — exports of different corpora serialize too,
    # which is fine for a per-process test/bench fixture.
    with _JSONL_EXPORT_LOCK:
        out_dir = _JSONL_EXPORT_DIRS.get(sf_dir)
        if out_dir is None:
            out_dir = tempfile.mkdtemp(prefix="polarify_docs_jsonl_")
            write_jsonl(
                docs.repartition(_JSONL_EXPORT_FILES),
                out_dir,
                compression="none",
            )
            _JSONL_EXPORT_DIRS[sf_dir] = out_dir

    return (
        spark.readStream.schema("doc_id long, lang string, text string")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(out_dir)
    )


def streaming_decontaminate(
    spark: "SparkSession",
    sf_dir: str,
    max_files_per_trigger: int = _JSONL_FILES_PER_TRIGGER,
) -> "DataFrame":
    """Streaming decontamination gate: documents arriving as a JSONL file
    stream are scored against the *static* eval benchmark's 5-gram set and
    flagged — the continuous-ingest twin of
    ``operators.dedup.docs_decontaminate`` (same gram pipeline, same
    threshold, same output schema; the batch oracle is shared).

    Shape: the per-document gram hashing is a stateless projection on the
    stream; the eval gram set is one static row that rides a broadcast
    into a stream-static equi-join on a constant key — no stream state, no
    stream shuffle, append mode. At 100 TB/day this is the gate new corpus
    drops pass through before they land: the eval set is benchmark-sized
    and static, the stream side scans each micro-batch once."""
    from pyspark.sql import functions as F

    from ..functions import md5_long, whitespace_tokens, word_ngrams
    from ..operators.dedup import (
        DECONTAM_EVAL_MOD,
        DECONTAM_NGRAM,
        DECONTAM_THRESHOLD,
        _decontam_eval_hv,
    )

    # static side: the eval benchmark's distinct hashed 5-grams as one row,
    # materialized — a stream-static join re-evaluates the static side's
    # PLAN every micro-batch, so an un-materialized aggregate here re-runs
    # the whole eval gram pipeline per batch (measured ~1 s x 4
    # micro-batches at sf0.1). Since r19 the materialized row is the
    # per-corpus memo artifact shared with the batch gate (it was
    # re-aggregated and re-checkpointed on every CALL here — ~0.55 s each
    # time at sf0.1); each micro-batch re-scans one memoized row
    eval_hv = _decontam_eval_hv(spark, sf_dir).withColumn("k", F.lit(1))

    raw = _docs_jsonl_stream(spark, sf_dir, max_files_per_trigger)
    with_tokens = raw.where(
        F.col("doc_id") % DECONTAM_EVAL_MOD != 0
    ).select("doc_id", whitespace_tokens(F.col("text")).alias("toks"))
    grams = with_tokens.where(F.size("toks") >= DECONTAM_NGRAM).select(
        "doc_id",
        F.array_distinct(
            F.transform(
                word_ngrams(F.col("toks"), DECONTAM_NGRAM),
                lambda g: md5_long(g, 8),
            )
        ).alias("hv"),
        F.lit(1).alias("k"),
    )
    overlap = F.round(
        F.size(F.array_intersect(F.col("hv"), F.col("eval_hv")))
        / F.size(F.col("hv")),
        6,
    )
    return (
        grams.join(eval_hv, "k")
        .select(
            "doc_id",
            F.size("hv").alias("n_grams"),
            overlap.alias("overlap_frac"),
        )
        .withColumn("contaminated", F.col("overlap_frac") >= DECONTAM_THRESHOLD)
    )


def streaming_docs_jsonl(
    spark: "SparkSession",
    sf_dir: str,
    max_files_per_trigger: int = _JSONL_FILES_PER_TRIGGER,
) -> "DataFrame":
    """Streaming JSONL ingestion — the LLM-corpus interchange format
    arriving as a file stream. The documents table is exported once to an
    uncompressed JSON-lines directory (idempotent per sf_dir; 32 files,
    8 per trigger — 4 real micro-batches, each reading its file set in
    parallel), then read back
    with ``readStream`` under an explicit schema (streaming sources cannot
    infer) and projected to per-document token stats — the stateless
    scan-shaped stage every corpus pipeline starts with.

    At scale this is the continuous-ingest front door: new JSONL drops land
    in the directory, each micro-batch processes only new files, and the
    same projection feeds the downstream dedup/quality operators."""
    from pyspark.sql import functions as F

    from ..functions import whitespace_tokens

    reader = _docs_jsonl_stream(spark, sf_dir, max_files_per_trigger)
    return reader.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars"),
        F.size(whitespace_tokens(F.col("text"))).alias("n_tokens"),
    )
