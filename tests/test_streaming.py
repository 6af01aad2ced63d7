"""Structured Streaming jobs drained with availableNow must agree exactly
with their batch counterparts."""

from __future__ import annotations

from polarify_spark.operators.timeseries import windowed_agg
from polarify_spark.streaming import (
    run_to_memory_sink,
    streaming_dedup,
    streaming_windowed_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_windowed_counts_match_batch(spark):
    stream_out = run_to_memory_sink(
        streaming_windowed_counts(spark, SF_DIR), output_mode="complete"
    )
    batch_out = windowed_agg(spark, SF_DIR)
    assert _rows(stream_out) == _rows(batch_out)


def test_streaming_sessionize_stateful_matches_batch(spark):
    from polarify_spark.operators.timeseries import sessionize
    from polarify_spark.streaming import streaming_sessionize

    stream_out = run_to_memory_sink(streaming_sessionize(spark, SF_DIR))
    batch_out = sessionize(spark, SF_DIR)
    assert _rows(stream_out) == _rows(batch_out)


def test_streaming_funnel_join_matches_batch(spark):
    from polarify_spark.operators.timeseries import range_join_funnel
    from polarify_spark.streaming import streaming_funnel_join

    stream_out = run_to_memory_sink(streaming_funnel_join(spark, SF_DIR))
    batch_out = range_join_funnel(spark, SF_DIR)
    assert _rows(stream_out) == _rows(batch_out)


def test_streaming_queries_match_oracle(spark):
    from polarify_spark.streaming import QUERIES

    from .oracle_harness import compare_query

    for name, (fn, sql) in QUERIES.items():
        compare_query(spark, SF_DIR, fn, sql)


def test_streaming_sessionize_state_survives_multiple_microbatches(spark, tmp_path):
    """Split the events table into 3 time-ordered files and drain with
    maxFilesPerTrigger=1 so applyInPandasWithState runs >= 3 real
    micro-batches: per-user state (last event time, session count) must
    resume across batch boundaries and still reproduce the batch operator
    exactly. The single-file availableNow drain never exercises this path —
    everything arrives in micro-batch 0 and the state resume code is dead."""
    import os

    import pyarrow.parquet as pq

    from polarify_spark.operators.timeseries import sessionize
    from polarify_spark.streaming import streaming_sessionize

    # three time-range slices, written oldest-first with increasing mtimes:
    # the streaming file source picks files up oldest-mtime-first, matching
    # a time-partitioned production layout where late files hold late data
    table = pq.read_table(f"{SF_DIR}/events.parquet")
    table = table.sort_by("ts")
    n = table.num_rows
    cuts = [0, n // 3, 2 * n // 3, n]
    src = tmp_path / "events_split"
    src.mkdir()
    for i in range(3):
        path = src / f"events_{i}.parquet"
        pq.write_table(table.slice(cuts[i], cuts[i + 1] - cuts[i]), path)
        os.utime(path, (1_700_000_000 + i * 1000, 1_700_000_000 + i * 1000))

    stream = streaming_sessionize(spark, str(src), max_files_per_trigger=1)
    out_dir = tmp_path / "out"
    query = (
        stream.writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert query.awaitTermination(120), "drain timed out"
    n_batches = len(
        {p["batchId"] for p in query.recentProgress if p["numInputRows"] > 0}
    )
    query.stop()
    assert n_batches >= 3, f"expected >=3 data micro-batches, got {n_batches}"

    stream_out = spark.read.schema(stream.schema).parquet(str(out_dir))
    batch_out = sessionize(spark, SF_DIR)
    assert _rows(stream_out) == _rows(batch_out)


def _write_events_file(path, rows, mtime):
    """One parquet events file with the driver schema; ``rows`` is
    [(event_id, hour_float)], ts written as TIMESTAMP(NANOS)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    hour_ns = 3600 * 10**9
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([int(r[1] * hour_ns) for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([7] * len(rows), pa.int64()),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def test_watermark_drops_late_data_after_window_emission(spark, tmp_path):
    """The watermark contract that bounds state at scale, demonstrated end
    to end: once the watermark passes a window's end and the window is
    emitted (append mode), a later-arriving event inside that window is
    DROPPED — it neither re-emits the window nor corrupts its count.

    Batch timeline (2 h watermark, 1 h tumbling windows):
      batch 0: on-time event in hour 1, plus hour-10 event -> watermark 8 h
      batch 1: hour-10.5 event; watermark 8 h finalizes + emits window 1
      batch 2: LATE event back in hour 1 (behind the 8.5 h watermark) ->
               dropped, recorded in numRowsDroppedByWatermark
    Note eviction runs at batch END with the post-batch watermark, so the
    late arrival must land a batch AFTER the emission to observe the drop —
    which is also why the hour-1 window's final count stays 1."""
    from pyspark.sql import functions as F

    from polarify_spark.streaming import streaming_events

    src = tmp_path / "late_events"
    src.mkdir()
    _write_events_file(src / "events_0.parquet", [(1, 1.5), (2, 10.0)], 1_700_000_000)
    _write_events_file(src / "events_1.parquet", [(5, 10.5)], 1_700_001_000)
    _write_events_file(
        src / "events_2.parquet", [(3, 1.7), (4, 11.0)], 1_700_002_000
    )

    ev = streaming_events(spark, str(src), max_files_per_trigger=1).withWatermark(
        "ts", "2 hours"
    )
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            F.floor(F.unix_timestamp(F.col("w.start")) / 3600)
            .cast("long")
            .alias("hour_id"),
            "n",
        )
    )
    query = (
        agg.writeStream.format("memory")
        .queryName("late_drop_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert query.awaitTermination(120), "drain timed out"
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in query.recentProgress
        for op in p.get("stateOperators", [])
    )
    query.stop()
    assert dropped == 1, f"expected exactly the late event dropped, got {dropped}"
    emitted = sorted(
        (r["hour_id"], r["n"]) for r in spark.table("late_drop_test").collect()
    )
    # only the finalized hour-1 window is emitted, with the on-time count;
    # hour-10/11 windows stay in (bounded) state because the watermark never
    # passes them before the drain ends
    assert emitted == [(1, 1)], emitted


def test_streaming_dedup_emits_each_event_once(spark):
    from polarify_spark.sources import read_table

    out = run_to_memory_sink(streaming_dedup(spark, SF_DIR))
    rows = out.collect()
    ids = [r["event_id"] for r in rows]
    assert len(ids) == len(set(ids))
    batch_count = read_table(spark, SF_DIR, "events").count()
    assert len(ids) == batch_count


def test_jsonl_ingest_processes_multiple_microbatches(spark, tmp_path):
    """The default trigger sizing over the 32-file JSONL export must yield
    multiple real micro-batches — the continuous-ingest shape, not one
    bulk read (r10: 8 files per trigger -> 4 batches, each batch reading
    its file set in parallel instead of one file serially)."""
    from polarify_spark.streaming import streaming_docs_jsonl

    stream_df = streaming_docs_jsonl(spark, "/root/testdata/sf0.001")
    query = (
        stream_df.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert query.awaitTermination(120)
    finally:
        query.stop()
    batches = [
        p for p in query.recentProgress if p["numInputRows"] > 0
    ]
    assert len(batches) >= 2, [p["numInputRows"] for p in query.recentProgress]
    total = sum(p["numInputRows"] for p in batches)
    assert total == 500


def test_streaming_decontaminate_matches_batch(spark):
    """The stream-static decontamination gate must emit exactly the batch
    operator's rows — same gram pipeline, same threshold, incremental
    execution over rate-limited micro-batches."""
    from polarify_spark.operators.dedup import docs_decontaminate
    from polarify_spark.streaming import run_to_parquet_sink, streaming_decontaminate

    stream_out = run_to_parquet_sink(streaming_decontaminate(spark, SF_DIR))
    batch_out = docs_decontaminate(spark, SF_DIR)
    assert _rows(stream_out) == _rows(batch_out)


def test_file_sink_checkpoint_restart_is_exactly_once(spark, tmp_path):
    """The production contract of the checkpointed file sink: re-running a
    drained query over the same checkpoint re-processes NOTHING, and a file
    arriving between runs is processed exactly once — restart-resume
    semantics, not at-least-once."""
    from pyspark.sql import functions as F

    from polarify_spark.sources import event_time_reader, normalize_event_ts

    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    with event_time_reader(spark):
        events = spark.read.option("pathGlobFilter", "events*.parquet").parquet(
            SF_DIR
        )
        half_a = events.where(F.col("event_id") % 2 == 0)
        half_b = events.where(F.col("event_id") % 2 == 1)
        n_a, n_b = half_a.count(), half_b.count()
        half_a.coalesce(1).write.parquet(str(src / "stage_a"))
        ts_ddl = events.schema["ts"].dataType.simpleString()
    import shutil

    part = next((src / "stage_a").glob("part-*.parquet"))
    shutil.move(str(part), str(src / "events_a.parquet"))
    shutil.rmtree(src / "stage_a")

    schema = (
        f"event_id long, ts {ts_ddl}, user_id long, event_type string, "
        "value double, props string"
    )

    def drain():
        with event_time_reader(spark):
            stream = (
                spark.readStream.schema(schema)
                .option("pathGlobFilter", "events*.parquet")
                .format("parquet")
                .load(str(src))
            )
        q = (
            normalize_event_ts(stream)
            .select("event_id", "event_type")
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        q.stop()
        return spark.read.parquet(str(out))

    first = drain()
    assert first.count() == n_a

    # restart over the SAME checkpoint with no new input: nothing reruns
    again = drain()
    assert again.count() == n_a

    # a file that arrives between restarts is processed exactly once
    with event_time_reader(spark):
        half_b = spark.read.option("pathGlobFilter", "events*.parquet").parquet(
            SF_DIR
        ).where(F.col("event_id") % 2 == 1)
        half_b.coalesce(1).write.parquet(str(src / "stage_b"))
    part = next((src / "stage_b").glob("part-*.parquet"))
    shutil.move(str(part), str(src / "events_b.parquet"))
    shutil.rmtree(src / "stage_b")

    final = drain()
    assert final.count() == n_a + n_b
    assert final.select("event_id").distinct().count() == n_a + n_b
