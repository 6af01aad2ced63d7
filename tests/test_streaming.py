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


def test_streaming_dedup_emits_each_event_once(spark):
    out = run_to_memory_sink(streaming_dedup(spark, SF_DIR))
    rows = out.collect()
    ids = [r["event_id"] for r in rows]
    assert len(ids) == len(set(ids))
    batch_count = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert len(ids) == batch_count
