"""Structured Streaming counterparts of the batch operators.

The same expression graphs as ``operators.timeseries`` / ``operators.dedup``
run incrementally under Structured Streaming: ``readStream`` over a parquet
directory, event-time watermarks for late data, windowed aggregation, and
watermark-scoped streaming deduplication. Tests drive them with the
``availableNow`` trigger and assert exact agreement with the batch results.

Scale design: the streaming windowed aggregation keeps per-(window, type)
partial state in the state store; the watermark bounds state size by
evicting windows older than the horizon. ``dropDuplicatesWithinWatermark``
similarly bounds the dedup key set — without a watermark, streaming dedup
state grows without bound at 100 TB/day ingest.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from .jobs import (
    run_to_memory_sink,
    streaming_dedup,
    streaming_events,
    streaming_windowed_counts,
)

__all__ = [
    "streaming_events",
    "streaming_windowed_counts",
    "streaming_dedup",
    "run_to_memory_sink",
]
