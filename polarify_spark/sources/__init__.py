"""Typed readers for the driver testdata tables and a view catalog.

The reference (Quantco/polarify) has no sources/sinks of its own — users
reach storage through the host engine (`/root/reference/README.md:96-118`);
SURVEY.md section 2.5 records the absence. This package is therefore thin by
design: declarative `spark.read` accessors that keep Catalyst in charge of
partition discovery, predicate pushdown, and column pruning, plus a catalog
that registers every table as a temp view so the whole surface is reachable
from `spark.sql(...)` too.

Scale notes baked into the accessors:

* parquet is the storage format — splittable, columnar, statistics-bearing;
  the scan prunes row groups from pushed filters and reads only referenced
  columns. CSV / JSON-lines / ORC are supported as interchange formats
  (`read_csv` / `read_jsonl` / `write_csv` / `write_jsonl`) with explicit
  DDL schemas REQUIRED — schema inference is a second full scan with
  per-run type guesses — and FAILFAST parsing by default.
* no `.cache()` here — callers decide; caching a 100 TB scan is a bug.
* the events reader owns the `ts` normalization (legacy TIMESTAMP(NANOS)
  nano longs per SPARK-40819, or TIMESTAMP_MICROS instants) so every
  consumer sees one canonical microsecond `ts`.
"""

from __future__ import annotations

from .catalog import (
    TABLES,
    event_time_reader,
    nanos_as_long,
    normalize_event_ts,
    read_csv,
    read_jsonl,
    read_orc,
    read_table,
    register_views,
    write_bucketed,
    write_csv,
    write_jsonl,
    write_orc,
    write_partitioned,
    compact_parquet,
)

__all__ = [
    "TABLES",
    "compact_parquet",
    "event_time_reader",
    "nanos_as_long",
    "normalize_event_ts",
    "read_csv",
    "read_jsonl",
    "read_orc",
    "read_table",
    "register_views",
    "write_bucketed",
    "write_csv",
    "write_jsonl",
    "write_orc",
    "write_partitioned",
]
