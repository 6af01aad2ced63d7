"""Table accessors + view registration for the testdata layout
(``<sf_dir>/<table>.parquet``; schemas in TESTDATA.md / FIXTURES.md)."""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import TYPE_CHECKING, Iterator, Sequence

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"
_NTZ_CONF = "spark.sql.parquet.inferTimestampNTZ.enabled"

#: serializes every scoped session-conf mutation in this process: session
#: conf is session-global, so without the lock a concurrent driver thread's
#: parquet read inside someone else's scope would silently pick up the
#: override (or two overlapping scopes could restore each other's values).
#: Reentrant so scoped blocks can nest. Held for the whole block — the
#: protected region is reader *construction*; executing the returned
#: DataFrame afterwards is safe and runs outside the lock.
CONF_SCOPE_LOCK = threading.RLock()


@contextmanager
def _scoped_confs(spark: "SparkSession", overrides: dict[str, str]) -> "Iterator[None]":
    """Scope session-conf overrides to a block, restoring prior values.

    The parquet reader captures the schema at ``.parquet()`` time, so a
    DataFrame read inside the block stays executable after the conf is
    restored, while parquet reads *outside* the block see the session's own
    setting — no silent session-wide behavior flip from calling a reader
    (pinned by ``tests/test_sources.py``).

    Serialized across driver threads via :data:`CONF_SCOPE_LOCK` — but only
    against other scoped blocks: an unrelated thread doing a bare
    ``spark.read.parquet`` concurrently still sees the override (session
    conf is global; route such reads through these accessors)."""
    conf = spark.conf
    with CONF_SCOPE_LOCK:
        prev = {k: conf.get(k) for k in overrides}
        for k, v in overrides.items():
            conf.set(k, v)
        try:
            yield
        finally:
            for k, v in prev.items():
                conf.set(k, v)


@contextmanager
def nanos_as_long(spark: "SparkSession") -> "Iterator[None]":
    """Scope ``spark.sql.legacy.parquet.nanosAsLong=true`` to a block."""
    with _scoped_confs(spark, {_NANOS_CONF: "true"}):
        yield


@contextmanager
def event_time_reader(spark: "SparkSession") -> "Iterator[None]":
    """Scope the conf pair that makes ``events.ts`` read deterministically
    whatever physical type the generator used for it:

    - parquet TIMESTAMP(NANOS) (no native Spark type, SPARK-40819) reads as
      a nano ``long`` via ``nanosAsLong`` — callers convert with integer
      division (double math would lose precision above 2^53 ns);
    - parquet TIMESTAMP_MICROS with ``isAdjustedToUTC=false`` reads as
      ``TimestampType`` (an instant carrying the stored micros verbatim)
      instead of TIMESTAMP_NTZ, by disabling NTZ inference. This matches
      DuckDB's ``epoch()``/``epoch_us()`` on the same file **independently
      of spark.sql.session.timeZone** — an NTZ read would need a
      session-tz-dependent cast to become an instant.
    """
    with _scoped_confs(spark, {_NANOS_CONF: "true", _NTZ_CONF: "false"}):
        yield


def normalize_event_ts(df: "DataFrame") -> "DataFrame":
    """Normalize an ``events`` frame read under :func:`event_time_reader` so
    ``ts`` is a microsecond-precision ``TimestampType`` instant:

    - nano ``long`` (legacy TIMESTAMP(NANOS) files) → ``timestamp_micros(ts
      div 1000)``;
    - ``TimestampType`` (TIMESTAMP_MICROS files) → already the instant, no-op.

    Raises on any other ``ts`` type rather than guessing — a TIMESTAMP_NTZ
    here means the read skipped :func:`event_time_reader` and downstream
    epoch math would silently depend on the session time zone."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampType

    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, TimestampType):
        return df
    raise TypeError(
        f"events.ts read as {ts_type}; expected nano long or timestamp — "
        "was the read wrapped in event_time_reader()?"
    )

#: every table the driver generates, in FK-dependency order.
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: "SparkSession", sf_dir: str, table: str) -> "DataFrame":
    """Read one testdata table; source of truth for per-table normalization.

    ``events.ts`` has changed physical type across generator versions
    (TIMESTAMP(NANOS) → TIMESTAMP_MICROS); :func:`event_time_reader` +
    :func:`normalize_event_ts` handle both, yielding the same
    microsecond-instant ``TimestampType`` column either way.
    """
    if table not in TABLES:
        raise ValueError(f"unknown table {table!r}; expected one of {TABLES}")
    if table == "events":
        with event_time_reader(spark):
            df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return normalize_event_ts(df)
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def register_views(
    spark: "SparkSession", sf_dir: str, tables: Sequence[str] = TABLES
) -> None:
    """Register each table as a temp view so ``spark.sql`` reaches the same
    data the DataFrame operators do (and with the same normalization)."""
    for table in tables:
        read_table(spark, sf_dir, table).createOrReplaceTempView(table)


def write_partitioned(
    df: "DataFrame",
    path: str,
    partition_by: Sequence[str] = (),
    max_records_per_file: int = 1_000_000,
) -> None:
    """Parquet sink with the two knobs that matter at scale: directory
    partitioning on low-cardinality keys (readers prune partitions from
    WHERE clauses) and a per-file record cap (bounds file size so downstream
    scans split evenly; prevents the one-giant-file antipattern the testdata
    itself exhibits)."""
    writer = df.write.mode("overwrite").option(
        "maxRecordsPerFile", max_records_per_file
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: "DataFrame",
    table: str,
    bucket_by: Sequence[str],
    n_buckets: int,
) -> None:
    """Save as a bucketed (+ sorted) parquet table in the session catalog.

    Two tables bucketed by the same keys into the same bucket count join
    WITHOUT a shuffle — each task reads matching bucket files from both
    sides. At 100 TB this is how repeatedly-joined tables (fact + its
    biggest dims, or two co-keyed facts) amortize their shuffle: pay it
    once at write time, never at read time. The sortBy lets the sort-merge
    join skip its sort as well."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_by)
        .sortBy(*bucket_by)
        .saveAsTable(table)
    )


def compact_parquet(
    spark: "SparkSession",
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Small-file compaction — the table-maintenance job every streaming /
    incremental-append pipeline needs: a file-per-micro-batch layout decays
    into thousands of tiny files whose open/footer overhead dominates scan
    time at 100 TB. Rewrites the dataset into ``ceil(total_bytes /
    target_file_bytes)`` files and returns the before/after audit
    ``{"files_before", "files_after", "bytes_before", "rows"}``.

    Never rewrites in place: readers of ``path`` stay consistent while the
    compacted copy lands at ``out_path``; the atomic swap (rename, catalog
    repoint, or partition overwrite) is the caller's platform-specific
    final step. Sizing uses the Hadoop FileSystem listing, so it works on
    any scheme Spark can read (file://, hdfs://, s3a://); ``coalesce``
    (not ``repartition``) merges files without a shuffle."""
    import math

    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hadoop_path = jvm.org.apache.hadoop.fs.Path(path)
    # in-place guard on the FULLY QUALIFIED Hadoop URIs, not raw strings:
    # path arguments may be URIs on any scheme (file://, hdfs://, s3a://),
    # so 'file:///data/t' and '/data/t' — or an hdfs path with and without
    # the port — must compare equal. makeQualified resolves scheme,
    # authority, and working directory on both sides the same way the scan
    # and the writer will.
    out_hadoop_path = jvm.org.apache.hadoop.fs.Path(out_path)
    in_fs = hadoop_path.getFileSystem(jsc.hadoopConfiguration())
    out_fs = out_hadoop_path.getFileSystem(jsc.hadoopConfiguration())
    qualified_in = in_fs.makeQualified(hadoop_path).toString()
    qualified_out = out_fs.makeQualified(out_hadoop_path).toString()
    if qualified_in == qualified_out:
        raise ValueError(
            "compact_parquet never rewrites in place: out_path must differ "
            f"from path (both resolve to {qualified_in!r}). "
            "mode('overwrite') on a dataset being lazily read would fail "
            "mid-write or corrupt the source."
        )
    total = 0
    n_files = 0
    it = in_fs.listFiles(hadoop_path, True)
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if name.endswith(".parquet"):
            total += status.getLen()
            n_files += 1
    df = spark.read.parquet(path)
    n_out = max(1, math.ceil(total / target_file_bytes))
    df.coalesce(n_out).write.mode("overwrite").parquet(out_path)
    rows = spark.read.parquet(out_path).count()
    files_after = len(spark.read.parquet(out_path).inputFiles())
    return {
        "files_before": n_files,
        "files_after": files_after,
        "bytes_before": total,
        "rows": rows,
    }


#: values that collide with (or could be mistaken for) the \N null sentinel:
#: one or more backslashes followed by N, the whole value.
_CSV_SENTINEL_RE = r"^\\+N$"


def _csv_shield_sentinels(df: "DataFrame") -> "DataFrame":
    """Bijectively escape string values that would collide with the ``\\N``
    null sentinel: the literal value ``\\N`` would otherwise be written
    unquoted and read back as SQL NULL (quoting does not help — the reader
    matches ``nullValue`` after unquoting/unescaping). Prepending one
    backslash to every value of the form ``\\...\\N`` keeps the whole class
    collision-free and invertible (``\\N`` -> ``\\\\N``, ``\\\\N`` ->
    ``\\\\\\N``, ...); :func:`_csv_unshield_sentinels` strips it on read."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    for f in df.schema.fields:
        if isinstance(f.dataType, StringType):
            c = F.col(f.name)
            df = df.withColumn(
                f.name,
                F.when(
                    c.rlike(_CSV_SENTINEL_RE), F.concat(F.lit("\\"), c)
                ).otherwise(c),
            )
    return df


def _csv_unshield_sentinels(df: "DataFrame") -> "DataFrame":
    """Inverse of :func:`_csv_shield_sentinels`: a non-null ``\\...\\N``
    value can only come from a shielded write, so drop its first
    backslash."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    for f in df.schema.fields:
        if isinstance(f.dataType, StringType):
            c = F.col(f.name)
            df = df.withColumn(
                f.name,
                F.when(
                    c.rlike(_CSV_SENTINEL_RE), c.substr(F.lit(2), F.length(c))
                ).otherwise(c),
            )
    return df


def read_csv(
    spark: "SparkSession",
    path: str,
    schema: str,
    header: bool = True,
    **options: str,
) -> "DataFrame":
    """CSV source with a REQUIRED explicit schema.

    Schema inference on CSV is a full extra pass over the data — at 100 TB
    that is a second scan before the first useful one — and silently guesses
    types per-run, so this reader refuses to infer: pass a DDL string
    (``"a bigint, b string"``). mode=FAILFAST by default so a malformed row
    fails the job instead of becoming silent nulls (override with
    ``mode="PERMISSIVE"`` plus ``columnNameOfCorruptRecord`` when quarantine
    semantics are wanted)."""
    if not schema:
        raise ValueError(
            "read_csv requires an explicit DDL schema; schema inference "
            "would rescan the input and guess types per-run"
        )
    reader = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", options.pop("mode", "FAILFAST"))
        # mirror write_csv: distinguish SQL NULL (\\N) from empty string —
        # the classic CSV round-trip data-loss bug
        .option("nullValue", options.pop("nullValue", "\\N"))
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return _csv_unshield_sentinels(reader.csv(path))


def write_csv(
    df: "DataFrame",
    path: str,
    header: bool = True,
    compression: str = "gzip",
    max_records_per_file: int = 1_000_000,
) -> None:
    """CSV sink: compressed and file-size-capped by default. CSV is an
    interchange format, not a storage format — no column pruning, no
    predicate pushdown, no types — so keep parquet for anything re-read by
    Spark and reserve this for exports."""
    (
        _csv_shield_sentinels(df)
        .write.mode("overwrite")
        .option("header", str(header).lower())
        .option("compression", compression)
        .option("maxRecordsPerFile", max_records_per_file)
        # emit SQL NULL as \\N and empty string as a quoted "" token, so
        # read_csv (nullValue=\\N, default emptyValue) maps both back
        # losslessly — an unquoted empty field would read as null; data
        # values that ARE the sentinel are shielded (see
        # _csv_shield_sentinels) so they survive the round-trip too
        .option("nullValue", "\\N")
        .option("emptyValue", '""')
        .csv(path)
    )


def read_jsonl(
    spark: "SparkSession",
    path: str,
    schema: str,
    **options: str,
) -> "DataFrame":
    """JSON-lines source with a REQUIRED explicit schema (same rationale as
    :func:`read_csv`: inference is an extra full scan with per-run type
    guesses; FAILFAST so corrupt lines fail loudly). Nested fields are
    expressed in the DDL string (``"a bigint, props struct<k:string>"``)."""
    if not schema:
        raise ValueError(
            "read_jsonl requires an explicit DDL schema; schema inference "
            "would rescan the input and guess types per-run"
        )
    reader = spark.read.schema(schema).option(
        "mode", options.pop("mode", "FAILFAST")
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def write_jsonl(
    df: "DataFrame",
    path: str,
    compression: str = "gzip",
    max_records_per_file: int = 1_000_000,
) -> None:
    """JSON-lines sink (one JSON object per line — the LLM-corpus
    interchange format). Same caveats as :func:`write_csv`."""
    (
        df.write.mode("overwrite")
        .option("compression", compression)
        .option("maxRecordsPerFile", max_records_per_file)
        .json(path)
    )


def read_orc(spark: "SparkSession", path: str) -> "DataFrame":
    """ORC source — the columnar interchange with Hive-ecosystem producers.
    Like parquet (and unlike CSV/JSONL), ORC carries its own types and
    supports column pruning and predicate pushdown, so no schema argument
    is required; the plan-shape guarantees the parquet reader enjoys apply
    here too (Spark's OrcScan reports PushedFilters the same way)."""
    return spark.read.orc(path)


def write_orc(
    df: "DataFrame",
    path: str,
    compression: str = "zlib",
    max_records_per_file: int = 1_000_000,
) -> None:
    """ORC sink, compressed and file-size-capped like the other sinks.
    Keep parquet as the primary storage format (the whole testdata and
    bucketing surface is parquet); use ORC only when a Hive-side consumer
    requires it."""
    (
        df.write.mode("overwrite")
        .option("compression", compression)
        .option("maxRecordsPerFile", max_records_per_file)
        .orc(path)
    )
