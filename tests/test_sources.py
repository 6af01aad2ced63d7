"""Source/catalog behaviors: the nanos-timestamp legacy conf must be scoped
to the read that needs it, not leak into the session."""

from __future__ import annotations

import pytest

from polarify_spark.sources import nanos_as_long, read_table

SF_DIR = "/root/testdata/sf0.001"

_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def test_events_read_does_not_leak_nanos_conf(spark):
    """Reading events (which needs nanosAsLong) must leave the session conf
    exactly as it was: a later parquet read in the same session must not
    silently see legacy nanos semantics."""
    before = spark.conf.get(_CONF)
    events = read_table(spark, SF_DIR, "events")
    assert spark.conf.get(_CONF) == before
    # the returned frame stays executable after the conf restore (schema is
    # captured at read time)
    assert events.count() > 0
    assert spark.conf.get(_CONF) == before
    # a non-events read right after is unaffected and sees its native types
    orders = read_table(spark, SF_DIR, "orders")
    assert dict(orders.dtypes)["o_orderdate"] == "timestamp_ntz"
    assert orders.count() > 0


def test_nanos_scope_restores_on_error(spark):
    before = spark.conf.get(_CONF)
    with pytest.raises(RuntimeError):
        with nanos_as_long(spark):
            assert spark.conf.get(_CONF) == "true"
            raise RuntimeError("boom")
    assert spark.conf.get(_CONF) == before


def test_csv_roundtrip_with_explicit_schema(spark, tmp_path):
    from pyspark.sql import functions as F

    from polarify_spark.sources import read_csv, write_csv

    src = (
        spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
        .select("n_nationkey", "n_name", "n_regionkey")
    )
    path = str(tmp_path / "nation_csv")
    write_csv(src, path)
    back = read_csv(
        spark, path, "n_nationkey int, n_name string, n_regionkey int"
    )
    # compare names+types; nullability flags differ between parquet
    # metadata and a declared DDL schema
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in src.schema
    ]
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_jsonl_roundtrip_with_explicit_schema(spark, tmp_path):
    from polarify_spark.sources import read_jsonl, write_jsonl

    src = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "lang", "n_chars")
    )
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(src, path)
    back = read_jsonl(spark, path, "doc_id bigint, lang string, n_chars bigint")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_text_readers_require_schema(spark):
    import pytest as _pytest

    from polarify_spark.sources import read_csv, read_jsonl

    with _pytest.raises(ValueError, match="explicit DDL schema"):
        read_csv(spark, "/tmp/nope", "")
    with _pytest.raises(ValueError, match="explicit DDL schema"):
        read_jsonl(spark, "/tmp/nope", "")


def test_csv_failfast_rejects_malformed_rows(spark, tmp_path):
    import pytest as _pytest

    from polarify_spark.sources import read_csv

    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "part-00000.csv").write_text("a,b\n1,2\nnot_a_number,3\n")
    df = read_csv(spark, str(bad), "a bigint, b bigint")
    with _pytest.raises(Exception):  # SparkException: Malformed records (FAILFAST)
        df.collect()


def test_csv_roundtrip_preserves_null_vs_empty_string(spark, tmp_path):
    """SQL NULL and empty string must survive a CSV round-trip as distinct
    values — the write side emits \\N for NULL and "" for empty, the read
    side maps them back."""
    from polarify_spark.sources import read_csv, write_csv

    src = spark.createDataFrame(
        [(1, "a"), (2, None), (3, ""), (4, "\\N-lookalike")],
        "id int, s string",
    )
    path = str(tmp_path / "nulls")
    write_csv(src, path)
    back = read_csv(spark, path, "id int, s string")
    got = {r["id"]: r["s"] for r in back.collect()}
    assert got == {1: "a", 2: None, 3: "", 4: "\\N-lookalike"}


def test_csv_roundtrip_preserves_null_sentinel_lookalikes(spark, tmp_path):
    """A data value that IS the \\N null sentinel (or its escaped forms)
    must survive the round-trip as itself, not collapse to SQL NULL — the
    writer shields the whole ^\\\\+N$ class with one extra backslash and
    the reader strips it (bijective, so pre-escaped values survive too)."""
    from polarify_spark.sources import read_csv, write_csv

    rows = [
        (1, None),
        (2, ""),
        (3, "\\N"),
        (4, "\\\\N"),
        (5, "\\\\\\N"),
        (6, "\\Nx"),
        (7, "x\\N"),
        (8, "N"),
        (9, "\\"),
    ]
    src = spark.createDataFrame(rows, "id int, s string")
    path = str(tmp_path / "sentinels")
    write_csv(src, path)
    back = read_csv(spark, path, "id int, s string")
    got = {r["id"]: r["s"] for r in back.collect()}
    assert got == dict(rows)


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    """ORC round-trips values and types without a schema argument (it
    carries its own), and the ORC scan reports pushed filters like the
    parquet reader does — the columnar-interchange contract."""
    from pyspark.sql import functions as F

    from polarify_spark.plans import pushed_filters
    from polarify_spark.sources import read_orc, write_orc

    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    path = str(tmp_path / "orders_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in src.schema
    ]
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))

    pushed = pushed_filters(back.where(F.col("o_orderkey") < 100))
    assert any("o_orderkey" in p for p in pushed), pushed


def test_compact_parquet_merges_small_files(spark, tmp_path):
    from pyspark.sql import functions as F

    from polarify_spark.sources import compact_parquet

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    frag = str(tmp_path / "fragmented")
    # simulate micro-batch decay: 20 tiny files
    docs.repartition(20).write.parquet(frag)
    out = str(tmp_path / "compacted")
    audit = compact_parquet(spark, frag, out, target_file_bytes=1 << 30)
    assert audit["files_before"] == 20
    assert audit["files_after"] == 1
    assert audit["rows"] == docs.count()
    # content identical, not just counted
    a = sorted(tuple(r) for r in docs.select("doc_id", F.md5("text")).collect())
    b = sorted(
        tuple(r)
        for r in spark.read.parquet(out).select("doc_id", F.md5("text")).collect()
    )
    assert a == b


def test_compact_parquet_refuses_in_place_even_across_uri_spellings(
    spark, tmp_path
):
    """The never-rewrites-in-place guard must compare fully qualified
    Hadoop URIs, so 'file:///x' and '/x' (two spellings of one dataset)
    are caught, not just bytewise-equal strings."""
    import pytest

    from polarify_spark.sources import compact_parquet

    src = str(tmp_path / "ds")
    spark.range(10).write.parquet(src)
    for alias in (src, f"file://{src}"):
        with pytest.raises(ValueError, match="never rewrites in place"):
            compact_parquet(spark, src, alias)
