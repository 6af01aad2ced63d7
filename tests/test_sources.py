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
