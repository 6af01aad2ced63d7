"""Salted join / aggregation must be bit-identical to their unsalted
equivalents (and to the DuckDB oracle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polarify_spark.operators.skew import QUERIES, salt_column, salted_join

from .oracle_harness import compare_query

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", list(QUERIES), ids=list(QUERIES))
def test_skew_operator_matches_oracle(spark, name):
    fn, sql = QUERIES[name]
    compare_query(spark, SF_DIR, fn, sql)


def test_salted_join_equals_plain_join(spark):
    from polarify_spark.sources import read_table

    events = read_table(spark, SF_DIR, "events").select("event_id", "user_id")
    dim = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy(F.col("o_custkey").alias("user_id"))
        .agg(F.count("*").alias("n"))
    )
    salted = salted_join(events, dim, "user_id", salt_source="event_id")
    plain = events.join(dim, "user_id")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_default_salt_spreads_a_hot_key(spark):
    """With no salt_source, a single hot key must still spread across >= 2
    salts (the old default hashed the join key itself, which put every row
    of a hot key in ONE salt — zero skew relief, silently)."""
    hot = spark.range(1000).select(
        F.lit(7).alias("user_id"), F.col("id").alias("payload")
    )
    spread = (
        hot.withColumn("_salt", salt_column(None, 8))
        .groupBy("user_id", "_salt")
        .count()
        .collect()
    )
    assert len(spread) >= 2, spread


def test_salted_join_with_default_salt_equals_plain_join(spark):
    hot = spark.range(500).select(
        F.lit(7).alias("user_id"), F.col("id").alias("payload")
    )
    dim = spark.range(10).select(
        F.col("id").alias("user_id"), (F.col("id") * 2).alias("attr")
    )
    salted = salted_join(hot, dim, "user_id")  # default round-robin salt
    plain = hot.join(dim, "user_id")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salt_actually_splits_keys(spark):
    """Every salt value must receive rows — the split is real, not
    degenerate (a constant salt would silently reintroduce the hot key)."""
    from polarify_spark.sources import read_table

    events = read_table(spark, SF_DIR, "events")
    salts = (
        events.withColumn("_salt", F.pmod(F.xxhash64("event_id"), F.lit(8)))
        .groupBy("_salt")
        .count()
        .collect()
    )
    assert len(salts) == 8
    counts = [r["count"] for r in salts]
    assert min(counts) > 0.5 * max(counts)  # roughly uniform
