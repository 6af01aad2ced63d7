"""Skew-handling primitives: salted joins and salted two-phase aggregation.

At 100 TB a handful of hot keys (a viral document, a bot user id, a null
bucket) can pin an entire stage on one executor: a shuffle hash-partitions
by key, so one key = one task no matter how many rows it has. The two
standard remedies, exposed here as reusable operators whose *outputs are
bit-identical to their unsalted equivalents* (and oracle-checked as such):

* ``salted_join(big, small, key, n_salts)`` — the big side gets a
  deterministic salt in [0, n_salts); the small side is replicated once per
  salt value; the join key becomes (key, salt), splitting each hot key's
  rows across ``n_salts`` tasks. Replication costs n_salts x |small|, which
  is the explicit trade against per-key parallelism. (AQE's
  ``skewJoinEnabled`` automates the same split post-hoc when statistics
  reveal the skew; explicit salting is for when you know the key
  distribution up front, and composes with bucketing where AQE cannot.)
* ``salted_aggregate`` — aggregate on (key, salt) first (splits the hot
  key's rows), then re-aggregate on key. Only sound for algebraic
  aggregates that decompose (count -> sum of counts, sum -> sum, min/max ->
  min/max); Spark's own map-side partial aggregation does the same split
  per input partition, so explicit salting only wins when a single key
  overflows the *reduce* side — i.e. dominates entire partitions.

The reference (Quantco/polarify) has no join/agg surface at all (SURVEY.md
section 2.5); this module exists for the 100 TB north star.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Callable

if TYPE_CHECKING:
    from pyspark.sql import Column, DataFrame, SparkSession

N_SALTS = 8


def salt_column(
    salt_source: "Column | str | None", n_salts: int = N_SALTS
) -> "Column":
    """The salt expression in [0, n_salts): a hash of ``salt_source`` when
    given (deterministic — stable across replays, required for the oracle
    checks), else a round-robin over the row id. The round-robin is NOT
    replay-stable (row ids depend on partitioning) but always spreads a hot
    key — and join/agg equality with the unsalted form never depends on
    *which* salt a row gets, only that the small side is replicated to all
    of them."""
    from pyspark.sql import functions as F

    if salt_source is None:
        return F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    return F.pmod(F.xxhash64(salt_source), F.lit(n_salts)).cast("int")


def salted_join(
    big: "DataFrame",
    small: "DataFrame",
    key: str,
    n_salts: int = N_SALTS,
    salt_source: "Column | str | None" = None,
) -> "DataFrame":
    """Inner-join ``big`` to ``small`` on ``key`` with an ``n_salts``-way
    salt. Output equals ``big.join(small, key)`` exactly.

    ``salt_source`` picks the salt input: pass a unique-ish column (e.g.
    ``salt_source="event_id"``) for a deterministic, replay-stable salt; the
    default derives a round-robin salt from the row id, which always spreads
    hot keys. (Hashing the join key itself would assign every row of a hot
    key the SAME salt — zero skew relief — so that is deliberately not the
    fallback.)
    """
    from pyspark.sql import functions as F

    big_salted = big.withColumn("_salt", salt_column(salt_source, n_salts))
    small_rep = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_salted.join(small_rep, [key, "_salt"]).drop("_salt")


def salted_aggregate(
    df: "DataFrame",
    key: str,
    salt_source: "Column | str",
    n_salts: int = N_SALTS,
) -> "DataFrame":
    """count(*) + sum-decomposable aggregates per ``key`` via (key, salt)
    pre-aggregation. Output equals the direct groupBy exactly."""
    from pyspark.sql import functions as F

    partial = (
        df.withColumn("_salt", salt_column(salt_source, n_salts))
        .groupBy(key, "_salt")
        .agg(
            F.count("*").alias("_n"),
            F.sum("value").alias("_sum"),
            F.min("value").alias("_min"),
            F.max("value").alias("_max"),
        )
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n_rows"),
        F.round(F.sum("_sum"), 4).alias("value_sum"),
        F.round(F.min("_min"), 4).alias("value_min"),
        F.round(F.max("_max"), 4).alias("value_max"),
    )


# --- driver-contract queries ------------------------------------------------


def _events(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    from ..sources import read_table

    return read_table(spark, sf_dir, "events")


def skew_salted_join(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Events joined to each user's order profile (count + total spend from
    ``orders``) through the salted join; oracle is the plain SQL join."""
    from pyspark.sql import functions as F

    events = _events(spark, sf_dir).select("event_id", "user_id", "event_type")
    user_orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy(F.col("o_custkey").alias("user_id"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_spend"),
        )
    )
    return salted_join(
        events, user_orders, "user_id", salt_source="event_id"
    ).select("event_id", "user_id", "event_type", "n_orders", "total_spend")


SKEW_SALTED_JOIN_SQL = """
WITH uo AS (
  SELECT o_custkey AS user_id, COUNT(*) AS n_orders,
         ROUND(SUM(o_totalprice), 4) AS total_spend
  FROM orders GROUP BY 1
)
SELECT e.event_id, e.user_id, e.event_type, uo.n_orders, uo.total_spend
FROM events e JOIN uo USING (user_id)
"""


def skew_salted_agg(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Per-user event statistics through the salted two-phase aggregation;
    oracle is the direct GROUP BY."""
    events = _events(spark, sf_dir)
    return salted_aggregate(events, "user_id", "event_id")


SKEW_SALTED_AGG_SQL = """
SELECT user_id, COUNT(*) AS n_rows,
       ROUND(SUM(value), 4) AS value_sum,
       ROUND(MIN(value), 4) AS value_min,
       ROUND(MAX(value), 4) AS value_max
FROM events GROUP BY 1
"""


QUERIES: dict[str, tuple[Callable, str]] = {
    "skew_salted_join": (skew_salted_join, SKEW_SALTED_JOIN_SQL),
    "skew_salted_agg": (skew_salted_agg, SKEW_SALTED_AGG_SQL),
}
