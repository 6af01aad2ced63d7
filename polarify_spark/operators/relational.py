"""Relational analytics over the TPC-H-shaped tables: the multi-table
join/aggregate/top-k queries a warehouse user actually runs, expressed so
Catalyst picks the physical strategy.

The reference (Quantco/polarify) delegates all relational work to the host
engine (SURVEY.md section 2.5); these queries exercise that inherited
surface deliberately — broadcast dimension joins, join reordering, map-side
partial aggregation, and scale-safe global top-k — and pin the plan shapes
that matter in ``tests/test_plan_shapes.py``.

Scale design (100 TB: lineitem/orders are the big tables):

* ``pricing_summary``   — one shuffle on a 4-ish-key groupBy with map-side
  partials; the shipdate filter is pushed into the parquet scan.
* ``revenue_by_nation`` — the fact tables join first (both big: shuffle
  hash/sort-merge on the join key), every dimension rides a BROADCAST so
  the big side never reshuffles for them; the date-range filter prunes at
  the orders scan. This is the canonical star-join shape.
* ``top_orders``        — global top-10 via orderBy().limit(): Spark plans
  ``TakeOrderedAndProject`` — per-partition top-k then a k-row merge on
  the driver — NOT a global sort; safe at any scale.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Callable

from ..functions import ntz_epoch_seconds

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

SHIP_CUTOFF = "1998-09-01 00:00:00"
Q5_DATE_FROM = "1997-01-01 00:00:00"
Q5_DATE_TO = "1998-01-01 00:00:00"
Q5_REGION = "EUROPE"
Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-06-01 00:00:00"
TOP_ORDERS_K = 10


def _read(spark: "SparkSession", sf_dir: str, table: str) -> "DataFrame":
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _ntz(value: str):
    from pyspark.sql import functions as F

    return F.lit(value).cast("timestamp_ntz")


def pricing_summary(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """TPC-H Q1-shaped pricing summary: per (returnflag, linestatus)
    aggregate of quantity/price/discounted/charged with averages and
    counts, over lineitems shipped before the cutoff."""
    from pyspark.sql import functions as F

    li = _read(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= _ntz(SHIP_CUTOFF)
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 4) AS sum_qty,
       ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{SHIP_CUTOFF}'
GROUP BY 1, 2
"""


def revenue_by_nation(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """TPC-H Q5-shaped star join: revenue per customer nation for one
    region and one order-date year. Dimensions (nation, region) are
    explicitly broadcast; lineitem joins orders on the shuffle key once."""
    from pyspark.sql import functions as F

    li = _read(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = _read(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ntz(Q5_DATE_FROM))
        & (F.col("o_orderdate") < _ntz(Q5_DATE_TO))
    ).select("o_orderkey", "o_custkey")
    cust = _read(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _read(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = _read(spark, sf_dir, "region").where(
        F.col("r_name") == Q5_REGION
    ).select("r_regionkey")

    dims = F.broadcast(
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(dims, cust.c_nationkey == dims.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue), 4).alias("revenue"))
    )


REVENUE_BY_NATION_SQL = f"""
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q5_DATE_FROM}'
  AND o_orderdate <  TIMESTAMP '{Q5_DATE_TO}'
GROUP BY 1
"""


def top_orders(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """TPC-H Q3-shaped top-k: the 10 highest-revenue orders from one market
    segment, ordered before the cutoff but shipped after it. The global
    limit plans as TakeOrderedAndProject (per-partition top-k, k-row
    merge), never a full sort."""
    from pyspark.sql import functions as F

    cust = _read(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == Q3_SEGMENT
    ).select("c_custkey")
    orders = _read(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < _ntz(Q3_DATE)
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = _read(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > _ntz(Q3_DATE)
    ).select("l_orderkey", "l_extendedprice", "l_discount")

    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(revenue), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(TOP_ORDERS_K)
        .select(
            "o_orderkey",
            # tz-independent epoch so the comparison is timezone-proof
            ntz_epoch_seconds("o_orderdate").alias("o_orderdate_epoch"),
            "revenue",
        )
    )


TOP_ORDERS_SQL = f"""
SELECT o_orderkey,
       CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_epoch,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_DATE}'
  AND l_shipdate  > TIMESTAMP '{Q3_DATE}'
GROUP BY o_orderkey, o_orderdate
ORDER BY ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) DESC, o_orderkey ASC
LIMIT {TOP_ORDERS_K}
"""


Q18_QTY_THRESHOLD = 150
Q18_TOP_K = 20


def large_volume_customers(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """TPC-H Q18-shaped group-having: customers whose single orders exceed a
    total-quantity threshold, ranked by order value.

    Scale shape: the HAVING filter runs as a pre-aggregation over lineitem
    alone (map-side partials, one uniform l_orderkey shuffle) and only the
    few surviving orderkeys join onward — the aggregate-then-join order is
    the whole trick; join-then-aggregate would shuffle the full lineitem x
    orders product. The surviving set is tiny, so it broadcasts into both
    subsequent joins, and the global ranking plans TakeOrderedAndProject."""
    from pyspark.sql import functions as F

    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > Q18_QTY_THRESHOLD)
    )
    orders = _read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = _read(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(
            F.broadcast(big_orders),
            orders.o_orderkey == big_orders.l_orderkey,
        )
        .join(cust, orders.o_custkey == cust.c_custkey)
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(Q18_TOP_K)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("o_totalprice"),
            F.round("total_qty", 4).alias("total_qty"),
        )
    )


LARGE_VOLUME_CUSTOMERS_SQL = f"""
SELECT c_custkey, c_name, o_orderkey,
       ROUND(o_totalprice, 4) AS o_totalprice,
       ROUND(total_qty, 4) AS total_qty
FROM orders
JOIN (SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > {Q18_QTY_THRESHOLD}) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT {Q18_TOP_K}
"""


def sales_cube(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """CUBE over (returnflag, linestatus): every grouping-set combination
    — (both), (flag), (status), (grand total) — in one pass.

    Exercises the inherited grouping-sets surface (``DataFrame.cube``):
    Spark plans one Expand over the scan feeding a single hash aggregate
    with map-side partials, so the cost is #grouping-sets x one shuffle-
    free expansion, never one job per grouping set. NULL marks the
    rolled-up dimensions; ``grouping_id`` disambiguates a real NULL key
    from a rollup NULL (the testdata has no NULL flags, but the output
    contract carries it so consumers at scale can tell)."""
    from pyspark.sql import functions as F

    li = _read(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id("l_returnflag", "l_linestatus")
            .cast("int")
            .alias("grouping_set"),
            F.count("*").alias("n_items"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        )
    )


SALES_CUBE_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS grouping_set,
       COUNT(*) AS n_items,
       ROUND(SUM(l_quantity), 4) AS sum_qty,
       ROUND(SUM(l_extendedprice), 4) AS sum_price
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


#: Q4-shaped window and Q10-shaped quarter (testdata dates span 1995-2001).
Q4_DATE_FROM = "1996-01-01 00:00:00"
Q4_DATE_TO = "1996-04-01 00:00:00"
Q10_DATE_FROM = "1996-01-01 00:00:00"
Q10_DATE_TO = "1996-04-01 00:00:00"
Q10_TOP_N = 20


def priority_order_counts(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """TPC-H Q4-shaped EXISTS: count orders per priority in one quarter that
    have at least one returned line item. The EXISTS subquery is a LEFT SEMI
    join on the order key — Spark never materializes the pair, and the
    lineitem side's predicate pushes into its scan. The date filter pushes
    into the orders scan; the final agg is a handful of priority groups with
    map-side combine."""
    from pyspark.sql import functions as F

    orders = _read(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ntz(Q4_DATE_FROM))
        & (F.col("o_orderdate") < _ntz(Q4_DATE_TO))
    ).select("o_orderkey", "o_orderpriority")
    returned = (
        _read(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


PRIORITY_ORDER_COUNTS_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{Q4_DATE_FROM}'
  AND o_orderdate <  TIMESTAMP '{Q4_DATE_TO}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY 1
"""


def returned_item_customers(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """TPC-H Q10-shaped: top customers by revenue lost to returned items in
    one quarter, with their nation. Shape: the returnflag and date filters
    push into both fact scans, lineitem joins orders on the shuffle key,
    customer joins on custkey, the 25-row nation dimension broadcasts, and
    the global top-N plans as TakeOrderedAndProject — never a full sort."""
    from pyspark.sql import functions as F

    li = (
        _read(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    orders = _read(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ntz(Q10_DATE_FROM))
        & (F.col("o_orderdate") < _ntz(Q10_DATE_TO))
    ).select("o_orderkey", "o_custkey")
    cust = _read(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = _read(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(revenue), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(Q10_TOP_N)
    )


RETURNED_ITEM_CUSTOMERS_SQL = f"""
SELECT c_custkey, c_name, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{Q10_DATE_FROM}'
  AND o_orderdate <  TIMESTAMP '{Q10_DATE_TO}'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey ASC
LIMIT {Q10_TOP_N}
"""


Q7_DATE_FROM = "1997-01-01 00:00:00"
Q7_DATE_TO = "1998-01-01 00:00:00"


def nation_trade_volume(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """TPC-H Q7-shaped bilateral trade: revenue between every (supplier
    nation, customer nation) pair for one ship-date year, cross-nation
    pairs only — the one query shape that routes through ``l_suppkey``,
    exercising a fact table joined to TWO independent dimension paths.

    Shape at scale: lineitem ⋈ orders is the single big-big shuffle join
    (both keyed on orderkey); supplier and nation are broadcast (true
    dimensions), customer ⋈ orders shuffles on custkey like Q5/Q10; the
    final (25 × 25)-key aggregate is map-side combined. The shipdate
    filter is pushed into the lineitem scan."""
    from pyspark.sql import functions as F

    li = _read(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ntz(Q7_DATE_FROM))
        & (F.col("l_shipdate") < _ntz(Q7_DATE_TO))
    ).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    supp = _read(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = _read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _read(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _read(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp_nation = F.broadcast(nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ))
    cust_nation = F.broadcast(nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp_nation, F.col("s_nationkey") == F.col("sn_key"))
        .join(cust_nation, F.col("c_nationkey") == F.col("cn_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(revenue), 4).alias("revenue"),
        )
    )


NATION_TRADE_VOLUME_SQL = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       COUNT(*) AS n_items,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '{Q7_DATE_FROM}'
  AND l_shipdate <  TIMESTAMP '{Q7_DATE_TO}'
  AND sn.n_name != cn.n_name
GROUP BY 1, 2
"""


Q8_PART_TYPE = "ECONOMY"
Q8_NATION = "NATION_3"


def nation_market_share(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """TPC-H Q8-shaped market share: for one part type, the fraction of
    yearly revenue supplied by one nation — a share-of-total (two-level
    aggregate over the same join tree), the query shape behind every
    "our share of segment X" dashboard.

    Shape at scale: part (filtered to the type — pushed to its scan) and
    supplier/nation broadcast; lineitem ⋈ orders is the single big-big
    shuffle; the share is computed from per-row integer revenue cents
    (``ROUND(rev * 100)`` as BIGINT), so both the numerator and the
    denominator are exact integer sums and the ratio is bit-identical
    across engines — no float-accumulation-order dependence at all."""
    from pyspark.sql import functions as F

    li = _read(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    part = _read(spark, sf_dir, "part").where(
        F.col("p_type") == Q8_PART_TYPE
    ).select("p_partkey")
    supp = _read(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _read(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = _read(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")

    rev_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            rev_cents.alias("cents"),
            (F.col("n_name") == Q8_NATION).cast("long").alias("is_target"),
        )
    )
    return joined.groupBy("o_year").agg(
        F.round(F.sum(F.col("cents") * F.col("is_target")) / 100.0, 2).alias(
            "target_rev"
        ),
        F.round(F.sum("cents") / 100.0, 2).alias("total_rev"),
        F.round(
            F.sum(F.col("cents") * F.col("is_target"))
            / F.sum("cents").cast("double"),
            6,
        ).alias("mkt_share"),
    )


NATION_MARKET_SHARE_SQL = f"""
WITH j AS (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           AS cents,
         CASE WHEN n_name = '{Q8_NATION}' THEN 1 ELSE 0 END AS is_target
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN orders   ON l_orderkey = o_orderkey
  WHERE p_type = '{Q8_PART_TYPE}'
)
SELECT o_year,
       ROUND(SUM(cents * is_target) / 100.0, 2) AS target_rev,
       ROUND(SUM(cents) / 100.0, 2) AS total_rev,
       ROUND(SUM(cents * is_target) / CAST(SUM(cents) AS DOUBLE), 6)
         AS mkt_share
FROM j GROUP BY 1
"""


QUERIES: dict[str, tuple[Callable, str]] = {
    "relational_nation_market_share": (
        nation_market_share,
        NATION_MARKET_SHARE_SQL,
    ),
    "relational_pricing_summary": (pricing_summary, PRICING_SUMMARY_SQL),
    "relational_nation_trade_volume": (
        nation_trade_volume,
        NATION_TRADE_VOLUME_SQL,
    ),
    "relational_priority_order_counts": (
        priority_order_counts,
        PRIORITY_ORDER_COUNTS_SQL,
    ),
    "relational_returned_item_customers": (
        returned_item_customers,
        RETURNED_ITEM_CUSTOMERS_SQL,
    ),
    "relational_sales_cube": (sales_cube, SALES_CUBE_SQL),
    "relational_revenue_by_nation": (revenue_by_nation, REVENUE_BY_NATION_SQL),
    "relational_top_orders": (top_orders, TOP_ORDERS_SQL),
    "relational_large_volume_customers": (
        large_volume_customers,
        LARGE_VOLUME_CUSTOMERS_SQL,
    ),
}
