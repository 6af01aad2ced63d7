"""Time-series operators over the ``events`` table: tumbling-window
aggregation, as-of join against ``orders``, and gap-based sessionization.

Scale design (events is the table that actually grows with SF — at 100 TB
it is the dominant input):

* ``windowed_agg`` — ``F.window`` tumbling buckets; one shuffle on
  (window, event_type) with map-side partial aggregation. Bucket keys are
  dense and uniform — no skew. The same expression graph runs unchanged
  under Structured Streaming with a watermark (see
  ``polarify_spark.streaming``).
* ``asof_join`` — implemented as union + partitioned window
  (``last(..., ignorenulls)``), NOT as a range join: both inputs shuffle
  once on the key, then a single ordered pass per key emits the match.
  This is the only as-of formulation that stays O(n log n) per key at
  100 TB; a join-then-filter would be quadratic in per-key cardinality.
  DuckDB's native ``ASOF JOIN`` is the oracle.
* ``sessionize`` — classic gap>threshold cumulative-sum windowing; one
  shuffle on user_id.

The reference (Quantco/polarify) has no temporal operators (SURVEY.md
section 2.5); these are north-star extensions.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Callable

from ..functions import ntz_as_utc_instant

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

SESSION_GAP_MINUTES = 30


def _events(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Read events with ``ts`` normalized to a microsecond ``TimestampType``
    instant, whichever physical type the generator wrote (TIMESTAMP(NANOS)
    nano longs or TIMESTAMP_MICROS) — see ``sources.event_time_reader``."""
    from ..sources import event_time_reader, normalize_event_ts

    with event_time_reader(spark):
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return normalize_event_ts(df)


def windowed_agg(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Tumbling 1-hour windows per event_type: count + value sum/mean.

    The window start is emitted as an epoch-hour integer so the oracle
    comparison is timezone-representation-proof."""
    from pyspark.sql import functions as F

    events = _events(spark, sf_dir)
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
            F.round(F.avg("value"), 4).alias("value_avg"),
        )
        .select(
            # floor, not cast: a bare long cast truncates toward zero, which
            # disagrees with the oracle's FLOOR for pre-1970 (negative
            # epoch) windows
            F.floor(F.unix_timestamp(F.col("w.start")) / 3600)
            .cast("long")
            .alias("hour_id"),
            "event_type",
            "n_events",
            "value_sum",
            "value_avg",
        )
    )


WINDOWED_AGG_SQL = """
SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hour_id,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS value_sum,
       ROUND(AVG(value), 4) AS value_avg
FROM events
GROUP BY 1, 2
"""


def asof_join(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """For each event, the most recent order (o_orderdate <= ts) of the same
    customer: union both inputs, one window pass per user ordered by time.

    Orders are first deduplicated to one per (custkey, orderdate) — max
    orderkey wins — so the as-of match is uniquely defined in both engines.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    events = _events(spark, sf_dir).select(
        "user_id", F.col("ts").alias("t"), "event_id"
    )
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy(F.col("o_custkey").alias("user_id"), F.col("o_orderdate").alias("d"))
        .agg(
            F.max("o_orderkey").alias("o_orderkey"),
            F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
        )
        # TIMESTAMP_NTZ -> TIMESTAMP explicitly as the UTC instant of the
        # same wall-clock value (tz-independent field extraction). An
        # implicit cast would go through the session timezone, diverging
        # from the naive comparison the DuckDB oracle performs on any
        # non-UTC host.
        .select(
            "user_id",
            ntz_as_utc_instant(F.col("d")).alias("t"),
            "o_orderkey",
            "o_totalprice",
        )
    )

    unioned = orders.select(
        "user_id",
        "t",
        F.lit(None).cast("long").alias("event_id"),
        "o_orderkey",
        "o_totalprice",
    ).unionByName(
        events.select(
            "user_id",
            "t",
            "event_id",
            F.lit(None).cast("long").alias("o_orderkey"),
            F.lit(None).cast("double").alias("o_totalprice"),
        )
    )
    # orders sort before events at the same instant -> `<=` semantics
    carry = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("o_orderkey").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.select(
            "user_id",
            "t",
            "event_id",
            F.last("o_orderkey", ignorenulls=True).over(carry).alias("o_orderkey"),
            F.last("o_totalprice", ignorenulls=True).over(carry).alias("o_totalprice"),
        )
        .where(F.col("event_id").isNotNull() & F.col("o_orderkey").isNotNull())
        .select("event_id", "user_id", "o_orderkey", "o_totalprice")
    )


ASOF_JOIN_SQL = """
WITH o AS (
  SELECT o_custkey AS user_id, o_orderdate AS t,
         MAX(o_orderkey) AS o_orderkey,
         MAX_BY(o_totalprice, o_orderkey) AS o_totalprice
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice
FROM events e
ASOF JOIN o ON e.user_id = o.user_id AND o.t <= e.ts
"""


def sessionize(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Gap-based sessions: a new session starts when the time since the
    user's previous event exceeds the gap. Emits a per-user session index."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    events = _events(spark, sf_dir)
    order = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    prev_ts = F.lag("ts").over(order)
    # cast to double epoch (keeps microseconds) — matches DuckDB epoch();
    # unix_timestamp() would truncate to seconds and disagree near the gap.
    gap_s = F.col("ts").cast("double") - prev_ts.cast("double")
    new_session = F.when(
        prev_ts.isNull() | (gap_s > SESSION_GAP_MINUTES * 60), 1
    ).otherwise(0)
    running = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.sum(new_session).over(running).cast("int").alias("session_idx"),
    )


SESSIONIZE_SQL = f"""
WITH g AS (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > {SESSION_GAP_MINUTES * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT event_id, user_id,
       CAST(SUM(new_session) OVER (PARTITION BY user_id
                                   ORDER BY ts ASC, event_id ASC
                                   ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_idx
FROM g
"""


FUNNEL_WINDOW_MINUTES = 60


def range_join_funnel(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Range (interval) join: click -> purchase conversions per user within
    a 60-minute window. The join has an equi key (user_id) plus a time-range
    predicate, so Spark plans a hash/sort-merge join on the key with the
    range as a post-probe filter — per-user event lists are small, so the
    within-key scan is bounded; with no equi key this would degenerate to a
    nested-loop (that case wants a bucketed-by-time-band formulation).

    Streaming twin: ``streaming.streaming_funnel_join`` (same output, join
    state bounded by watermarks + the time-range condition)."""
    from pyspark.sql import functions as F

    events = _events(spark, sf_dir)
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    gap = F.col("purchase_ts").cast("double") - F.col("click_ts").cast("double")
    return (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") > F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr(f"INTERVAL {FUNNEL_WINDOW_MINUTES} MINUTES")
            ),
        )
        .select(
            "user_id",
            "click_id",
            "purchase_id",
            F.round(gap, 6).alias("secs_to_purchase"),
        )
    )


RANGE_JOIN_FUNNEL_SQL = f"""
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       ROUND(epoch(p.ts) - epoch(c.ts), 6) AS secs_to_purchase
FROM events c
JOIN events p ON p.user_id = c.user_id
             AND p.ts > c.ts
             AND p.ts <= c.ts + INTERVAL {FUNNEL_WINDOW_MINUTES} MINUTE
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
"""


def rollup_multigrain(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Hypertable-style continuous-aggregate rollup: event counts and value
    sums per event_type at hour, day, and all-time grains in one pass
    (``ROLLUP (event_type, day_id, hour_id)``), with ``grouping_id``
    disambiguating the grain of each output row.

    One shuffle produces every grain: Spark expands the rollup to grouping
    sets and aggregates them together with map-side partials — at 100 TB
    this replaces three separate scans+shuffles with one, which is exactly
    why hypertables precompute multi-grain aggregates this way."""
    from pyspark.sql import functions as F

    events = _events(spark, sf_dir)
    # floor division at both grains (not long casts): truncation toward zero
    # diverges from the oracle's FLOOR / `//` for negative epochs
    hour_id = F.floor(F.unix_timestamp("ts") / 3600).cast("long")
    hours = events.select(
        "event_type",
        hour_id.alias("hour_id"),
        F.floor(hour_id / 24).cast("long").alias("day_id"),
        "value",
    )
    return (
        hours.rollup("event_type", "day_id", "hour_id")
        .agg(
            F.grouping_id().alias("grain"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
        .select("event_type", "day_id", "hour_id", "grain", "n_events", "value_sum")
    )


ROLLUP_MULTIGRAIN_SQL = """
WITH h AS (
  SELECT event_type,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hour_id,
         -- true FLOOR, not `//` (r18 audit): DuckDB's integer `//`
         -- truncates toward zero, so a pre-1970 hour_id (e.g. -43)
         -- gave day_id -1 here while the Spark side's F.floor gives -2
         CAST(FLOOR(CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) / 24.0) AS BIGINT) AS day_id,
         value
  FROM events
)
SELECT event_type, day_id, hour_id,
       CAST(GROUPING(event_type, day_id, hour_id) AS INTEGER) AS grain,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS value_sum
FROM h GROUP BY ROLLUP (event_type, day_id, hour_id)
"""


# --- JSON props extraction ---------------------------------------------------


def props_json_agg(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Schema-on-read over the JSON ``props`` column: parse with an explicit
    schema (``from_json`` — JVM-side, codegen-friendly; never a Python
    JSON loop), then aggregate per extracted-key decile. At 100 TB the
    parse is a per-row projection in the scan stage and the aggregation
    shuffles only (bucket, event_type) — both grow sub-linearly."""
    from pyspark.sql import functions as F

    events = _events(spark, sf_dir)
    k = F.from_json("props", "k int")["k"]
    return (
        events.select(
            "event_type",
            F.floor(k / 10).cast("int").alias("k_decile"),
            "value",
        )
        .groupBy("event_type", "k_decile")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("value"), 4).alias("value_avg"),
        )
    )


PROPS_JSON_AGG_SQL = """
SELECT event_type,
       CAST(FLOOR(CAST(json_extract(props, '$.k') AS INTEGER) / 10.0) AS INTEGER)
         AS k_decile,
       COUNT(*) AS n_events,
       ROUND(AVG(value), 4) AS value_avg
FROM events
GROUP BY 1, 2
"""


# --- per-key top-k -----------------------------------------------------------

TOP_EVENTS_PER_USER = 3


def top_events_per_user(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Each user's top-3 events by value (deterministic tiebreak on
    event_id): the window top-k pattern. One shuffle on user_id; rank
    computed in a single window pass — never a global sort. At scale this
    is the shape for per-entity leaderboards; a global ``orderBy().limit``
    would funnel everything through one task."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    events = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        events.select("user_id", "event_id", "event_type", "value")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_EVENTS_PER_USER)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            "rank",
        )
    )


TOP_EVENTS_PER_USER_SQL = f"""
WITH ranked AS (
  SELECT user_id, event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id ASC) AS rank
  FROM events
)
SELECT user_id, event_id, event_type, ROUND(value, 6) AS value,
       CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TOP_EVENTS_PER_USER}
"""


# --- exact percentiles -------------------------------------------------------


def value_percentiles(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Exact p50/p90/p99 of value per event_type (``F.percentile``, linear
    interpolation — same definition as SQL ``quantile_cont``). Exact
    percentiles shuffle every value to its group; the documented scale
    alternative is ``percentile_approx`` (t-digest sketch: mergeable,
    bounded memory, map-side combinable) when groups stop fitting a
    reducer."""
    from pyspark.sql import functions as F

    events = _events(spark, sf_dir)
    pct = F.percentile("value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return (
        events.groupBy("event_type")
        .agg(pct.alias("p"))
        .select(
            "event_type",
            F.round(F.col("p")[0], 6).alias("p50"),
            F.round(F.col("p")[1], 6).alias("p90"),
            F.round(F.col("p")[2], 6).alias("p99"),
        )
    )


VALUE_PERCENTILES_SQL = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.9), 6) AS p90,
       ROUND(quantile_cont(value, 0.99), 6) AS p99
FROM events
GROUP BY 1
"""


# --- rolling z-score anomaly detection ---------------------------------------

#: trailing window length (hours, inclusive of the current hour) for the
#: rolling baseline.
ANOMALY_TRAIL_HOURS = 24


def anomaly_zscore(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Per-event-type hourly volume z-scores against a trailing baseline
    of the last 24 OBSERVED hours — the monitoring primitive that flags
    traffic spikes.

    Semantics note (r18 audit): the ROWS frame spans observed
    (hour, type) rows, not calendar hours — an event type active one
    hour per day gets a baseline spanning 24 days, and zero-count hours
    are absent entirely (so droughts are not flagged by this operator).
    That is the documented contract here, pinned by the shared oracle;
    a calendar-dense variant is the composition of
    :func:`gapfill_hourly` (which exists for exactly this) with the same
    window — the shape :func:`ewma_smoothed` already uses.

    Two stages: the hourly counts are one uniform (hour, type) groupBy with
    map-side combine, then the rolling mean/stddev is a window per
    event_type ordered by hour with an explicit ROWS frame (types are few
    and long — each window sorts within its partition; no global order).
    The z-score is NULL while the baseline has no variance (fewer than two
    trailing hours, or a perfectly flat window) — spelled as an explicit
    guard so neither engine's divide-by-zero convention leaks into the
    output. Rounded to 4 decimals: stddev accumulation order differs
    across engines (module float convention)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    hourly = (
        _events(spark, sf_dir)
        .groupBy(
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour_id"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(-(ANOMALY_TRAIL_HOURS - 1), Window.currentRow)
    )
    mu = F.avg("n_events").over(w)
    sd = F.stddev_samp(F.col("n_events").cast("double")).over(w)
    z = F.when(sd > 0, (F.col("n_events") - mu) / sd)
    return hourly.select(
        "hour_id",
        "event_type",
        "n_events",
        F.round(mu, 4).alias("trail_mean"),
        F.round(z, 4).alias("zscore"),
    )


ANOMALY_ZSCORE_SQL = f"""
WITH hourly AS (
  SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hour_id,
         event_type, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
rolled AS (
  SELECT hour_id, event_type, n_events,
         AVG(n_events) OVER w AS mu,
         STDDEV_SAMP(CAST(n_events AS DOUBLE)) OVER w AS sd
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
               ROWS BETWEEN {ANOMALY_TRAIL_HOURS - 1} PRECEDING
               AND CURRENT ROW)
)
SELECT hour_id, event_type, n_events,
       ROUND(mu, 4) AS trail_mean,
       ROUND(CASE WHEN sd > 0 THEN (n_events - mu) / sd END, 4) AS zscore
FROM rolled
"""


# --- cohort retention ---------------------------------------------------------


def retention_cohorts(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Classic cohort retention: users grouped by their first-activity day,
    then for each (cohort day, day offset) the fraction of the cohort active
    that many days later.

    Shape at scale: first-activity day is one uniform user_id groupBy (min
    over ts, map-side combine); per-day activity is a distinct over
    (user_id, day) — same key space; the join back to cohorts keys on
    user_id so both sides co-partition; the final matrix is
    days x horizon cells. No window functions, no global order — every
    stage is a keyed aggregate or co-partitioned join."""
    from pyspark.sql import functions as F

    events = _events(spark, sf_dir)
    day = F.floor(F.unix_timestamp("ts") / 86400).cast("long")
    cohorts = events.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    activity = events.select("user_id", day.alias("day")).distinct()
    cohort_sizes = cohorts.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_size")
    )
    active = (
        activity.join(cohorts, "user_id")
        .select(
            "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset")
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_active"))
    )
    return (
        active.join(cohort_sizes, "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias(
                "retention"
            ),
        )
    )


RETENTION_COHORTS_SQL = """
WITH days AS (
  SELECT user_id, CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day FROM events
),
cohorts AS (
  SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY 1
),
activity AS (
  SELECT DISTINCT user_id, day FROM days
),
sizes AS (
  SELECT cohort_day, COUNT(*) AS cohort_size FROM cohorts GROUP BY 1
),
active AS (
  SELECT c.cohort_day, a.day - c.cohort_day AS day_offset,
         COUNT(*) AS n_active
  FROM activity a JOIN cohorts c USING (user_id)
  GROUP BY 1, 2
)
SELECT cohort_day, day_offset, n_active, cohort_size,
       ROUND(n_active * 1.0 / cohort_size, 6) AS retention
FROM active JOIN sizes USING (cohort_day)
"""


# --- gap fill + forward fill --------------------------------------------------


def gapfill_hourly(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Dense hourly series per event type: every hour in the observed global
    range appears for every type, missing hours carry a zero count and the
    last observed hourly mean value forward — the regularization step every
    downstream window/forecast/anomaly operator assumes.

    Shape at scale: hourly counts are one uniform (hour, type) groupBy with
    map-side combine; the dense grid is hours x types — calendar-sized, not
    event-sized — built from a 1-row global-bounds broadcast and a distinct
    type list, so the left join that aligns it with the observed counts
    keys on (event_type, hour_id) with the grid as the small side. The
    forward fill is one window per event_type ordered by hour (types are
    few and long, same layout as :func:`anomaly_zscore`).

    The hourly mean rides exact integer cents (``ROUND(value * 100)`` per
    event, summed as BIGINT) so no float-accumulation order can flip the
    rounded output across engines."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    events = _events(spark, sf_dir)
    hour_id = F.floor(F.unix_timestamp("ts") / 3600).cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    hourly = events.groupBy(
        hour_id.alias("hour_id"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(cents).alias("value_cents"),
    )
    bounds = hourly.agg(
        F.min("hour_id").alias("lo"), F.max("hour_id").alias("hi")
    )
    types = hourly.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.sequence("lo", "hi")).alias("hour_id"),
    )
    filled = grid.join(hourly, ["event_type", "hour_id"], "left")
    avg_value = F.when(
        F.col("n_events").isNotNull(),
        F.round(F.col("value_cents") / (F.col("n_events") * 100.0), 6),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        "event_type",
        "hour_id",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("n_events").isNull().alias("was_gap"),
        F.last(avg_value, ignorenulls=True).over(w).alias("ffill_avg_value"),
    )


GAPFILL_HOURLY_SQL = """
WITH hourly AS (
  SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hour_id, event_type,
         COUNT(*) AS n_events,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS value_cents
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT MIN(hour_id) AS lo, MAX(hour_id) AS hi FROM hourly),
grid AS (
  SELECT t.event_type, h.hour_id
  FROM (SELECT DISTINCT event_type FROM hourly) t
  CROSS JOIN (SELECT unnest(generate_series(lo, hi)) AS hour_id
              FROM bounds) h
),
filled AS (
  SELECT g.event_type, g.hour_id, hourly.n_events, hourly.value_cents
  FROM grid g LEFT JOIN hourly USING (event_type, hour_id)
)
SELECT event_type, hour_id,
       COALESCE(n_events, 0) AS n_events,
       n_events IS NULL AS was_gap,
       LAST_VALUE(
         CASE WHEN n_events IS NOT NULL
              THEN ROUND(value_cents / (n_events * 100.0), 6) END
         IGNORE NULLS
       ) OVER (PARTITION BY event_type ORDER BY hour_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS ffill_avg_value
FROM filled
"""


# --- EWMA smoothing -----------------------------------------------------------

EWMA_ALPHA = 0.3
EWMA_WINDOW = 24  # truncation horizon: (1-alpha)^24 ~ 2e-4 of the mass

#: the geometric weights, quantized ONCE in Python to integer 1e-9 units and
#: embedded as literals in BOTH engines — so the weighted sums are exact
#: integer arithmetic and no float-power evaluation happens inside either
#: engine (float literal semantics differ: DuckDB decimals vs doubles).
EWMA_WEIGHTS = [
    round(EWMA_ALPHA * (1 - EWMA_ALPHA) ** j * 10**9)
    for j in range(EWMA_WINDOW)
]


def ewma_smoothed(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Exponentially weighted moving average of hourly event volume per
    type — the smoothing baseline behind alerting and short-horizon
    forecasting, over the gap-filled dense grid (EWMA on a gappy series
    silently re-weights; the gap-fill guarantees every hour is present).

    The recursion is truncated at ``EWMA_WINDOW`` trailing terms
    ((1-alpha)^W ~ 2e-4 of the weight mass) so it becomes a fixed-weight
    dot product over an ordered window frame — expressible as window
    algebra instead of a sequential scan, and renormalized over the terms
    actually present so the series start is unbiased. Shape at scale: the
    dense grid is calendar-sized; one window per type over collect_list of
    a 24-row frame, integer weight arithmetic inside codegen."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    dense = gapfill_hourly(spark, sf_dir).select(
        "event_type", "hour_id", "n_events"
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(-(EWMA_WINDOW - 1), Window.currentRow)
    )
    xs = F.collect_list("n_events").over(w)
    weights = F.array(*[F.lit(wt) for wt in EWMA_WEIGHTS])
    n = F.size(xs)
    # element j counts back from the newest (last) frame element
    num = F.aggregate(
        F.sequence(F.lit(0), n - 1),
        F.lit(0).cast("long"),
        lambda acc, j: acc
        + F.element_at(weights, j + 1) * F.element_at(xs, n - j),
    )
    den = F.aggregate(
        F.sequence(F.lit(0), n - 1),
        F.lit(0).cast("long"),
        lambda acc, j: acc + F.element_at(weights, j + 1),
    )
    return dense.select(
        "event_type",
        "hour_id",
        "n_events",
        F.round(num / den.cast("double"), 4).alias("ewma"),
    ).withColumn("n_terms", n)


def seasonal_residuals(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Hour-of-day seasonal decomposition over the dense grid: each
    (type, hour-of-day) slot's mean volume is the seasonal component, and
    every hour's residual = observed - seasonal mean — the
    deseasonalization that must precede any threshold alerting on traffic
    with a daily rhythm (a 3 a.m. spike and a 3 p.m. lull are both
    invisible to a raw threshold).

    Shape at scale: the profile is one uniform (type, hour-of-day) groupBy
    of the calendar-sized grid — 24 x types cells — broadcast back onto
    the grid for the residual join. Means ride exact integer sums
    (count sums / slot counts), so the rounded output is engine-exact."""
    from pyspark.sql import functions as F

    dense = gapfill_hourly(spark, sf_dir).select(
        "event_type", "hour_id", "n_events"
    )
    # pmod, not % (r18 audit): both engines' % truncates, so a pre-1970
    # hour_id would land in phantom negative hour-of-day slots (-1..-23)
    # and exclude its traffic from the real slot's seasonal mean
    hod = F.pmod(F.col("hour_id"), F.lit(24)).cast("int")
    with_hod = dense.withColumn("hour_of_day", hod)
    profile = with_hod.groupBy("event_type", "hour_of_day").agg(
        F.count("*").alias("n_slots"),
        F.sum("n_events").alias("total"),
    )
    joined = with_hod.join(
        F.broadcast(profile), ["event_type", "hour_of_day"]
    )
    expected = F.col("total") / F.col("n_slots").cast("double")
    return joined.select(
        "event_type",
        "hour_id",
        "hour_of_day",
        "n_events",
        F.round(expected, 4).alias("seasonal_mean"),
        F.round(F.col("n_events") - expected, 4).alias("residual"),
    )


SEASONAL_RESIDUALS_SQL = f"""
WITH dense AS (
  SELECT event_type, hour_id, n_events FROM ({GAPFILL_HOURLY_SQL})
),
h AS (
  SELECT event_type, hour_id, n_events,
         -- positive modulus, matching Spark's pmod (see the builder)
         CAST(((hour_id % 24) + 24) % 24 AS INTEGER) AS hour_of_day
  FROM dense
),
profile AS (
  SELECT event_type, hour_of_day, COUNT(*) AS n_slots,
         SUM(n_events) AS total
  FROM h GROUP BY 1, 2
)
SELECT h.event_type, h.hour_id, h.hour_of_day, h.n_events,
       ROUND(p.total / CAST(p.n_slots AS DOUBLE), 4) AS seasonal_mean,
       ROUND(h.n_events - p.total / CAST(p.n_slots AS DOUBLE), 4) AS residual
FROM h JOIN profile p USING (event_type, hour_of_day)
"""


def _ewma_sql() -> str:
    weights = "[" + ", ".join(str(w) for w in EWMA_WEIGHTS) + "]"
    return f"""
WITH dense AS (
  SELECT event_type, hour_id, n_events FROM ({GAPFILL_HOURLY_SQL})
),
framed AS (
  SELECT event_type, hour_id, n_events,
         list(n_events) OVER (PARTITION BY event_type ORDER BY hour_id
                              ROWS BETWEEN {EWMA_WINDOW - 1} PRECEDING
                              AND CURRENT ROW) AS xs
  FROM dense
),
weighted AS (
  SELECT event_type, hour_id, n_events,
         CAST(len(xs) AS INTEGER) AS n_terms,
         list_sum(list_transform(range(0, len(xs)), j ->
           ({weights})[CAST(j AS INT) + 1]
           * xs[CAST(len(xs) - j AS INT)])) AS num,
         list_sum(list_transform(range(0, len(xs)), j ->
           ({weights})[CAST(j AS INT) + 1])) AS den
  FROM framed
)
SELECT event_type, hour_id, n_events,
       ROUND(num / CAST(den AS DOUBLE), 4) AS ewma, n_terms
FROM weighted
"""


EWMA_SMOOTHED_SQL = _ewma_sql()


QUERIES: dict[str, tuple[Callable, str]] = {
    "events_windowed_agg": (windowed_agg, WINDOWED_AGG_SQL),
    "events_gapfill_hourly": (gapfill_hourly, GAPFILL_HOURLY_SQL),
    "events_ewma_smoothed": (ewma_smoothed, EWMA_SMOOTHED_SQL),
    "events_seasonal_residuals": (seasonal_residuals, SEASONAL_RESIDUALS_SQL),
    "events_anomaly_zscore": (anomaly_zscore, ANOMALY_ZSCORE_SQL),
    "events_retention_cohorts": (retention_cohorts, RETENTION_COHORTS_SQL),
    "events_asof_join": (asof_join, ASOF_JOIN_SQL),
    "events_sessionize": (sessionize, SESSIONIZE_SQL),
    "events_range_join_funnel": (range_join_funnel, RANGE_JOIN_FUNNEL_SQL),
    "events_rollup_multigrain": (rollup_multigrain, ROLLUP_MULTIGRAIN_SQL),
    "events_props_json_agg": (props_json_agg, PROPS_JSON_AGG_SQL),
    "events_top_per_user": (top_events_per_user, TOP_EVENTS_PER_USER_SQL),
    "events_value_percentiles": (value_percentiles, VALUE_PERCENTILES_SQL),
}
