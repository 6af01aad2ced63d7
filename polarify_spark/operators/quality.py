"""Data-quality operators (Deequ-class): one-pass table profiling and
declarative constraint validation — the checks a production pipeline runs
on every new drop of data before letting it into the corpus.

The reference (Quantco/polarify) has no data-quality surface (SURVEY.md
section 2.5); these implement the north-star extension set required by the
build brief, oracle-checked against DuckDB.

Scale shape (100 TB): ``events_quality_checks`` is a single scan reduced
by one map-side-combined global aggregate (plus the keyed uniqueness
row); ``profile`` is TWO linear scans — one Expand + HashAggregate pass
for every mutable-buffer stat and one key-less fold for string min/max —
joined by a broadcast 1-row cross join (see :func:`profile` for why the
split beats one aggregate). No windows; the per-column / per-check
results are assembled from the 1-row aggregate with a driver-free
explode. Exact ``count_distinct`` is the one shuffle-bearing piece of
the profile (per-column distinct shuffles the value spine); the
at-scale swap-in is ``profile(..., approx=True)`` —
``approx_count_distinct`` (HLL, mergeable, no value shuffle, no
Expand) once cardinalities stop being audit-critical.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Callable

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

#: columns profiled by the registered lineitem query: a numeric/string mix.
#: Numeric min/max surface as DOUBLE, string min/max lexicographically —
#: split columns, because a cast-to-string numeric formats differently
#: across engines.
PROFILE_NUMERIC = ("l_quantity", "l_extendedprice", "l_discount")
PROFILE_STRING = ("l_returnflag", "l_linestatus")


#: relative standard deviation of the HLL++ sketch in approx profile
#: mode — Spark's ``approx_count_distinct`` default. Pinned as a module
#: constant so the approx-mode test tolerance and the operator agree.
PROFILE_APPROX_RSD = 0.05


def profile(
    df: "DataFrame", numeric: tuple, string: tuple, approx: bool = False
) -> "DataFrame":
    """Generic profile: for each named column, row counts, null counts,
    distinct counts, and min/max (typed — see module note).
    Output: (column, n_rows, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str).

    ``approx=True`` (VERDICT r13 #5) swaps exact ``count_distinct`` for
    ``approx_count_distinct`` at :data:`PROFILE_APPROX_RSD` — the
    documented 100 TB shape once cardinalities stop being
    audit-critical: HLL buffers are mergeable fixed-size sketches, so
    every hashable stat folds map-side in ONE single-pass aggregate over
    all columns. Same schema either way (``n_distinct`` stays BIGINT);
    results are deterministic for a given rsd (HLL++ is hash-based, not
    sampled).

    Exact-mode plan shape (r20, guide §2.3/§2.4): one aggregate PER
    COLUMN over a single-column pruned scan, unioned. The former shape —
    all exact distincts in one aggregate — planned as an Expand
    producing rows × (n_cols + 1) through the partial HashAggregate
    (Spark's multi-distinct rewrite), plus a second full scan for the
    string min/max fold; measured 2.6 s steady at sf0.1 against 1.2 s
    for this shape (output bit-identical, row order included). Per
    column the single ``count_distinct`` plans as a two-level
    HashAggregate on the value — no Expand, no sort — and the column
    subtrees are independent, so Spark schedules their stages
    concurrently inside the one job. String min/max carry immutable
    (string) aggregation buffers, and a single buffer of that kind would
    demote the whole aggregate to a sort-based one keyed on the value (a
    per-partition sort of the column — the measured keyed-SortAggregate
    trap), so each string column keeps min/max in a separate KEY-LESS
    SortAggregate fold — no grouping keys, no sort, a linear scan —
    zipped back by a 1-row broadcast cross join (trivially bounded)."""
    from pyspark.sql import functions as F

    def _row(c: str, agg_frame: "DataFrame", is_num: bool) -> "DataFrame":
        return agg_frame.select(
            F.lit(c).alias("col_name"),
            "n_rows",
            "n_nulls",
            "n_distinct",
            F.col("min_num")
            if is_num
            else F.lit(None).cast("double").alias("min_num"),
            F.col("max_num")
            if is_num
            else F.lit(None).cast("double").alias("max_num"),
            F.lit(None).cast("string").alias("min_str")
            if is_num
            else F.col("min_str"),
            F.lit(None).cast("string").alias("max_str")
            if is_num
            else F.col("max_str"),
        )

    if approx:
        # single shared pass: every buffer (counts, HLL sketches, numeric
        # min/max) is mutable and fixed-size, so one HashAggregate over
        # all columns is the cheapest shape — only the string extremes
        # stay in the key-less fold.
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for c in (*numeric, *string):
            aggs.append(
                F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
            )
            aggs.append(
                F.approx_count_distinct(F.col(c), PROFILE_APPROX_RSD).alias(
                    f"dist_{c}"
                )
            )
        for c in numeric:
            aggs.append(F.min(F.col(c).cast("double")).alias(f"min_{c}"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"max_{c}"))
        hashable = df.agg(*aggs)
        str_aggs = []
        for c in string:
            str_aggs.append(F.min(F.col(c)).alias(f"smin_{c}"))
            str_aggs.append(F.max(F.col(c)).alias(f"smax_{c}"))
        one = (
            hashable.crossJoin(F.broadcast(df.agg(*str_aggs)))
            if str_aggs
            else hashable
        )
        rows = []
        for c in numeric:
            rows.append(
                F.struct(
                    F.lit(c).alias("col_name"),
                    F.col("n_rows").alias("n_rows"),
                    F.col(f"nulls_{c}").alias("n_nulls"),
                    F.col(f"dist_{c}").alias("n_distinct"),
                    F.col(f"min_{c}").alias("min_num"),
                    F.col(f"max_{c}").alias("max_num"),
                    F.lit(None).cast("string").alias("min_str"),
                    F.lit(None).cast("string").alias("max_str"),
                )
            )
        for c in string:
            rows.append(
                F.struct(
                    F.lit(c).alias("col_name"),
                    F.col("n_rows").alias("n_rows"),
                    F.col(f"nulls_{c}").alias("n_nulls"),
                    F.col(f"dist_{c}").alias("n_distinct"),
                    F.lit(None).cast("double").alias("min_num"),
                    F.lit(None).cast("double").alias("max_num"),
                    F.col(f"smin_{c}").alias("min_str"),
                    F.col(f"smax_{c}").alias("max_str"),
                )
            )
        return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")

    parts = []
    for c in numeric:
        agg = df.select(c).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(c).isNull().cast("long")).alias("n_nulls"),
            F.count_distinct(F.col(c)).alias("n_distinct"),
            F.min(F.col(c).cast("double")).alias("min_num"),
            F.max(F.col(c).cast("double")).alias("max_num"),
        )
        parts.append(_row(c, agg, is_num=True))
    for c in string:
        counts = df.select(c).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(c).isNull().cast("long")).alias("n_nulls"),
            F.count_distinct(F.col(c)).alias("n_distinct"),
        )
        extremes = df.select(c).agg(
            F.min(F.col(c)).alias("min_str"),
            F.max(F.col(c)).alias("max_str"),
        )
        parts.append(
            _row(c, counts.crossJoin(F.broadcast(extremes)), is_num=False)
        )
    out = parts[0]
    for p in parts[1:]:
        # per-branch final aggregates are single-partition 1-row frames,
        # so the union's row order IS the declared column order — the
        # same order the explode(array(...)) assembly produced.
        out = out.unionByName(p)
    return out


def lineitem_profile(
    spark: "SparkSession", sf_dir: str, approx: bool = False
) -> "DataFrame":
    """Registered exact-mode profile; ``approx=True`` selects the HLL
    variant (same query, parameter — the registry entry and its DuckDB
    oracle stay exact-mode; approx mode is pinned rows-only against the
    rsd bound by ``test_profile_approx_mode_within_rsd``)."""
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return profile(df, PROFILE_NUMERIC, PROFILE_STRING, approx=approx)


def _profile_sql() -> str:
    parts = []
    for c in PROFILE_NUMERIC:
        parts.append(
            f"SELECT '{c}' AS col_name, COUNT(*) AS n_rows,"
            f" CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,"
            f" COUNT(DISTINCT {c}) AS n_distinct,"
            f" MIN({c})::DOUBLE AS min_num, MAX({c})::DOUBLE AS max_num,"
            f" NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str"
            f" FROM lineitem"
        )
    for c in PROFILE_STRING:
        parts.append(
            f"SELECT '{c}' AS col_name, COUNT(*) AS n_rows,"
            f" CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,"
            f" COUNT(DISTINCT {c}) AS n_distinct,"
            f" NULL::DOUBLE AS min_num, NULL::DOUBLE AS max_num,"
            f" MIN({c}) AS min_str, MAX({c}) AS max_str"
            f" FROM lineitem"
        )
    return "\nUNION ALL\n".join(parts)


LINEITEM_PROFILE_SQL = _profile_sql()


#: the registered constraint suite over ``events`` — (name, SQL predicate
#: that is TRUE when the row VIOLATES the check). The Spark side builds the
#: same predicates with column expressions; names keep the two in lockstep.
EVENT_CHECKS: tuple[tuple[str, str], ...] = (
    ("event_id_not_null", "event_id IS NULL"),
    ("value_non_negative", "value < 0"),
    ("ts_in_2024", "ts < TIMESTAMP '2024-01-01' OR ts >= TIMESTAMP '2025-01-01'"),
    (
        "event_type_known",
        "event_type NOT IN ('click', 'view', 'purchase', 'error', 'signup')",
    ),
)


def events_quality_checks(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Declarative constraint validation: each check counts its violating
    rows in one shared scan/aggregate; a check passes when that count is
    zero. The uniqueness check (``event_id`` has no duplicates) needs
    per-key cardinality, so it alone aggregates on the key — uniform
    shuffle with map-side combine — and is unioned in as one more row."""
    from pyspark.sql import functions as F

    from ..operators.timeseries import _events

    events = _events(spark, sf_dir)
    known = ("click", "view", "purchase", "error", "signup")
    violations = {
        "event_id_not_null": F.col("event_id").isNull(),
        "value_non_negative": F.col("value") < 0,
        "ts_in_2024": (F.col("ts") < F.lit("2024-01-01").cast("timestamp"))
        | (F.col("ts") >= F.lit("2025-01-01").cast("timestamp")),
        "event_type_known": ~F.col("event_type").isin(*known),
    }
    agg = events.agg(
        *[
            F.sum(pred.cast("long")).alias(name)
            for name, pred in violations.items()
        ]
    )
    scalar_rows = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("check_name"),
                        F.col(name).alias("n_violations"),
                    )
                    for name in violations
                ]
            )
        ).alias("c")
    ).select("c.*")

    dup_keys = (
        events.groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("n_violations"))
        .select(F.lit("event_id_unique").alias("check_name"), "n_violations")
    )
    out = scalar_rows.unionByName(dup_keys)
    return out.select(
        "check_name",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


EVENTS_QUALITY_CHECKS_SQL = (
    "\nUNION ALL\n".join(
        f"SELECT '{name}' AS check_name,"
        f" CAST(SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,"
        f" SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) = 0 AS passed"
        f" FROM events"
        for name, pred in EVENT_CHECKS
    )
    + """
UNION ALL
SELECT 'event_id_unique' AS check_name,
       CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_violations,
       COALESCE(SUM(n), 0) = 0 AS passed
FROM (SELECT event_id, COUNT(*) AS n FROM events
      GROUP BY 1 HAVING COUNT(*) > 1)
"""
)


def schema_drift(old: "DataFrame", new: "DataFrame") -> list[dict]:
    """Field-level diff of two schemas — the pre-flight check before
    appending a new data drop to an existing dataset: added / removed
    fields, type changes, and nullability changes, sorted by field name.
    Pure driver-side metadata (no Spark job runs); an empty list means the
    drop is structurally safe to append."""
    old_fields = {f.name: f for f in old.schema.fields}
    new_fields = {f.name: f for f in new.schema.fields}
    out: list[dict] = []
    for name in sorted(set(old_fields) | set(new_fields)):
        o, n = old_fields.get(name), new_fields.get(name)
        if o is None:
            out.append(
                {
                    "field": name,
                    "change": "added",
                    "new_type": n.dataType.simpleString(),
                }
            )
        elif n is None:
            out.append(
                {
                    "field": name,
                    "change": "removed",
                    "old_type": o.dataType.simpleString(),
                }
            )
        elif o.dataType != n.dataType:
            out.append(
                {
                    "field": name,
                    "change": "type_changed",
                    "old_type": o.dataType.simpleString(),
                    "new_type": n.dataType.simpleString(),
                }
            )
        elif o.nullable != n.nullable:
            out.append(
                {
                    "field": name,
                    "change": "nullability_changed",
                    "old_nullable": o.nullable,
                    "new_nullable": n.nullable,
                }
            )
    return out


QUERIES: dict[str, tuple[Callable, str]] = {
    "lineitem_profile": (lineitem_profile, LINEITEM_PROFILE_SQL),
    "events_quality_checks": (events_quality_checks, EVENTS_QUALITY_CHECKS_SQL),
}
