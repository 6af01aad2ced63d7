"""Data-quality operators vs DuckDB oracle."""

from __future__ import annotations

import pytest

from polarify_spark.operators.quality import (
    EVENT_CHECKS,
    QUERIES,
    events_quality_checks,
    lineitem_profile,
)

from .oracle_harness import compare_query

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", list(QUERIES), ids=list(QUERIES))
def test_quality_matches_oracle(spark, name):
    fn, sql = QUERIES[name]
    compare_query(spark, SF_DIR, fn, sql)


def test_profile_invariants(spark):
    rows = {r["col_name"]: r for r in lineitem_profile(spark, SF_DIR).collect()}
    n_rows = {r["n_rows"] for r in rows.values()}
    assert len(n_rows) == 1 and n_rows.pop() > 0
    for r in rows.values():
        assert 0 <= r["n_nulls"] <= r["n_rows"]
        assert 1 <= r["n_distinct"] <= r["n_rows"]
    assert rows["l_discount"]["min_num"] <= rows["l_discount"]["max_num"]
    assert rows["l_returnflag"]["min_str"] <= rows["l_returnflag"]["max_str"]
    # typed split: numeric rows carry no string extremes and vice versa
    assert rows["l_quantity"]["min_str"] is None
    assert rows["l_linestatus"]["min_num"] is None


def test_profile_numeric_only_skips_the_string_fold(spark):
    """With no string columns the profile is a single aggregate — no
    cross join, no SortAggregate at all — and string extreme columns are
    all-null but present (stable schema)."""
    from polarify_spark.operators.quality import profile

    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    out = profile(df, ("l_quantity", "l_tax"), ())
    rows = {r["col_name"]: r for r in out.collect()}
    assert set(rows) == {"l_quantity", "l_tax"}
    for r in rows.values():
        assert r["min_str"] is None and r["max_str"] is None
        assert r["min_num"] <= r["max_num"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortAggregate" not in plan
    assert "Join" not in plan


def test_profile_plan_hash_aggregates_the_distinct_spine(spark):
    """Pin the r20 per-column exact shape: each column's single
    ``count_distinct`` plans as a two-level HashAggregate on the value —
    NO Expand (the former all-columns aggregate multiplied rows x
    (n_cols + 1) through the partial aggregate via Spark's
    multi-distinct rewrite; measured 2.6 -> 1.2 s steady at sf0.1), and
    string min/max stay in key-less SortAggregate folds zipped back by
    1-row broadcast joins, so the executed plan has no Sort node and no
    keyed SortAggregate at all (a string-min buffer inside a keyed
    aggregate would demote it to a per-partition sort of the column)."""
    df = lineitem_profile(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan, plan
    assert "HashAggregate" in plan
    assert "Union" in plan
    import re

    assert not re.search(r"\bSort\b(?!Aggregate)", plan), plan
    # every SortAggregate that remains is a key-less linear fold
    for key_list in re.findall(r"SortAggregate\(key=\[(.*?)\]", plan):
        assert key_list == ""
    # the only joins are the bounded 1-row string-extreme zips
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_checks_pass_on_clean_testdata_and_catch_violations(spark):
    rows = {r["check_name"]: r for r in events_quality_checks(spark, SF_DIR).collect()}
    assert set(rows) == {name for name, _ in EVENT_CHECKS} | {"event_id_unique"}
    for r in rows.values():
        assert r["passed"] is True and r["n_violations"] == 0
    # the predicates themselves must flag corruption when present
    from pyspark.sql import functions as F

    from polarify_spark.operators.timeseries import _events

    bad = _events(spark, SF_DIR).withColumn(
        "value",
        F.when(F.col("event_id") % 100 == 0, -1.0).otherwise(F.col("value")),
    )
    neg = bad.agg(
        F.sum((F.col("value") < 0).cast("long")).alias("n")
    ).collect()[0]["n"]
    assert neg > 0


def test_schema_drift_classifies_all_change_kinds(spark):
    from pyspark.sql import functions as F

    from polarify_spark.operators.quality import schema_drift

    old = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    new = (
        old.drop("l_tax")
        .withColumn("l_quantity", F.col("l_quantity").cast("decimal(12,2)"))
        .withColumn("ingest_batch", F.lit("b1"))
    )
    drift = {d["field"]: d for d in schema_drift(old, new)}
    assert drift["l_tax"]["change"] == "removed"
    assert drift["ingest_batch"]["change"] == "added"
    assert drift["l_quantity"]["change"] == "type_changed"
    assert drift["l_quantity"]["old_type"] == "double"
    assert drift["l_quantity"]["new_type"] == "decimal(12,2)"
    # unchanged fields are not reported
    assert "l_orderkey" not in drift
    assert schema_drift(old, old) == []


def test_profile_approx_mode_within_rsd(spark):
    """approx=True (the HLL variant, VERDICT r13 #5): same schema, every
    n_distinct within the sketch's error envelope of the exact count
    (5 x PROFILE_APPROX_RSD — HLL++ guarantees ~rsd standard deviation,
    and below the sparse-mode threshold it is exact), all other stats
    bit-identical. Rows-only contract: the registered oracle stays
    exact-mode."""
    from polarify_spark.operators.quality import (
        PROFILE_APPROX_RSD,
        lineitem_profile,
    )

    exact = {r["col_name"]: r for r in lineitem_profile(spark, SF_DIR).collect()}
    approx_df = lineitem_profile(spark, SF_DIR, approx=True)
    approx = {r["col_name"]: r for r in approx_df.collect()}
    assert set(approx) == set(exact)
    assert approx_df.schema == lineitem_profile(spark, SF_DIR).schema
    for c, a in approx.items():
        e = exact[c]
        assert abs(a["n_distinct"] - e["n_distinct"]) <= max(
            1, 5 * PROFILE_APPROX_RSD * e["n_distinct"]
        ), (c, a["n_distinct"], e["n_distinct"])
        for stat in ("n_rows", "n_nulls", "min_num", "max_num",
                     "min_str", "max_str"):
            assert a[stat] == e[stat], (c, stat)


def test_profile_approx_mode_drops_the_distinct_spine(spark):
    """The 100 TB point of the HLL variant: no per-column distinct
    passes at all. Since r20 exact mode unions one two-level
    HashAggregate per column (no Expand either, but still one distinct
    exchange per column); approx mode's sketches are mergeable, so the
    whole profile folds in ONE shared pass — no Expand, no Union, and
    strictly fewer exchanges."""
    from polarify_spark.operators.quality import lineitem_profile

    exact_plan = (
        lineitem_profile(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    approx_plan = (
        lineitem_profile(spark, SF_DIR, approx=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in approx_plan
    assert "Union" not in approx_plan  # one shared pass, not per-column
    assert approx_plan.count("Exchange") < exact_plan.count("Exchange")
