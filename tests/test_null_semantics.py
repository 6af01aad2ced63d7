"""Documented null behavior of transpiled expressions (SURVEY.md §7).

The reference's test strategy avoids nulls entirely (non-null hypothesis
generators, `tests/test_parse_body.py:37-43`), because the row-wise Python
oracle cannot evaluate `None > 0`. The vectorized Spark expression CAN see
nulls, so the behavior is pinned here as engine semantics rather than left
implicit:

* a null input makes every comparison null; `CaseWhen` treats a null
  condition as not-matched and falls through;
* therefore a transpiled function returns its default/otherwise branch for
  null inputs — NOT null — whenever the default is a literal;
* arithmetic on the null input inside the chosen branch still yields null.

Both Polars `when/otherwise` and Spark `CaseWhen` share this fall-through
rule, so the deviation from the (crashing) Python oracle is identical in
the reference's host engine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polarify_spark import sparkify


@sparkify
def _sign(x):
    s = 0
    if x > 0:
        s = 1
    elif x < 0:
        s = -1
    return s


@sparkify
def _passthrough_arith(x):
    if x > 0:
        return x + 1
    return x - 1


def test_null_input_falls_through_to_default(spark):
    df = spark.createDataFrame([(1, 5), (2, -5), (3, None)], "id int, x int")
    rows = {
        r["id"]: r["v"]
        for r in df.select("id", _sign(F.col("x")).alias("v")).collect()
    }
    assert rows == {1: 1, 2: -1, 3: 0}  # null -> otherwise branch


def test_null_input_propagates_through_branch_arithmetic(spark):
    df = spark.createDataFrame([(1, 5), (2, None)], "id int, x int")
    rows = {
        r["id"]: r["v"]
        for r in df.select("id", _passthrough_arith(F.col("x")).alias("v")).collect()
    }
    assert rows == {1: 6, 2: None}  # branch chosen, null arithmetic stays null
