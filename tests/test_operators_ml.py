"""In-engine trained models vs DuckDB oracle (unrolled-iteration CTE)."""

from __future__ import annotations

import pytest

from polarify_spark.operators.ml import QUERIES, logreg_quality

from .oracle_harness import compare_query

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", list(QUERIES), ids=list(QUERIES))
def test_ml_matches_oracle(spark, name):
    fn, sql = QUERIES[name]
    compare_query(spark, SF_DIR, fn, sql)


def test_logreg_actually_learns(spark):
    """After K gradient steps from w=0 the classifier must beat the
    majority-class baseline on its own training labels — i.e. training
    moved the weights, it did not just emit the prior."""
    rows = logreg_quality(spark, SF_DIR).collect()
    n = len(rows)
    assert n > 0
    pos = sum(r["y"] for r in rows)
    majority = max(pos, n - pos) / n
    acc = sum((r["pred"] is True) == (r["y"] == 1) for r in rows) / n
    assert acc > majority, (acc, majority)
    # probabilities are genuine probabilities, and both classes are predicted
    assert all(0.0 <= r["prob"] <= 1.0 for r in rows)
    assert {r["pred"] for r in rows} == {True, False}
