"""Relational analytics queries vs DuckDB oracle (sf0.001)."""

from __future__ import annotations

import pytest

from polarify_spark.operators.relational import QUERIES

from .oracle_harness import compare_query

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", list(QUERIES), ids=list(QUERIES))
def test_relational_query_matches_oracle(spark, name):
    fn, sql = QUERIES[name]
    compare_query(spark, SF_DIR, fn, sql)
