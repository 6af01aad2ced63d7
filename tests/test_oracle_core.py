"""Q1-Q12 (SURVEY.md section 2.6) vs the DuckDB oracle at sf0.01 — the local
replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from polarify_spark.queries import CORE_QUERIES

from .oracle_harness import compare_query

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", list(CORE_QUERIES), ids=list(CORE_QUERIES))
def test_core_query_matches_oracle(spark, name):
    fn, sql = CORE_QUERIES[name]
    compare_query(spark, SF_DIR, fn, sql)
