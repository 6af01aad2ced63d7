"""Similarity-search operators vs DuckDB oracle + recall sanity."""

from __future__ import annotations

import pytest

from polarify_spark.operators.similarity import QUERIES, TOP_K

from .oracle_harness import compare_query

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", list(QUERIES), ids=list(QUERIES))
def test_similarity_matches_oracle(spark, name):
    fn, sql = QUERIES[name]
    compare_query(spark, SF_DIR, fn, sql)


def test_bruteforce_is_exact_topk(spark):
    """Every query returns exactly TOP_K ranked neighbors, ranks 1..k."""
    fn, _ = QUERIES["similarity_topk_bruteforce"]
    rows = fn(spark, SF_DIR).collect()
    by_query = {}
    for r in rows:
        by_query.setdefault(r["q_id"], []).append(r["rank"])
    for q_id, ranks in by_query.items():
        assert sorted(ranks) == list(range(1, TOP_K + 1)), (q_id, ranks)
