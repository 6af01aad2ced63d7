"""Dedup operators vs DuckDB oracle (sf0.001; driver gate uses sf0.01)."""

from __future__ import annotations

import pytest

from polarify_spark.operators.dedup import QUERIES

from .oracle_harness import compare_query

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", list(QUERIES), ids=list(QUERIES))
def test_dedup_operator_matches_oracle(spark, name):
    fn, sql = QUERIES[name]
    compare_query(spark, SF_DIR, fn, sql)


def test_minhash_lsh_finds_planted_neardups(spark):
    """The LSH candidates must include the high-Jaccard planted pairs that
    exact pairwise comparison finds (recall check at threshold 0.5)."""
    fn_lsh, _ = QUERIES["dedup_minhash_lsh"]
    fn_exact, _ = QUERIES["dedup_ngram_jaccard"]
    lsh_pairs = {
        (r["d1"], r["d2"])
        for r in fn_lsh(spark, SF_DIR).collect()
        if r["jaccard"] >= 0.5
    }
    exact_pairs = {
        (r["d1"], r["d2"])
        for r in fn_exact(spark, SF_DIR).collect()
        if r["jaccard"] >= 0.5
    }
    missed = exact_pairs - lsh_pairs
    assert not missed, f"LSH missed high-similarity pairs: {missed}"
