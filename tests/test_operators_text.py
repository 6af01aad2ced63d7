"""Text operators vs DuckDB oracle (sf0.001 for speed; driver uses sf0.01)."""

from __future__ import annotations

import pytest

from polarify_spark.operators.text import QUERIES

from .oracle_harness import compare_query

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", list(QUERIES), ids=list(QUERIES))
def test_text_operator_matches_oracle(spark, name):
    fn, sql = QUERIES[name]
    compare_query(spark, SF_DIR, fn, sql)


def test_pii_redact_on_planted_pii(spark):
    """The corpus has no PII, so the query's counts are zero everywhere;
    this test plants real emails/IPs and proves the redaction itself."""
    from pyspark.sql import functions as F

    from polarify_spark.operators.text import pii_redact

    rows = [
        (1, "contact bob.smith+spam@example.co.uk for details"),
        (2, "server at 192.168.0.1 responded"),
        (3, "no pii here at all"),
        (4, "a@b.io then 10.0.0.255 twice 10.0.0.254"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["red"]
        for r in df.select(
            "doc_id", pii_redact(F.col("text")).alias("red")
        ).collect()
    }
    assert got[1] == "contact <EMAIL> for details"
    assert got[2] == "server at <IP> responded"
    assert got[3] == "no pii here at all"
    assert got[4] == "<EMAIL> then <IP> twice <IP>"


def test_stratified_sample_is_deterministic_and_stratified(spark):
    from polarify_spark.operators.text import (
        DEFAULT_RATE_PER_MILLE,
        SAMPLE_RATES_PER_MILLE,
        docs_stratified_sample,
    )

    a = sorted(map(tuple, docs_stratified_sample(spark, SF_DIR).collect()))
    b = sorted(map(tuple, docs_stratified_sample(spark, SF_DIR).collect()))
    assert a == b  # pure function of the rows, not of partitioning/RNG
    # every kept bucket respects its language's rate
    for doc_id, lang, bucket in a:
        rate = SAMPLE_RATES_PER_MILLE.get(lang, DEFAULT_RATE_PER_MILLE)
        assert bucket < rate, (doc_id, lang, bucket)
