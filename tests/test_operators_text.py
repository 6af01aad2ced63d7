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


def test_kmv_sketch_is_mergeable(spark):
    """The property that makes KMV a distributed sketch: the K smallest
    hashes of a UNION equal the K smallest of the merged per-part sketches
    — so per-shard sketches combine without revisiting data. Pinned by
    splitting the corpus in half and merging."""
    from pyspark.sql import functions as F

    from polarify_spark.functions import md5_long
    from polarify_spark.functions import whitespace_tokens
    from polarify_spark.operators.text import KMV_K, _docs

    sf = "/root/testdata/sf0.001"

    def sketch(docs):
        hv = docs.select(
            F.explode(whitespace_tokens(F.col("text"))).alias("tok")
        ).select(md5_long(F.col("tok"), 8).alias("hv"))
        return [
            r["hv"]
            for r in hv.distinct().orderBy("hv").limit(KMV_K).collect()
        ]

    docs = _docs(spark, sf)
    full = sketch(docs)
    half_a = sketch(docs.where(F.col("doc_id") % 2 == 0))
    half_b = sketch(docs.where(F.col("doc_id") % 2 == 1))
    merged = sorted(set(half_a) | set(half_b))[: KMV_K]
    assert merged == full
