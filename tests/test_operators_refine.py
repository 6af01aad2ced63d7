"""Corpus-refinement operators (the APPLY layer) vs DuckDB oracle +
semantic properties (sf0.001; driver gate re-proves at sf0.01)."""

from __future__ import annotations

import pytest

from polarify_spark.operators.refine import QUERIES

from .oracle_harness import compare_query

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", list(QUERIES), ids=list(QUERIES))
def test_refine_operator_matches_oracle(spark, name):
    fn, sql = QUERIES[name]
    compare_query(spark, SF_DIR, fn, sql)


def test_strip_removes_exactly_the_planted_shared_paragraph(spark, tmp_path):
    """On the planted-paragraph fixture (two docs share a 12-token span,
    one doc is unique) the strip must remove exactly the flagged token
    ranges and reassemble the rest in order; the unique doc passes
    through byte-identically (its text is already single-spaced)."""
    from polarify_spark.operators.refine import docs_strip_repeated_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    d1 = f"one two three {shared} four five"
    d3 = "completely unique text with no repeated content at all here"
    docs = spark.createDataFrame(
        [
            (1, d1),
            (2, f"{shared} six seven eight nine ten"),
            (3, d3),
        ],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in docs_strip_repeated_spans(spark, str(tmp_path)).collect()
    }
    # doc 1: tokens 4..15 flagged -> "one two three four five"
    assert got[1] == (17, 12, "one two three four five")
    # doc 2: tokens 1..12 flagged -> "six seven eight nine ten"
    assert got[2] == (17, 12, "six seven eight nine ten")
    # doc 3: untouched
    assert got[3] == (10, 0, d3)


def test_strip_counts_overlapping_intervals_once(spark, tmp_path):
    """Two islands of flagged window-starts closer than SPAN_K produce
    OVERLAPPING (start_tok, end_tok) intervals (each end extends K-1 past
    its last start); a position covered by both must be removed exactly
    once. Pins the r10 exists()-coverage reshape against the
    double-counting a plain left-join row-multiply would give. Fixture:
    doc A's tokens 1..9 repeat in doc B and tokens 4..12 in doc C, so A
    flags islands {1,2} and {4,5} -> intervals [1,9] and [4,12], overlap
    4..9."""
    from polarify_spark.operators.dedup import SPAN_K
    from polarify_spark.operators.refine import docs_strip_repeated_spans

    assert SPAN_K == 8, "fixture is built for 8-token windows"
    a = [f"a{i}" for i in range(1, 21)]  # 20 unique tokens
    docs = spark.createDataFrame(
        [
            (1, " ".join(a)),
            (2, " ".join(a[0:9])),   # A's tokens 1..9
            (3, " ".join(a[3:12])),  # A's tokens 4..12
        ],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in docs_strip_repeated_spans(spark, str(tmp_path)).collect()
    }
    # doc 1: union of [1,9] and [4,12] = positions 1..12 removed ONCE each
    assert got[1] == (20, 12, " ".join(a[12:])), got[1]
    # docs 2 and 3 are entirely repeated content -> stripped to empty
    assert got[2] == (9, 9, ""), got[2]
    assert got[3] == (9, 9, ""), got[3]


def test_span_artifacts_are_memoized_per_corpus(spark):
    """The window-hash table and the span set are built once per corpus:
    repeat calls must return the SAME checkpointed frame (identity, not
    just semantics), so the three guard passes and the strip consumer
    share one materialization."""
    from polarify_spark.operators.dedup import (
        _repeated_spans_artifact,
        _span_windows,
    )

    assert _span_windows(spark, SF_DIR) is _span_windows(spark, SF_DIR)
    assert _repeated_spans_artifact(spark, SF_DIR) is _repeated_spans_artifact(
        spark, SF_DIR
    )


def test_leakage_safe_split_never_separates_near_dups(spark):
    """The defining property: every verified near-dup pair lands in the
    SAME fold (and the same group), on the real sf0.001 graph — the exact
    leak a doc-id hash split permits (checked: at this SF the doc-id gate
    WOULD split at least one near-dup pair, so the property is not
    vacuous)."""
    import pyspark.sql.functions as F

    from polarify_spark.operators.corpus import hash_split_column
    from polarify_spark.operators.dedup import dedup_lsh_jaccard
    from polarify_spark.operators.refine import docs_leakage_safe_split

    assign = {
        r["doc_id"]: (r["group_id"], r["split"])
        for r in docs_leakage_safe_split(spark, SF_DIR).collect()
    }
    pairs = [
        (r["d1"], r["d2"])
        for r in dedup_lsh_jaccard(spark, SF_DIR).select("d1", "d2").collect()
    ]
    assert pairs, "fixture must contain near-dup pairs"
    for a, b in pairs:
        assert assign[a][0] == assign[b][0], (a, b, "group mismatch")
        assert assign[a][1] == assign[b][1], (a, b, "split leak")

    # non-vacuity: the naive doc-id gate separates at least one pair here
    from polarify_spark.sources import read_table

    naive = {
        r["doc_id"]: r["split"]
        for r in read_table(spark, SF_DIR, "documents")
        .select("doc_id", hash_split_column(F.col("doc_id")).alias("split"))
        .collect()
    }
    assert any(naive[a] != naive[b] for a, b in pairs), (
        "fixture too easy: doc-id split never leaks, property untested"
    )


def test_strip_span_join_is_broadcast_never_corpus_shuffle(spark):
    """The per-doc interval array rides a broadcast into a LEFT join keyed
    on doc_id — the positional token table (corpus-sized) must never be
    shuffled for that join, and nothing in the composed plan degenerates
    to a cartesian. r10 reshape: coverage is an ``exists`` over the
    document's (disjoint) interval array, so the whole operator is one
    corpus scan + one broadcast join + one doc_id aggregate — the plan
    must contain exactly one parquet scan of documents."""
    import re

    from polarify_spark.operators.refine import docs_strip_repeated_spans
    from polarify_spark.plans import plan_string, read_schemas

    df = docs_strip_repeated_spans(spark, SF_DIR)
    plan = plan_string(df)
    assert "CartesianProduct" not in plan
    # the span join: a BroadcastHashJoin block, LeftOuter on s_doc
    blocks = re.split(r"\n\(\d+\) ", plan)
    assert any(
        b.startswith("BroadcastHashJoin")
        and "LeftOuter" in b
        and "s_doc" in b
        for b in blocks
    ), plan
    # one corpus scan, pruned to the two referenced columns (the span set
    # itself comes from the memoized checkpoint — no documents re-scan)
    schemas = read_schemas(df)
    assert len(schemas) == 1, schemas
    assert set(schemas[0]) <= {"doc_id", "text"}, schemas


def test_strip_broadcast_fallback_same_output_no_cartesian(spark):
    """VERDICT r9 ask #5: the documented fallback for a span set that
    outgrows broadcast — ``broadcast_spans=False`` — must produce the
    identical result with a plan that still joins on the doc_id equality
    key (no cartesian, no nested-loop degeneration)."""
    from polarify_spark.operators.refine import docs_strip_repeated_spans
    from polarify_spark.plans import plan_string

    hinted = docs_strip_repeated_spans(spark, SF_DIR)
    fallback = docs_strip_repeated_spans(spark, SF_DIR, broadcast_spans=False)
    plan = plan_string(fallback)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert {tuple(r) for r in fallback.collect()} == {
        tuple(r) for r in hinted.collect()
    }


def test_decontaminate_spans_finds_planted_eval_quote(spark, tmp_path):
    """A training document quoting a 7-token eval phrase verbatim must
    report exactly the interval covering the quote (5-gram windows fully
    inside it); an unrelated training doc reports nothing; eval docs are
    never scanned as training."""
    from polarify_spark.operators.refine import docs_decontaminate_spans

    phrase = "alpha beta gamma delta epsilon zeta eta"
    # lang column present: the eval side reuses the shared gram table
    # (_ngrams_df), which carries it
    docs = spark.createDataFrame(
        [
            (0, "en", phrase),  # doc_id % 50 == 0 -> the eval stand-in
            (1, "en", f"x1 x2 {phrase} y1"),  # train doc quoting the phrase
            (2, "en", "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"),  # unrelated
        ],
        "doc_id long, lang string, text string",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        tuple(r) for r in docs_decontaminate_spans(spark, str(tmp_path)).collect()
    }
    # train doc 1 tokens: x1 x2 [phrase tokens 3..9] y1; the 5-gram
    # windows fully inside the quote start at 3,4,5 -> interval 3..9
    assert got == {(1, 3, 9, 3)}
