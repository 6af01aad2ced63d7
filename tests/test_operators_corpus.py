"""Corpus-assembly operators vs DuckDB oracle, plus semantic invariants
(split completeness, mixture-weight math, CMS overestimate property)."""

from __future__ import annotations

import math

import pytest

from polarify_spark.operators.corpus import (
    CMS_PROBE_TOP_N,
    MIXTURE_TEMPERATURE,
    QUERIES,
    VOCAB_TOP_N,
    docs_hash_split,
    docs_source_mixture,
    docs_vocab_build,
    text_cms_heavy_hitters,
    text_gopher_quality,
)

from .oracle_harness import compare_query

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", list(QUERIES), ids=list(QUERIES))
def test_corpus_operator_matches_oracle(spark, name):
    fn, sql = QUERIES[name]
    compare_query(spark, SF_DIR, fn, sql)


def test_hash_split_partitions_every_document(spark):
    """The three splits are exhaustive and disjoint: their doc counts sum to
    the corpus size, and train dominates (98/1/1 by construction)."""
    rows = {r["split"]: r for r in docs_hash_split(spark, SF_DIR).collect()}
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows.values()) == n_docs
    assert set(rows) <= {"train", "val", "test"}
    assert rows["train"]["n_docs"] > max(
        (rows[s]["n_docs"] for s in ("val", "test") if s in rows), default=0
    )


def test_mixture_weights_normalized_and_tail_upweighted(spark):
    rows = docs_source_mixture(spark, SF_DIR).collect()
    assert math.isclose(sum(r["mixture_weight"] for r in rows), 1.0, abs_tol=1e-4)
    assert math.isclose(sum(r["raw_share"] for r in rows), 1.0, abs_tol=1e-4)
    # temperature < 1 flattens the distribution: every below-average source
    # gains weight relative to proportional sampling, every above-average
    # source loses it.
    assert MIXTURE_TEMPERATURE < 1
    for r in rows:
        if r["raw_share"] < 1.0 / len(rows):
            assert r["mixture_weight"] >= r["raw_share"]
        elif r["raw_share"] > 1.0 / len(rows):
            assert r["mixture_weight"] <= r["raw_share"]


def test_mixture_sample_hits_target_and_rebalances(spark):
    """Sample size lands near the target (floor rounding only loses a few
    per-mille per source), and with T < 1 no source dominates the sample
    the way it can dominate the corpus."""
    from polarify_spark.operators.corpus import (
        MIXTURE_SAMPLE_TARGET,
        docs_mixture_sample,
    )

    rows = docs_mixture_sample(spark, SF_DIR).toPandas()
    assert abs(len(rows) - MIXTURE_SAMPLE_TARGET) <= 0.25 * MIXTURE_SAMPLE_TARGET
    per_source = rows.groupby("source").size()
    # every represented source's rate was respected: bucket < rate everywhere
    assert (rows["bucket"] < rows["rate"]).all()
    assert per_source.max() <= MIXTURE_SAMPLE_TARGET  # no source swallows it


def test_retention_cohort_day_zero_is_total(spark):
    """Every user is active on their own cohort day, so offset-0 retention
    is exactly 1.0 for every cohort; offsets are non-negative and retention
    never exceeds 1."""
    from polarify_spark.operators.timeseries import retention_cohorts

    rows = retention_cohorts(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["day_offset"] >= 0
        assert 0 < r["retention"] <= 1.0 + 1e-9
        if r["day_offset"] == 0:
            assert r["n_active"] == r["cohort_size"], r


def test_gopher_metrics_are_consistent(spark):
    for r in text_gopher_quality(spark, SF_DIR).collect():
        assert r["n_words"] >= 1
        assert 0.0 <= r["alpha_word_ratio"] <= 1.0
        assert r["mean_word_len"] >= 0.0
        assert r["keep"] in (0, 1)


def test_vocab_rank_is_dense_and_df_monotone(spark):
    rows = sorted(docs_vocab_build(spark, SF_DIR).collect(), key=lambda r: r["rank"])
    assert rows, "vocabulary unexpectedly empty at sf0.001"
    assert len(rows) <= VOCAB_TOP_N
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    dfs = [r["df"] for r in rows]
    assert dfs == sorted(dfs, reverse=True)


def test_quality_calibration_keeps_top_half_per_source(spark):
    from polarify_spark.operators.corpus import docs_quality_calibrated

    kept = docs_quality_calibrated(spark, SF_DIR).toPandas()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").toPandas()
    per_source = docs.groupby("source").size()
    for source, kept_n in kept.groupby("source").size().items():
        total = per_source[source]
        # percent_rank >= 0.5 keeps the top half, within one row either way
        assert abs(kept_n - total / 2) <= 1, (source, kept_n, total)


def test_token_budget_pack_shards_are_contiguous_and_bounded(spark):
    from polarify_spark.operators.corpus import (
        SHARD_TOKEN_BUDGET,
        docs_token_budget_pack,
    )

    rows = docs_token_budget_pack(spark, SF_DIR).toPandas()
    for source, grp in rows.groupby("source"):
        grp = grp.sort_values("doc_id")
        shards = grp["shard_id"].tolist()
        assert shards == sorted(shards), f"non-monotone shards in {source}"
        # each shard's starting offsets stay under budget + one doc overflow
        cum = 0
        for _, r in grp.iterrows():
            assert r["shard_id"] == cum // SHARD_TOKEN_BUDGET
            cum += r["n_toks"]


def test_cms_never_underestimates(spark):
    rows = text_cms_heavy_hitters(spark, SF_DIR).collect()
    assert len(rows) == CMS_PROBE_TOP_N
    for r in rows:
        assert r["cms_count"] >= r["exact_count"], r
        assert r["overestimate"] == r["cms_count"] - r["exact_count"]
