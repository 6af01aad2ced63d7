"""The user-facing pipeline API: composition equals the oracle-verified
composed query, config gates behave monotonically, and the writer lays out
a split-partitioned corpus."""

from __future__ import annotations

import pytest

from polarify_spark.pipeline import (
    CorpusPipelineConfig,
    build_training_corpus,
    write_training_corpus,
)

SF_DIR = "/root/testdata/sf0.001"


def _ids(df) -> set[int]:
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_default_config_matches_composed_query(spark):
    """Default pipeline == docs_training_corpus (the oracle-verified
    composition), plus the split column."""
    from polarify_spark.operators.dedup import docs_training_corpus

    mine = build_training_corpus(spark, SF_DIR)
    assert set(mine.columns) == {"doc_id", "lang", "quality", "split"}
    assert _ids(mine) == _ids(docs_training_corpus(spark, SF_DIR))
    splits = {r["split"] for r in mine.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}


def test_gates_are_monotone(spark):
    """Disabling a gate can only let more documents through; the bloom
    decontaminator (over-approximating) passes a subset of semijoin's
    survivors."""
    base = _ids(build_training_corpus(spark, SF_DIR))
    no_decontam = _ids(
        build_training_corpus(
            spark, SF_DIR, CorpusPipelineConfig(decontaminate="none")
        )
    )
    no_neardup = _ids(
        build_training_corpus(spark, SF_DIR, CorpusPipelineConfig(near_dedup=False))
    )
    bloom = _ids(
        build_training_corpus(
            spark, SF_DIR, CorpusPipelineConfig(decontaminate="bloom")
        )
    )
    assert base <= no_decontam
    assert base <= no_neardup
    assert bloom <= base


def test_invalid_decontaminate_mode_rejected():
    with pytest.raises(ValueError, match="decontaminate must be one of"):
        CorpusPipelineConfig(decontaminate="magic")


def test_writer_partitions_by_split(spark, tmp_path):
    from pathlib import Path

    manifest = build_training_corpus(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "corpus")
    write_training_corpus(manifest, docs, out)

    dirs = {p.name for p in Path(out).iterdir() if p.name.startswith("split=")}
    assert "split=train" in dirs, dirs
    back = spark.read.parquet(out)
    assert set(back.columns) >= {"doc_id", "text", "quality", "split"}
    assert back.count() == manifest.count()

    unsplit = build_training_corpus(
        spark, SF_DIR, CorpusPipelineConfig(assign_split=False)
    )
    with pytest.raises(ValueError, match="no 'split' column"):
        write_training_corpus(unsplit, docs, out)


def test_quality_gate_strategies(spark):
    """Each strategy yields a non-empty manifest with the same schema; the
    model gates select real subsets of the corpus (not everything, not
    nothing), and an unknown strategy is rejected at config time."""
    import pytest

    from polarify_spark.pipeline import CorpusPipelineConfig, build_training_corpus

    sf = "/root/testdata/sf0.001"
    base_cfg = dict(
        decontaminate="none",
        near_dedup=False,
        stratified_sample=False,
        assign_split=False,
    )
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    counts = {}
    schemas = set()
    for gate in ("heuristic", "charlm", "logreg"):
        m = build_training_corpus(
            spark, sf, CorpusPipelineConfig(quality_gate=gate, **base_cfg)
        )
        schemas.add(tuple(m.columns))
        counts[gate] = m.count()
        assert 0 < counts[gate] <= n_docs, gate
    assert schemas == {("doc_id", "lang", "quality")}
    # logreg learned the heuristic labels to high accuracy: survivor counts
    # must be close (within 5%), while not required to be identical
    assert abs(counts["logreg"] - counts["heuristic"]) <= 0.05 * n_docs

    with pytest.raises(ValueError, match="quality_gate"):
        CorpusPipelineConfig(quality_gate="vibes")


def test_leakage_safe_split_matches_query_and_membership_unchanged(spark):
    """``leakage_safe_split=True`` must not change WHICH documents survive
    (it only re-derives the split column), every surviving document's fold
    must equal the registered ``docs_leakage_safe_split`` assignment, and
    the flag without ``assign_split`` is rejected."""
    from polarify_spark.operators.refine import docs_leakage_safe_split

    default = build_training_corpus(spark, SF_DIR)
    safe = build_training_corpus(
        spark, SF_DIR, CorpusPipelineConfig(leakage_safe_split=True)
    )
    assert _ids(safe) == _ids(default)
    assert set(safe.columns) == {"doc_id", "lang", "quality", "split"}

    want = {
        r["doc_id"]: r["split"]
        for r in docs_leakage_safe_split(spark, SF_DIR).collect()
    }
    got = {r["doc_id"]: r["split"] for r in safe.collect()}
    assert all(want[d] == s for d, s in got.items())

    with pytest.raises(ValueError, match="assign_split"):
        CorpusPipelineConfig(leakage_safe_split=True, assign_split=False)
