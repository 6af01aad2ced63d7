"""Pins for the r18 package-audit fixes (dedup.py / streaming/jobs.py).

Four behaviors, each previously unpinned:
- dedup_graph_pagerank on an EMPTY near-dup graph returns the empty
  (doc_id, r_micro) frame its SQL oracle yields, instead of a
  ZeroDivisionError in the teleport sizing (cf. reference behavior:
  query operators degrade to empty results on empty inputs).
- _duplicate_components probes the committed durable artifact BEFORE
  building, so a durable refill reads the CC labels from disk instead
  of re-running the whole iterative loop and discarding the result.
- connected_components unpersists the symmetrized edge table on the
  non-convergence error path too, not only on success.
- run_to_parquet_sink's mkdtemp sink dirs are tracked and reaped by
  _cleanup_sink_dirs (atexit), and the batch/streaming session-gap
  constants stay equal (they share one oracle).
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_pagerank_empty_graph_returns_empty_not_zerodiv(spark):
    from polarify_spark.operators import dedup

    empty_pairs = spark.createDataFrame([], "d1 long, d2 long")
    orig = dedup._simhash_pairs_artifact
    # a corpus with no same-language pair within the Hamming radius:
    # fresh memo dict, empty pair artifact
    dedup._simhash_pairs_artifact = lambda s, d: ({}, empty_pairs)
    try:
        out = dedup.graph_pagerank(spark, "ignored-by-stub")
        assert out.columns == ["doc_id", "r_micro"]
        assert [f.dataType.simpleString() for f in out.schema.fields] == [
            "bigint",
            "bigint",
        ]
        assert out.count() == 0
    finally:
        dedup._simhash_pairs_artifact = orig


def test_duplicate_components_durable_refill_skips_cc_loop(spark, tmp_path):
    from polarify_spark.operators import dedup, release_shared_caches
    from polarify_spark.operators._memo import ARTIFACTS_DIR_CONF

    release_shared_caches(spark)
    spark.conf.set(ARTIFACTS_DIR_CONF, str(tmp_path / "artifacts"))
    orig = dedup.connected_components
    try:
        first = dedup.dedup_duplicate_clusters(
            spark, SF_DIR, algorithm="two-phase"
        )
        built = {tuple(r) for r in first.collect()}
        assert built

        # fresh-session memo state: artifacts on disk are the only
        # carryover — and the CC loop must NOT run again
        release_shared_caches(spark)

        def _must_not_run(*a, **kw):
            raise AssertionError(
                "durable refill re-ran the iterative CC loop"
            )

        dedup.connected_components = _must_not_run
        served = dedup.dedup_duplicate_clusters(
            spark, SF_DIR, algorithm="two-phase"
        )
        assert {tuple(r) for r in served.collect()} == built
    finally:
        dedup.connected_components = orig
        spark.conf.unset(ARTIFACTS_DIR_CONF)
        release_shared_caches(spark)


def test_connected_components_unpersists_on_nonconvergence(spark):
    from polarify_spark.operators.dedup import connected_components

    # a 4-node path graph needs >1 propagation round; max_iterations=1
    # forces the RuntimeError path
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "a long, b long"
    )
    # capture the DataFrames the loop persists (the symmetrized edge
    # table is the only .persist() call) and assert each is unpersisted
    # after the failure — counting persistent RDDs would false-positive
    # on the loop's legitimate localCheckpoint residue. Patch the
    # CONCRETE class (pyspark 4: sql.classic.dataframe.DataFrame), not
    # the pyspark.sql.DataFrame base, which the classic class overrides.
    DataFrame = type(edges)
    captured: list = []
    orig_persist = DataFrame.persist

    def capturing_persist(self, *a, **kw):
        captured.append(self)
        return orig_persist(self, *a, **kw)

    DataFrame.persist = capturing_persist
    try:
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(edges, src="a", dst="b", max_iterations=1)
    finally:
        DataFrame.persist = orig_persist
    assert captured, "the loop persists the symmetrized edge table"
    for df in captured:
        lvl = df.storageLevel
        assert not (lvl.useMemory or lvl.useDisk), (
            "edge table left pinned after non-convergence"
        )


def test_sink_dirs_tracked_and_reaped(tmp_path):
    from polarify_spark.streaming import jobs

    fake = tmp_path / "polarify_stream_out_fake"
    fake.mkdir()
    (fake / "part-0.parquet").write_bytes(b"x")
    jobs._SINK_DIRS.append(str(fake))
    jobs._cleanup_sink_dirs()
    assert not fake.exists()
    assert jobs._SINK_DIRS == []


def test_session_gap_constants_stay_equal():
    # jobs.py cannot import the constant (operators/__init__ imports the
    # streaming package to register queries — circular), so this pin is
    # the mechanism that makes batch/stream sessionize divergence a CI
    # failure instead of a runtime oracle mismatch
    from polarify_spark.operators.timeseries import (
        SESSION_GAP_MINUTES as batch_gap,
    )
    from polarify_spark.streaming.jobs import (
        SESSION_GAP_MINUTES as stream_gap,
    )

    assert batch_gap == stream_gap
