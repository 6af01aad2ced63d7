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


def _mean_recall_by_method(df) -> dict[str, float]:
    from pyspark.sql import functions as F

    return {
        r["method"]: r["mean_recall"]
        for r in df.groupBy("method")
        .agg(F.avg("recall_at_k").alias("mean_recall"))
        .collect()
    }


def test_clustered_recall_floors(spark):
    """On clustered vectors the indexes must clear real recall floors —
    the uniform-testdata recall (~analytic floor) proves only the harness;
    this proves the index shapes. Measured: IVF probe-1/probe-2 = 1.0,
    RP-LSH 0.26, RP-LSH probe-2 0.36-0.39 (8 planes cut through clusters,
    multi-probe recovers one boundary — the documented lever)."""
    from polarify_spark.operators.similarity import similarity_recall_clustered

    means = _mean_recall_by_method(similarity_recall_clustered(spark, SF_DIR))
    assert means["ivf"] >= 0.9, means
    assert means["ivf_probe2"] >= 0.9, means
    assert means["rplsh"] >= 0.15, means
    assert means["rplsh_probe2"] >= 0.25, means
    # the probe lever must actually lever
    assert means["rplsh_probe2"] > means["rplsh"], means
    # AND-OR amplification (4 tables x 4 planes, OR'd) is the lever that
    # makes LSH competitive on clustered data: measured 0.875, floor 0.7,
    # and it must dominate both single-table configurations
    assert means["rplsh_mt"] >= 0.7, means
    assert means["rplsh_mt"] > means["rplsh_probe2"], means
    # int8 quantization must be near-lossless (it is brute force over
    # dequantized codes — only quantization noise can cost recall)
    assert means["sq8"] >= 0.9, means
    # PQ trades much deeper compression (~12-16 bytes/vector vs SQ8's 64)
    # for recall; with Lloyd-trained per-subspace codebooks it must hold
    # the measured 0.85 clustered recall (floor 0.8) and beat every
    # bucket-pruned index
    assert means["pq"] >= 0.8, means
    assert means["pq"] > means["rplsh_probe2"], means


def test_sq8_recall_near_exact_on_uniform_data(spark):
    """SQ8 recall is high even on uniform vectors — unlike the bucketed
    indexes it prunes nothing, it compresses; recall loss can come only
    from per-dim quantization noise (range/255)."""
    from polarify_spark.operators.similarity import similarity_recall

    means = _mean_recall_by_method(similarity_recall(spark, SF_DIR))
    assert means["sq8"] >= 0.9, means


def test_clustered_recall_beats_uniform(spark):
    """The same IVF index that sits near the analytic floor on uniform
    vectors must achieve near-exact recall on clustered ones — separating
    'index is correct' from 'data has no neighborhood structure'."""
    from polarify_spark.operators.similarity import (
        similarity_recall,
        similarity_recall_clustered,
    )

    uniform = _mean_recall_by_method(similarity_recall(spark, SF_DIR))
    clustered = _mean_recall_by_method(similarity_recall_clustered(spark, SF_DIR))
    assert clustered["ivf"] > uniform["ivf"] + 0.3, (uniform, clustered)
    assert clustered["rplsh"] > uniform["rplsh"], (uniform, clustered)


def test_kmeans_recovers_planted_clusters(spark):
    """Training on the clustered table must converge to centroids that
    assign (essentially) every vector to its planted cluster — the
    demonstration that the Lloyd iteration optimizes, not just runs."""
    from pyspark.sql import functions as F

    from polarify_spark.operators.similarity import (
        _assign_to_centroids,
        clustered_embeddings,
        kmeans_centroids,
    )

    emb = clustered_embeddings(spark, SF_DIR).cache()
    flat = kmeans_centroids(spark, SF_DIR, emb=emb)
    cents = flat.groupBy("cell_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "centroid"))),
            lambda s: s["centroid"],
        ).alias("cent_vec")
    )
    assigned = _assign_to_centroids(emb, cents)
    agree = assigned.where(
        F.col("cell_id") == F.col("vec_id") % 8
    ).count() / assigned.count()
    assert agree >= 0.95, agree


def test_pq_rerank_dominates_plain_pq(spark):
    """The two-stage serving pattern must (a) score survivors with TRUE
    cosines and (b) never lose recall vs plain PQ at the same k — the
    exact re-rank can only fix stage-1 ordering mistakes inside the
    shortlist, not introduce new ones."""
    from polarify_spark.operators.similarity import (
        topk_bruteforce,
        topk_pq,
        topk_pq_rerank,
    )

    sf = SF_DIR

    def by_query(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["q_id"], {})[r["neighbor_id"]] = r["cosine"]
        return out

    exact = by_query(topk_bruteforce(spark, sf))
    pq = by_query(topk_pq(spark, sf))
    rr = by_query(topk_pq_rerank(spark, sf))

    assert set(rr) == set(exact)
    total_pq = total_rr = 0
    for q in exact:
        exact_ids = set(exact[q])
        total_pq += len(exact_ids & set(pq[q]))
        total_rr += len(exact_ids & set(rr[q]))
        # every reranked cosine that also appears in the exact list must
        # BE the exact cosine (stage 2 used full-precision vectors)
        for nid, cos in rr[q].items():
            if nid in exact[q]:
                assert cos == exact[q][nid], (q, nid)
    assert total_rr >= total_pq


def test_durable_artifact_mode_ann_parity(spark, tmp_path):
    """VERDICT r11 ask #5: the trained ANN structures (PQ codebook,
    SQ8 stats, the PQ-encoded corpus) honor the durable artifact conf —
    identical query results in both modes, index artifacts published
    with the commit marker, and a fresh memo state re-reads (never
    rewrites) them."""
    import os

    from polarify_spark.operators import release_shared_caches
    from polarify_spark.operators._memo import ARTIFACTS_DIR_CONF, COMMIT_MARKER
    from polarify_spark.operators.similarity import topk_pq, topk_sq8

    art_dir = tmp_path / "artifacts"

    pq_local = {tuple(r) for r in topk_pq(spark, SF_DIR).collect()}
    sq8_local = {tuple(r) for r in topk_sq8(spark, SF_DIR).collect()}

    release_shared_caches(spark, scope="ann")
    spark.conf.set(ARTIFACTS_DIR_CONF, str(art_dir))
    try:
        assert {tuple(r) for r in topk_pq(spark, SF_DIR).collect()} == pq_local
        assert {tuple(r) for r in topk_sq8(spark, SF_DIR).collect()} == sq8_local
        names = sorted(p.name for p in art_dir.iterdir())
        assert any(n.startswith("pq_codebook") for n in names), names
        assert any(n.startswith("pq_dequantized-") for n in names), names
        assert any(n.startswith("sq8_stats-") for n in names), names
        assert not any(".tmp-" in n for n in names), names
        for n in names:
            assert (art_dir / n / COMMIT_MARKER).exists(), n
        mtimes = {n: os.path.getmtime(art_dir / n) for n in names}

        # fresh memo state (a new session in spirit): read back, not rebuilt
        release_shared_caches(spark, scope="ann")
        assert {tuple(r) for r in topk_pq(spark, SF_DIR).collect()} == pq_local
        assert sorted(p.name for p in art_dir.iterdir()) == names
        assert {n: os.path.getmtime(art_dir / n) for n in names} == mtimes
    finally:
        spark.conf.unset(ARTIFACTS_DIR_CONF)
        release_shared_caches(spark, scope="ann")
