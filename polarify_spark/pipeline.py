"""User-facing training-corpus pipeline API.

``docs_training_corpus`` (operators/dedup.py) pins that the individually
oracle-verified stages *compose*; this module is the surface a pipeline
author actually calls: a frozen config choosing the gates, one builder
returning the surviving-document manifest, and a writer that lays the
corpus out as split-partitioned parquet ready for a training job's reader.

Every stage is the already-verified operator — this file adds composition
and layout, no new semantics. Scale shape is the composed query's: a
doc_id join spine of semi/left joins, scan-shaped gates first, and the
final write partitioned by the deterministic md5 split so downstream
readers prune to their split without touching the others.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

#: decontamination strategies, cheapest-broadcast to constant-memory.
DECONTAMINATE_MODES = ("broadcast", "semijoin", "bloom", "none")

#: quality-gate strategies, cheapest-first: "heuristic" (rule-based score
#: threshold — one shuffle-free scan), "charlm" (corpus-trained char-bigram
#: LM perplexity proxy — catches statistical outliers rules miss),
#: "logreg" (the in-engine trained classifier imitating and smoothing the
#: heuristic labels — the model-based filter production pipelines graduate
#: to). All three emit the heuristic quality score in the manifest; the
#: strategy only decides MEMBERSHIP.
QUALITY_GATES = ("heuristic", "charlm", "logreg")

#: documents with avg bigram NLL above this are statistical outliers vs the
#: corpus (the observed corpus distribution centers near 1.7 nats/char).
CHARLM_KEEP_MAX_NLL = 2.0


@dataclass(frozen=True)
class CorpusPipelineConfig:
    """Which gates a document must survive.

    ``decontaminate``: "broadcast" (collected eval-gram array — benchmark
    suites that fit one array), "semijoin" (distributed eval grams — the
    production default), "bloom" (constant-size bit-array broadcast —
    over-approximates, never under-flags), or "none".
    ``near_dedup``: LSH -> Jaccard -> connected components -> per-cluster
    keeper; exact content-hash dedup always runs.
    ``stratified_sample``: deterministic per-language hash downsampling.
    ``assign_split``: add the md5-bucket train/val/test column.
    ``leakage_safe_split``: gate the split on the near-dup CLUSTER id
    (``docs_leakage_safe_split``) instead of the doc id, so two
    near-duplicate documents can never land on opposite sides of the
    train/eval boundary. Costs one extra doc_id-keyed join; the cluster
    labels are the same memoized two-phase component build the near-dedup
    stage uses, so no extra iterative work when ``near_dedup`` is on.
    """

    decontaminate: str = "semijoin"
    quality_gate: str = "heuristic"
    near_dedup: bool = True
    stratified_sample: bool = True
    assign_split: bool = True
    leakage_safe_split: bool = False

    def __post_init__(self) -> None:
        if self.leakage_safe_split and not self.assign_split:
            raise ValueError(
                "leakage_safe_split requires assign_split=True"
            )
        if self.decontaminate not in DECONTAMINATE_MODES:
            raise ValueError(
                f"decontaminate must be one of {DECONTAMINATE_MODES}, "
                f"got {self.decontaminate!r}"
            )
        if self.quality_gate not in QUALITY_GATES:
            raise ValueError(
                f"quality_gate must be one of {QUALITY_GATES}, "
                f"got {self.quality_gate!r}"
            )


def build_training_corpus(
    spark: "SparkSession",
    sf_dir: str,
    config: CorpusPipelineConfig | None = None,
) -> "DataFrame":
    """The surviving-document manifest (doc_id, lang, quality[, split])
    under ``config``'s gates. Stage order and join spine match
    ``docs_training_corpus`` (oracle-verified); gates the config disables
    are simply not joined in."""
    from pyspark.sql import functions as F

    from .operators.corpus import hash_split_column
    from .operators.dedup import (
        dedup_cluster_keep_best,
        dedup_duplicate_clusters,
        dedup_exact,
        docs_decontaminate,
        docs_decontaminate_bloom,
        docs_decontaminate_semijoin,
    )
    from .operators.text import (
        docs_quality_filter,
        docs_stratified_sample,
        quality_score,
    )

    cfg = config or CorpusPipelineConfig()

    if cfg.quality_gate == "heuristic":
        out = docs_quality_filter(spark, sf_dir).select("doc_id", "quality")
    else:
        # manifest still carries the heuristic score; the model decides
        # membership via a doc_id semi-join (one extra keyed join, both
        # sides uniform on doc_id)
        out = quality_score(spark, sf_dir).select("doc_id", "quality")
        if cfg.quality_gate == "charlm":
            from .operators.search import charlm_quality

            # charlm_quality only scores docs with >= CHARLM_NGRAM chars
            # (shorter docs have no bigrams), so the semi-join below also
            # drops sub-bigram docs regardless of quality — intentional:
            # a 0-1 char document is never corpus-worthy, and an explicit
            # keep-unscored union would re-admit exactly that junk.
            keep = charlm_quality(spark, sf_dir).where(
                F.col("avg_nll") <= CHARLM_KEEP_MAX_NLL
            )
        else:
            from .operators.ml import logreg_quality

            keep = logreg_quality(spark, sf_dir).where(F.col("pred"))
        out = out.join(keep.select("doc_id"), "doc_id", "semi")
    if cfg.stratified_sample:
        out = out.join(
            docs_stratified_sample(spark, sf_dir).select("doc_id", "lang"), "doc_id"
        )
    else:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = out.join(docs.select("doc_id", "lang"), "doc_id")

    exact_keepers = dedup_exact(spark, sf_dir).select(
        F.col("keeper_doc_id").alias("doc_id")
    )
    out = out.join(exact_keepers, "doc_id", "semi")

    if cfg.decontaminate != "none":
        gate = {
            "broadcast": docs_decontaminate,
            "semijoin": docs_decontaminate_semijoin,
            "bloom": docs_decontaminate_bloom,
        }[cfg.decontaminate]
        clean = gate(spark, sf_dir).where(~F.col("contaminated")).select("doc_id")
        out = out.join(clean, "doc_id", "semi")

    if cfg.near_dedup:
        # two-phase star: O(log n) rounds (the at-scale algorithm) and the
        # same labels as propagation by construction (equivalence-pinned);
        # shares the memoized build with dedup_cluster_keep_best below
        clustered = dedup_duplicate_clusters(
            spark, sf_dir, algorithm="two-phase"
        ).select("doc_id", "component_id")
        keepers = dedup_cluster_keep_best(spark, sf_dir).select(
            F.col("keeper_doc_id").alias("doc_id"), F.lit(True).alias("is_keeper")
        )
        out = (
            out.join(clustered, "doc_id", "left")
            .join(keepers, "doc_id", "left")
            .where(
                F.col("component_id").isNull()
                | F.coalesce(F.col("is_keeper"), F.lit(False))
            )
            .drop("component_id", "is_keeper")
        )

    cols = ["doc_id", "lang", "quality"]
    if cfg.assign_split:
        if cfg.leakage_safe_split:
            from .operators.refine import docs_leakage_safe_split

            out = out.join(
                docs_leakage_safe_split(spark, sf_dir).select(
                    "doc_id", "split"
                ),
                "doc_id",
            )
        else:
            out = out.withColumn(
                "split", hash_split_column(F.col("doc_id"))
            )
        cols.append("split")
    return out.select(*cols)


def write_training_corpus(
    manifest: "DataFrame", docs: "DataFrame", path: str
) -> None:
    """Join the manifest back to the document payloads and write the corpus
    split-partitioned: ``path/split=train/...`` etc. Readers of one split
    prune the others at the directory level (partition pruning — pinned for
    the generic writer in tests/test_plan_shapes.py). The join keys on
    doc_id — uniform, co-partitionable — and the manifest side is the
    smaller post-gate survivor set."""
    if "split" not in manifest.columns:
        raise ValueError(
            "manifest has no 'split' column; build with assign_split=True"
        )
    corpus = docs.join(
        manifest.select("doc_id", "quality", "split"), "doc_id"
    )
    corpus.write.mode("overwrite").partitionBy("split").parquet(path)
