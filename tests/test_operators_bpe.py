"""Distributed BPE tokenizer training vs DuckDB oracle, plus a pure-Python
reference implementation of the merge semantics (greedy left-to-right,
non-overlapping, weighted by word counts) checked against the engine."""

from __future__ import annotations

from collections import Counter

import pytest

from polarify_spark.operators.bpe import BPE_MERGES, QUERIES, bpe_train

from .oracle_harness import compare_query

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", list(QUERIES), ids=list(QUERIES))
def test_bpe_matches_oracle(spark, name):
    fn, sql = QUERIES[name]
    compare_query(spark, SF_DIR, fn, sql)


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Textbook BPE on a weighted word-count table."""
    seqs = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += word_counts[w]
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((best[0], best[1], pair_counts[best]))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and (syms[i], syms[i + 1]) == best
                ):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges


def test_bpe_encode_compression_is_consistent(spark):
    """Tokens per doc shrink monotonically vs character tokenization and
    the compression ratio reproduces n_chars/n_tokens from raw columns."""
    from pyspark.sql import functions as F

    from polarify_spark.functions import whitespace_tokens
    from polarify_spark.operators.bpe import bpe_encode_stats

    out = bpe_encode_stats(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id",
        F.size(whitespace_tokens(F.col("text"))).alias("n_words_raw"),
        (
            F.length(F.regexp_replace("text", r"\s+", ""))
        ).alias("n_nonspace_chars"),
    )
    j = out.join(docs, "doc_id").collect()
    assert len(j) > 0
    for r in j:
        assert r["n_words"] == r["n_words_raw"]
        # BPE tokens: at least one per word, at most one per character
        assert r["n_words"] <= r["n_bpe_tokens"] <= r["n_nonspace_chars"]
        assert r["chars_per_token"] > 1.0  # 8 merges must compress


def test_bpe_matches_pure_python_reference(spark):
    from pyspark.sql import functions as F

    from polarify_spark.functions import whitespace_tokens

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    wc_rows = (
        docs.select(F.explode(whitespace_tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .count()
        .collect()
    )
    word_counts = {r["w"]: r["count"] for r in wc_rows}
    expected = _reference_bpe(word_counts, BPE_MERGES)

    got = sorted(bpe_train(spark, SF_DIR).collect(), key=lambda r: r["merge_idx"])
    assert len(got) == BPE_MERGES
    for row, (l, r, cnt) in zip(got, expected):
        assert (row["left_sym"], row["right_sym"], row["pair_count"]) == (
            l,
            r,
            cnt,
        ), row["merge_idx"]
    # the trajectory must actually iterate: some later merge builds on an
    # earlier merge's output (a multi-character symbol)
    assert any(
        len(r["left_sym"]) > 1 or len(r["right_sym"]) > 1 for r in got
    )


def test_bpe_property_random_word_sets(spark):
    """The relational merge algebra must equal the textbook sequential
    implementation on adversarial word shapes — overlapping runs ("aaaa"),
    merged symbols re-merging ("abab" -> "abab"), single chars, and skewed
    weights — not just on the benign corpus vocabulary."""
    import random

    from polarify_spark.operators.bpe import BPE_MERGES, _train

    rng = random.Random(20240814)
    # tiny alphabet ("abc") maximizes merge collisions per trial

    for trial in range(4):
        words = set()
        while len(words) < 12:
            n = rng.randint(1, 8)
            words.add("".join(rng.choice("abc") for _ in range(n)))
        counts = {w: rng.randint(1, 9) for w in sorted(words)}
        # adversarial regulars: runs and alternations
        counts["aaaa"] = 5
        counts["abababa"] = 3

        text_rows = [
            (" ".join([w] * c),) for w, c in sorted(counts.items())
        ]
        docs = spark.createDataFrame(text_rows, "text string")
        merges_df, _ = _train(spark, "", docs=docs)
        got = sorted(merges_df.collect(), key=lambda r: r["merge_idx"])
        expected = _reference_bpe(counts, BPE_MERGES)
        assert len(got) == len(expected), trial
        for row, (l, r, cnt) in zip(got, expected):
            assert (
                row["left_sym"],
                row["right_sym"],
                row["pair_count"],
            ) == (l, r, cnt), (trial, row["merge_idx"])


def test_durable_artifact_mode_bpe_parity(spark, tmp_path):
    """VERDICT r11 ask #5: the learned BPE merge table honors the durable
    artifact conf — identical merges in both modes, a committed
    `bpe_merges-<key>` artifact on disk, and reuse from a fresh memo
    state without a rewrite."""
    import os

    from polarify_spark.operators import release_shared_caches
    from polarify_spark.operators._memo import ARTIFACTS_DIR_CONF, COMMIT_MARKER

    # sets: row order is merge_idx-carried data, and a parquet read-back
    # does not preserve the training union's partition order
    merges_local = {tuple(r) for r in bpe_train(spark, SF_DIR).collect()}
    from polarify_spark.operators.bpe import bpe_encode_stats

    enc_local = {tuple(r) for r in bpe_encode_stats(spark, SF_DIR).collect()}

    release_shared_caches(spark, scope="all")
    spark.conf.set(ARTIFACTS_DIR_CONF, str(tmp_path / "artifacts"))
    art_dir = tmp_path / "artifacts"
    try:
        assert {tuple(r) for r in bpe_train(spark, SF_DIR).collect()} == merges_local
        names = sorted(p.name for p in art_dir.iterdir())
        assert any(n.startswith("bpe_merges-") for n in names), names
        # the encoder state is durable too (r12): a refill session reads
        # both tables and skips the training loop entirely
        assert any(n.startswith("bpe_state_syms-") for n in names), names
        for n in names:
            assert (art_dir / n / COMMIT_MARKER).exists(), n
        mtimes = {n: os.path.getmtime(art_dir / n) for n in names}

        release_shared_caches(spark, scope="all")
        assert {tuple(r) for r in bpe_train(spark, SF_DIR).collect()} == merges_local
        # encode through the read-back state must equal the local-mode run
        from polarify_spark.operators.bpe import bpe_encode_stats

        enc_durable = {tuple(r) for r in bpe_encode_stats(spark, SF_DIR).collect()}
        assert {n: os.path.getmtime(art_dir / n) for n in names} == mtimes
        assert enc_durable == enc_local
    finally:
        spark.conf.unset(ARTIFACTS_DIR_CONF)
        release_shared_caches(spark, scope="all")
