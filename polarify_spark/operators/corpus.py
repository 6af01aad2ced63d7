"""Corpus-assembly operators: deterministic splits, mixture weighting,
Gopher-style quality gates, vocabulary building, and a count-min sketch.

These are the remaining steps a large-scale training-data pipeline runs
between per-document feature extraction (``operators/text.py``) and corpus
composition (``operators/dedup.py``): assign every document to an auditable
train/val/test split, rebalance the source mixture with temperature scaling
(the mT5/Gopher move), apply the published Gopher quality heuristics, build
the document-frequency vocabulary, and sketch heavy-hitter token counts so
the vocabulary pass never needs the full term dictionary in one place.

Scale shapes (100 TB): the split and the Gopher gate are shuffle-free scan
projections; the mixture weights aggregate to one row per *source* (a
handful of groups — one uniform shuffle with map-side combine, then a
broadcast of the tiny totals row); vocabulary and sketch shuffle once on the
token (vocabulary-sized, not corpus-sized) and the sketch then collapses to
``depth x width`` cells (1024 rows here) regardless of corpus size — that
fixed memory footprint is the whole point of a count-min sketch.

The reference (Quantco/polarify, a 441-LoC transpiler) has none of these;
they implement the build brief's LLM-data-pipeline extension set, each
oracle-checked against DuckDB. Hashing follows the portable md5 idiom of
``polarify_spark.functions.hashing`` so both engines bucket identically.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Callable

from ..functions import md5_long, whitespace_tokens

if TYPE_CHECKING:
    from pyspark.sql import Column, DataFrame, SparkSession


def _docs(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


#: DuckDB twin of ``md5_long(c, 8)`` — keep in sync with functions/hashing.py
def _md5_bigint_sql(expr: str) -> str:
    return f"CAST(CONCAT('0x', SUBSTR(md5({expr}), 1, 8)) AS BIGINT)"


# --- deterministic train/val/test split -------------------------------------

#: per-mille style split bounds out of 100 md5 buckets: [0,98) train,
#: [98,99) val, [99,100) test — the conventional 98/1/1 pretraining split.
SPLIT_TRAIN_UPTO = 98
SPLIT_VAL_UPTO = 99


def hash_split_column(doc_id: "Column") -> "Column":
    """The train/val/test assignment as a column expression over doc_id —
    shared by :func:`docs_hash_split` and the pipeline API so every
    consumer derives the identical split."""
    from pyspark.sql import functions as F

    bucket = F.pmod(md5_long(doc_id.cast("string"), 8), F.lit(100))
    return (
        F.when(bucket < SPLIT_TRAIN_UPTO, F.lit("train"))
        .when(bucket < SPLIT_VAL_UPTO, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def docs_hash_split(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Assign every document to train/val/test by ``md5(doc_id) mod 100``
    and summarize each split (documents, whitespace tokens, characters).

    A hash split — unlike ``randomSplit`` — is a pure function of the row:
    re-runs, retries, and cluster layout cannot move a document between
    splits, and any engine can re-derive the assignment for audit. The
    summary is one uniform 3-group shuffle with map-side combine; the
    per-document assignment itself is a shuffle-free projection a pipeline
    would write straight back to partitioned parquet."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    return (
        docs.select(
            hash_split_column(F.col("doc_id")).alias("split"),
            F.size(whitespace_tokens(F.col("text"))).alias("n_toks"),
            F.length("text").alias("n_chars"),
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.sum("n_chars").alias("n_chars"),
        )
    )


DOCS_HASH_SPLIT_SQL = rf"""
WITH assigned AS (
  SELECT CASE
           WHEN {_md5_bigint_sql("CAST(doc_id AS VARCHAR)")} % 100
                < {SPLIT_TRAIN_UPTO} THEN 'train'
           WHEN {_md5_bigint_sql("CAST(doc_id AS VARCHAR)")} % 100
                < {SPLIT_VAL_UPTO} THEN 'val'
           ELSE 'test'
         END AS split,
         len(string_split_regex(trim(text), '\s+')) AS n_toks,
         length(text) AS n_chars
  FROM documents
)
SELECT split, COUNT(*) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM assigned GROUP BY 1
"""


# --- temperature-scaled source mixture --------------------------------------

#: mixture temperature: weights proportional to n^T with T < 1 upsample the
#: tail sources relative to proportional sampling (T=1), the standard
#: multilingual-corpus rebalancing (mT5 alpha = 0.3, Gopher ~ 0.7).
MIXTURE_TEMPERATURE = 0.7


def docs_source_mixture(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Temperature-scaled sampling weights per source: weight_i proportional
    to ``n_i ** T`` normalized over sources, next to each source's raw share.

    One uniform groupBy on ``source`` (few groups, map-side combine); the
    normalizing total is a one-row broadcast — nothing driver-side. At 100 TB
    the output is still one row per source; a sampler then consumes these
    weights through the deterministic hash gate of ``docs_stratified_sample``.
    """
    from pyspark.sql import functions as F

    counts = (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum(F.length("text")).alias("n_chars"))
    )
    scaled = counts.withColumn(
        "scaled", F.pow(F.col("n_docs").cast("double"), F.lit(MIXTURE_TEMPERATURE))
    )
    totals = scaled.agg(
        F.sum("n_docs").alias("total_docs"), F.sum("scaled").alias("total_scaled")
    )
    return (
        scaled.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "n_chars",
            F.round(F.col("n_docs") / F.col("total_docs"), 6).alias("raw_share"),
            F.round(F.col("scaled") / F.col("total_scaled"), 6).alias("mixture_weight"),
        )
    )


DOCS_SOURCE_MIXTURE_SQL = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(length(text)) AS BIGINT) AS n_chars
  FROM documents GROUP BY 1
),
scaled AS (
  SELECT *, POWER(CAST(n_docs AS DOUBLE), {MIXTURE_TEMPERATURE}) AS scaled
  FROM counts
),
totals AS (
  SELECT SUM(n_docs) AS total_docs, SUM(scaled) AS total_scaled FROM scaled
)
SELECT source, n_docs, n_chars,
       ROUND(n_docs / total_docs, 6) AS raw_share,
       ROUND(scaled / total_scaled, 6) AS mixture_weight
FROM scaled CROSS JOIN totals
"""


# --- Gopher-style quality gate ----------------------------------------------

#: published Gopher heuristics (Rae et al. 2021, appendix A1.1), scaled to
#: this corpus: word-count bounds, mean-word-length band, minimum fraction
#: of words containing an alphabetic character, and a stopword floor.
GOPHER_MIN_WORDS = 10
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 2.0
GOPHER_MAX_MEAN_WORD_LEN = 12.0
GOPHER_MIN_ALPHA_WORD_RATIO = 0.8
GOPHER_MIN_STOPWORD_HITS = 1
GOPHER_STOPWORDS = ("the", "a", "el", "la", "der", "das")


def text_gopher_quality(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Per-document Gopher quality metrics and the resulting keep flag.

    Entirely array/regex expression work over one scan — shuffle-free, fuses
    into whole-stage codegen, and column pruning reads only (doc_id, text).
    The keep flag is emitted as int 0/1 so downstream partitioned writes and
    the oracle compare are engine-neutral."""
    from pyspark.sql import functions as F

    toks = whitespace_tokens(F.col("text"))
    n_words = F.size(toks)
    non_ws_chars = F.length(F.regexp_replace(F.trim(F.col("text")), r"\s+", ""))
    mean_word_len = non_ws_chars / n_words
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    alpha_ratio = alpha_words / n_words
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*[F.lit(s) for s in GOPHER_STOPWORDS]))
    )
    keep = (
        n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & (mean_word_len >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_word_len <= GOPHER_MAX_MEAN_WORD_LEN)
        & (alpha_ratio >= GOPHER_MIN_ALPHA_WORD_RATIO)
        & (stop_hits >= GOPHER_MIN_STOPWORD_HITS)
    )
    return _docs(spark, sf_dir).select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
        stop_hits.alias("stopword_hits"),
        keep.cast("int").alias("keep"),
    )


TEXT_GOPHER_QUALITY_SQL = rf"""
WITH m AS (
  SELECT doc_id,
         string_split_regex(trim(text), '\s+') AS w,
         length(regexp_replace(trim(text), '\s+', '', 'g')) AS non_ws_chars
  FROM documents
),
f AS (
  SELECT doc_id,
         len(w) AS n_words,
         non_ws_chars::DOUBLE / len(w) AS mean_word_len,
         len(list_filter(w, t -> regexp_matches(t, '[a-z]')))::DOUBLE
           / len(w) AS alpha_word_ratio,
         len(list_filter(w, t -> list_contains(
             {list(GOPHER_STOPWORDS)!r}, t))) AS stopword_hits
  FROM m
)
SELECT doc_id, CAST(n_words AS INTEGER) AS n_words,
       ROUND(mean_word_len, 6) AS mean_word_len,
       ROUND(alpha_word_ratio, 6) AS alpha_word_ratio,
       CAST(stopword_hits AS INTEGER) AS stopword_hits,
       CAST(n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
            AND mean_word_len >= {GOPHER_MIN_MEAN_WORD_LEN}
            AND mean_word_len <= {GOPHER_MAX_MEAN_WORD_LEN}
            AND alpha_word_ratio >= {GOPHER_MIN_ALPHA_WORD_RATIO}
            AND stopword_hits >= {GOPHER_MIN_STOPWORD_HITS} AS INTEGER) AS keep
FROM f
"""


# --- document-frequency vocabulary ------------------------------------------

VOCAB_MIN_DF = 3
VOCAB_MAX_DF_RATIO = 0.8
VOCAB_TOP_N = 200


def docs_vocab_build(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Document-frequency vocabulary: distinct tokens per document, df count
    per token, ``min_df``/``max_df`` banding (drop hapax noise and
    boilerplate that appears in >80% of documents), top-N by (df desc,
    token asc) with a stable rank.

    Shape at scale: per-document ``array_distinct`` happens inside the scan
    stage, the explode shuffles once on the token (vocabulary-sized), the
    corpus count rides a one-row broadcast, and the final top-N is a
    ``TakeOrderedAndProject`` — the full vocabulary is never sorted or
    collected in one place."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir)
    df_t = (
        docs.select(
            F.explode(F.array_distinct(whitespace_tokens(F.col("text")))).alias("token")
        )
        .groupBy("token")
        .agg(F.count("*").alias("df"))
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    banded = (
        df_t.crossJoin(F.broadcast(n_docs))
        .where(
            (F.col("df") >= VOCAB_MIN_DF)
            & (F.col("df") <= F.col("n_docs") * VOCAB_MAX_DF_RATIO)
        )
        .select("token", "df")
    )
    w = Window.orderBy(F.col("df").desc(), F.col("token").asc())
    return (
        banded.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= VOCAB_TOP_N)
    )


DOCS_VOCAB_BUILD_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS token
  FROM documents
),
df_t AS (
  SELECT token, COUNT(*) AS df FROM toks GROUP BY 1
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
banded AS (
  SELECT token, df FROM df_t CROSS JOIN n
  WHERE df >= {VOCAB_MIN_DF} AND df <= n_docs * {VOCAB_MAX_DF_RATIO}
),
ranked AS (
  SELECT token, df,
         ROW_NUMBER() OVER (ORDER BY df DESC, token ASC) AS rank
  FROM banded
)
SELECT token, df, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {VOCAB_TOP_N}
"""


# --- fixed-window chunk dedup -------------------------------------------------

#: tokens per chunk for the repeated-span detector.
CHUNK_TOKENS = 32


def text_chunk_dedup(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Repeated-span detector: split every document into fixed
    ``CHUNK_TOKENS``-token chunks, hash each chunk, and report chunks that
    occur more than once across the corpus (boilerplate headers, license
    blocks, navigation text — the spans a pipeline strips before training).

    Corpus-free-text rarely aligns on document boundaries, so span-level
    dedup catches duplication that document-level hashing misses. Shape at
    scale: chunking is array expression work inside the scan; the only
    shuffle keys on the uniform chunk hash with map-side combine — output
    is the duplicated-chunk dictionary, vocabulary-sized, not
    corpus-sized."""
    from pyspark.sql import functions as F

    toks = whitespace_tokens(F.col("text"))
    n_chunks = F.ceil(F.size(toks) / CHUNK_TOKENS).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(
            " ", F.slice(toks, i * CHUNK_TOKENS + 1, CHUNK_TOKENS)
        ),
    )
    exploded = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(chunks).alias("chunk"))
        .select("doc_id", F.md5("chunk").alias("chunk_hash"))
    )
    return (
        exploded.groupBy("chunk_hash")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .where(F.col("n_occurrences") > 1)
    )


TEXT_CHUNK_DEDUP_SQL = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
),
chunks AS (
  SELECT doc_id,
         md5(array_to_string(
             w[(i * {CHUNK_TOKENS} + 1):((i + 1) * {CHUNK_TOKENS})], ' '
         )) AS chunk_hash
  FROM toks,
       LATERAL unnest(range(0, CAST(CEIL(len(w) / {CHUNK_TOKENS}.0) AS BIGINT))) AS t(i)
)
SELECT chunk_hash, COUNT(*) AS n_occurrences,
       COUNT(DISTINCT doc_id) AS n_docs
FROM chunks GROUP BY 1 HAVING COUNT(*) > 1
"""


# --- count-min sketch over token counts -------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_PROBE_TOP_N = 20


def _cms_cell(token: "Column", d: int) -> "Column":
    """Row ``d``'s cell index for ``token`` — portable md5 bucket."""
    from pyspark.sql import functions as F

    return F.pmod(md5_long(F.concat(F.lit(f"{d}:"), token), 8), F.lit(CMS_WIDTH))


def text_cms_heavy_hitters(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Count-min sketch over corpus token occurrences, probed at the exact
    top-N heavy hitters: for each probe token, the exact count, the sketch
    estimate (min over depth rows of the hashed cell's sum), and the
    overestimate — by construction ``cms_count >= exact_count``.

    Shape at scale: token counts shuffle once on the token (map-side
    combine), then collapse into ``CMS_DEPTH x CMS_WIDTH`` = 1024 cells —
    the sketch's memory is *constant* in corpus size, which is what lets a
    100 TB pipeline keep approximate per-token counts without materializing
    the vocabulary. The probe side is ``CMS_PROBE_TOP_N`` rows and
    broadcast-joins against the cell table."""
    from pyspark.sql import functions as F

    tc = (
        _docs(spark, sf_dir)
        .select(F.explode(whitespace_tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    cells = (
        tc.select(
            "cnt",
            F.posexplode(
                F.array(*[_cms_cell(F.col("token"), d) for d in range(CMS_DEPTH)])
            ).alias("d", "cell"),
        )
        .groupBy("d", "cell")
        .agg(F.sum("cnt").alias("cell_sum"))
    )
    heavy = tc.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(
        CMS_PROBE_TOP_N
    )
    probes = heavy.select(
        "token",
        "cnt",
        F.posexplode(
            F.array(*[_cms_cell(F.col("token"), d) for d in range(CMS_DEPTH)])
        ).alias("d", "cell"),
    )
    return (
        cells.join(F.broadcast(probes), ["d", "cell"])
        .groupBy("token", "cnt")
        .agg(F.min("cell_sum").alias("cms_count"))
        .select(
            "token",
            F.col("cnt").alias("exact_count"),
            "cms_count",
            (F.col("cms_count") - F.col("cnt")).alias("overestimate"),
        )
    )


def _cms_cell_sql(token_expr: str, d: int) -> str:
    salted = f"CONCAT('{d}:', {token_expr})"
    return f"{_md5_bigint_sql(salted)} % {CMS_WIDTH}"


def _cms_sql() -> str:
    cell_rows = "\nUNION ALL\n".join(
        f"SELECT {d} AS d, {_cms_cell_sql('token', d)} AS cell, cnt FROM tc"
        for d in range(CMS_DEPTH)
    )
    probe_rows = "\nUNION ALL\n".join(
        f"SELECT token, cnt, {d} AS d, {_cms_cell_sql('token', d)} AS cell FROM heavy"
        for d in range(CMS_DEPTH)
    )
    return rf"""
WITH tc AS (
  SELECT token, COUNT(*) AS cnt FROM (
    SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
    FROM documents
  ) GROUP BY 1
),
cell_rows AS (
{cell_rows}
),
cells AS (
  SELECT d, cell, CAST(SUM(cnt) AS BIGINT) AS cell_sum
  FROM cell_rows GROUP BY 1, 2
),
heavy AS (
  SELECT token, cnt FROM tc ORDER BY cnt DESC, token ASC LIMIT {CMS_PROBE_TOP_N}
),
probes AS (
{probe_rows}
)
SELECT p.token, p.cnt AS exact_count,
       CAST(MIN(c.cell_sum) AS BIGINT) AS cms_count,
       CAST(MIN(c.cell_sum) - p.cnt AS BIGINT) AS overestimate
FROM probes p JOIN cells c USING (d, cell)
GROUP BY p.token, p.cnt
"""


TEXT_CMS_HEAVY_HITTERS_SQL = _cms_sql()


# --- mixture-weighted deterministic sampling ----------------------------------

#: expected sample size (documents) the mixture-weighted sampler targets.
MIXTURE_SAMPLE_TARGET = 200


def docs_mixture_sample(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """The mixture loop closed: convert :func:`docs_source_mixture`'s
    temperature-scaled weights into per-source keep rates and apply them
    through the deterministic md5 hash gate — each source contributes
    ~``weight x target`` documents, and the selection is a pure function of
    the row (auditable, repeatable across engines and retries, unlike
    RNG-seeded ``sampleBy``).

    The rate is ``floor(weight x target / n_docs x 1000)`` per-mille
    (floor, not round: the two engines' .5-tie conventions differ; both
    compute the same double product from the same 6-decimal weight, so the
    floor is engine-exact). Shape at scale: the weights table is one row
    per source and broadcast-joins onto the scan; the gate itself is a
    shuffle-free projection."""
    from pyspark.sql import functions as F

    weights = docs_source_mixture(spark, sf_dir).select(
        "source", "n_docs", "mixture_weight"
    )
    rate = F.floor(
        F.col("mixture_weight") * MIXTURE_SAMPLE_TARGET / F.col("n_docs") * 1000
    ).cast("int")
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    bucket = F.pmod(md5_long(F.col("doc_id").cast("string"), 8), F.lit(1000)).cast(
        "int"
    )
    return (
        docs.join(F.broadcast(weights), "source")
        .select("doc_id", "source", bucket.alias("bucket"), rate.alias("rate"))
        .where(F.col("bucket") < F.col("rate"))
    )


DOCS_MIXTURE_SAMPLE_SQL = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1
),
scaled AS (
  SELECT source, n_docs,
         POWER(CAST(n_docs AS DOUBLE), {MIXTURE_TEMPERATURE}) AS scaled
  FROM counts
),
weights AS (
  SELECT source, n_docs,
         ROUND(scaled / (SELECT SUM(scaled) FROM scaled), 6) AS mixture_weight
  FROM scaled
),
gated AS (
  SELECT d.doc_id, d.source,
         CAST(CAST(CONCAT('0x', SUBSTR(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 1000 AS INTEGER) AS bucket,
         CAST(FLOOR(w.mixture_weight * {MIXTURE_SAMPLE_TARGET} / w.n_docs * 1000)
              AS INTEGER) AS rate
  FROM documents d JOIN weights w USING (source)
)
SELECT doc_id, source, bucket, rate FROM gated WHERE bucket < rate
"""


# --- per-source quality calibration -----------------------------------------

#: keep the top half of each source by the calibration metric.
CALIBRATION_KEEP_FRACTION = 0.5


def docs_quality_calibrated(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Per-source quality calibration: rank documents *within their source*
    by alphabetic-word ratio (doc_id tiebreak) and keep each source's top
    half. A global quality threshold over-prunes sources whose score
    distribution sits low (different boilerplate, different language
    register); ranking within the source applies equal selection pressure
    everywhere — the per-domain percentile filtering move.

    Shape at scale: one scan projection for the metric, one window
    partitioned by source (sources are few and large — each window sorts
    within its partition, no global order anywhere)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    toks = whitespace_tokens(F.col("text"))
    alpha_ratio = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))) / F.size(toks)
    scored = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("alpha_word_ratio").asc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("pr", F.round(F.percent_rank().over(w), 6))
        .where(F.col("pr") >= CALIBRATION_KEEP_FRACTION)
    )


DOCS_QUALITY_CALIBRATED_SQL = rf"""
WITH scored AS (
  SELECT doc_id, source,
         ROUND(len(list_filter(string_split_regex(trim(text), '\s+'),
                               t -> regexp_matches(t, '[a-z]')))::DOUBLE
               / len(string_split_regex(trim(text), '\s+')), 6)
           AS alpha_word_ratio
  FROM documents
),
ranked AS (
  SELECT doc_id, source, alpha_word_ratio,
         ROUND(PERCENT_RANK() OVER (PARTITION BY source
                                    ORDER BY alpha_word_ratio ASC,
                                             doc_id ASC), 6) AS pr
  FROM scored
)
SELECT doc_id, source, alpha_word_ratio, pr
FROM ranked WHERE pr >= {CALIBRATION_KEEP_FRACTION}
"""


# --- token-budget shard packing ----------------------------------------------

#: whitespace tokens per training shard in the packing demonstration.
SHARD_TOKEN_BUDGET = 2_000


def docs_token_budget_pack(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Assign documents to fixed-token-budget training shards, packed in
    doc_id order *within each source*: a document's shard is its starting
    token offset divided by the budget — the planning step before writing
    size-bounded training files.

    The running sum is a window per source with an explicit ROWS frame
    (the SQL-default RANGE frame is equivalent here only because the
    ordering key is unique — spelling ROWS keeps both engines honest).
    At scale the window parallelizes across sources; for a single giant
    source, pre-chunk by the deterministic hash split and pack within
    chunks — the shard boundaries shift but the invariant (every shard
    except the last holds >= budget starting offsets) is preserved."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    sized = _docs(spark, sf_dir).select(
        "doc_id", "source", F.size(whitespace_tokens(F.col("text"))).alias("n_toks")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_toks").over(w)
    return sized.select(
        "doc_id",
        "source",
        "n_toks",
        F.floor((cum - F.col("n_toks")) / SHARD_TOKEN_BUDGET)
        .cast("int")
        .alias("shard_id"),
    )


DOCS_TOKEN_BUDGET_PACK_SQL = rf"""
WITH sized AS (
  SELECT doc_id, source,
         len(string_split_regex(trim(text), '\s+')) AS n_toks
  FROM documents
)
SELECT doc_id, source, CAST(n_toks AS INTEGER) AS n_toks,
       CAST(FLOOR((SUM(n_toks) OVER (PARTITION BY source ORDER BY doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) - n_toks)
                  / {SHARD_TOKEN_BUDGET}.0) AS INTEGER) AS shard_id
FROM sized
"""


QUERIES: dict[str, tuple[Callable, str]] = {
    "docs_hash_split": (docs_hash_split, DOCS_HASH_SPLIT_SQL),
    "docs_quality_calibrated": (docs_quality_calibrated, DOCS_QUALITY_CALIBRATED_SQL),
    "docs_token_budget_pack": (docs_token_budget_pack, DOCS_TOKEN_BUDGET_PACK_SQL),
    "docs_source_mixture": (docs_source_mixture, DOCS_SOURCE_MIXTURE_SQL),
    "docs_mixture_sample": (docs_mixture_sample, DOCS_MIXTURE_SAMPLE_SQL),
    "text_gopher_quality": (text_gopher_quality, TEXT_GOPHER_QUALITY_SQL),
    "docs_vocab_build": (docs_vocab_build, DOCS_VOCAB_BUILD_SQL),
    "text_chunk_dedup": (text_chunk_dedup, TEXT_CHUNK_DEDUP_SQL),
    "text_cms_heavy_hitters": (text_cms_heavy_hitters, TEXT_CMS_HEAVY_HITTERS_SQL),
}
