"""Text-analysis operators over the ``documents`` table: token counting,
quality scoring, language identification, and document fingerprinting.

These are the per-document feature extractors a large-scale training-data
pipeline runs before filtering/dedup. Every operator is a narrow (shuffle-free)
projection built from built-in functions — no Python in the row path — so at
100 TB each is a single scan stage that fuses into whole-stage codegen and
parallelizes per input split. Column pruning pushes the 2-3 used columns into
the parquet reader.

The reference (Quantco/polarify) has no text operators (SURVEY.md section
2.5); these implement the north-star extension set required by the build
brief, oracle-checked against DuckDB.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Callable

from ..functions import whitespace_tokens

if TYPE_CHECKING:
    from pyspark.sql import Column, DataFrame, SparkSession

#: tiny per-language stopword marker sets for the heuristic language id.
#: Chosen to be disjoint; counted as whole tokens.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a"),
    "es": ("el", "la"),
    "de": ("der", "das"),
}


def _docs(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _token_marker_count(tokens: "Column", word: str) -> "Column":
    """How many tokens equal ``word`` (aggregate over the token array —
    stays in codegen; DuckDB: len(list_filter(w, t -> t = word)))."""
    from pyspark.sql import functions as F

    return F.size(F.filter(tokens, lambda t: t == F.lit(word)))


def token_stats(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Token count, character count, alpha-character count, and
    ``mean_token_len`` per document. Note (r18 audit): ``mean_token_len``
    is LOWERCASE-ALPHA characters per token (``n_alpha / n_tokens``),
    not mean token length over all characters — an uppercase/numeric
    document scores 0.0 here by design (the synthetic corpus is
    lowercase prose, where the two coincide); a gate that needs true
    mean token length over arbitrary text should use the
    non-whitespace-chars/words formulation in
    ``corpus.text_gopher_quality``."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    tokens = whitespace_tokens(F.col("text"))
    n_tokens = F.size(tokens)
    n_chars = F.length("text")
    # characters that survive removing everything but lowercase letters
    n_alpha = F.length(F.regexp_replace("text", "[^a-z]", ""))
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_measured"),
        n_alpha.alias("n_alpha"),
        F.round(n_alpha.cast("double") / n_tokens, 6).alias("mean_token_len"),
    )


TOKEN_STATS_SQL = r"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\s+')) AS n_tokens,
       length(text) AS n_chars_measured,
       length(regexp_replace(text, '[^a-z]', '', 'g')) AS n_alpha,
       ROUND(length(regexp_replace(text, '[^a-z]', '', 'g'))::DOUBLE
             / len(string_split_regex(trim(text), '\s+')), 6) AS mean_token_len
FROM documents
"""


def quality_score(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Heuristic quality filter score in [0, 100]: rewards mid-length docs,
    penalizes very short tokens and low alpha ratio. Deterministic integer /
    rational arithmetic so the oracle matches exactly."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    tokens = whitespace_tokens(F.col("text"))
    n_tokens = F.size(tokens)
    n_chars = F.length("text")
    # zero-length guard (r18 audit): an empty document is 0/0 here, which
    # DuckDB resolves to NULL but ANSI-mode Spark (the pinned default)
    # aborts the whole job with DIVIDE_BY_ZERO — make the NULL explicit
    # so both engines yield a NULL-quality row
    alpha_ratio = F.when(
        n_chars > 0,
        F.length(F.regexp_replace("text", "[^a-z ]", "")).cast("double")
        / n_chars,
    )
    length_component = F.when(n_tokens >= 40, F.lit(50)).otherwise(
        n_tokens * 50 / 40
    )
    score = F.round(length_component + alpha_ratio * 50, 6)
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        score.alias("quality"),
    )


QUALITY_SCORE_SQL = r"""
WITH m AS (
  SELECT doc_id,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens,
         length(regexp_replace(text, '[^a-z ]', '', 'g'))::DOUBLE
           / length(text) AS alpha_ratio
  FROM documents
)
SELECT doc_id, n_tokens,
       ROUND(alpha_ratio, 6) AS alpha_ratio,
       ROUND(CASE WHEN n_tokens >= 40 THEN 50 ELSE n_tokens * 50 / 40 END
             + alpha_ratio * 50, 6) AS quality
FROM m
"""


def lang_id(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Marker-token language guess with deterministic tie-breaking
    (en > es > de on ties, 'und' when no marker is seen)."""
    from pyspark.sql import functions as F

    # materialize the token array once; inlining the split into each of the
    # six marker-count filters would re-run it per filter.
    docs = _docs(spark, sf_dir).select(
        "doc_id", "lang", whitespace_tokens(F.col("text")).alias("toks")
    )
    counts = {
        lang: sum(
            (_token_marker_count(F.col("toks"), w) for w in words),
            start=F.lit(0),
        ).alias(f"c_{lang}")
        for lang, words in LANG_MARKERS.items()
    }
    with_counts = docs.select("doc_id", "lang", *counts.values())
    c_en, c_es, c_de = F.col("c_en"), F.col("c_es"), F.col("c_de")
    guess = (
        F.when((c_en == 0) & (c_es == 0) & (c_de == 0), "und")
        .when((c_en >= c_es) & (c_en >= c_de), "en")
        .when(c_es >= c_de, "es")
        .otherwise("de")
    )
    return with_counts.select(
        "doc_id", "lang", c_en, c_es, c_de, guess.alias("lang_guess")
    )


_MARKER_COUNT_SQL = (
    "len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t = '{w}'))"
)


def _lang_count_sql(lang: str) -> str:
    return " + ".join(_MARKER_COUNT_SQL.format(w=w) for w in LANG_MARKERS[lang])


LANG_ID_SQL = rf"""
WITH m AS (
  SELECT doc_id, lang,
         {_lang_count_sql("en")} AS c_en,
         {_lang_count_sql("es")} AS c_es,
         {_lang_count_sql("de")} AS c_de
  FROM documents
)
SELECT doc_id, lang, c_en, c_es, c_de,
       CASE WHEN c_en = 0 AND c_es = 0 AND c_de = 0 THEN 'und'
            WHEN c_en >= c_es AND c_en >= c_de THEN 'en'
            WHEN c_es >= c_de THEN 'es'
            ELSE 'de' END AS lang_guess
FROM m
"""


def fingerprint(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Content fingerprint: md5 of whitespace-normalized lowercase text, both
    as hex (stable id) and as a 60-bit integer plus a 1024-way shard band —
    the partitioning key a 100 TB dedup would shuffle on (band-first keeps
    the shuffle balanced because md5 is uniform)."""
    from pyspark.sql import functions as F

    from ..functions import normalize_ws

    # two-step projection so the normalize+md5 runs once per row, not once
    # per derived column.
    with_hex = _docs(spark, sf_dir).select(
        "doc_id", F.md5(F.lower(normalize_ws(F.col("text")))).alias("fp_hex")
    )
    fp_long = F.conv(F.substring("fp_hex", 1, 15), 16, 10).cast("long")
    return with_hex.select(
        "doc_id",
        "fp_hex",
        fp_long.alias("fp_long"),
        (fp_long % 1024).alias("band"),
    )


FINGERPRINT_SQL = r"""
WITH n AS (
  SELECT doc_id, lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS t
  FROM documents
)
SELECT doc_id,
       md5(t) AS fp_hex,
       CAST(CONCAT('0x', SUBSTR(md5(t), 1, 15)) AS BIGINT) AS fp_long,
       CAST(CONCAT('0x', SUBSTR(md5(t), 1, 15)) AS BIGINT) % 1024 AS band
FROM n
"""


#: BPE-ish pre-tokenizer (GPT-2 shape, minus the lookahead Java/RE2 share
#: no syntax for): contraction suffixes, space-prefixed letter runs, digit
#: runs, punctuation runs, whitespace runs. Both Java (Spark) and RE2
#: (DuckDB) produce identical matches for this subset — verified.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_stats(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Token counting, BPE-style: how many pre-tokenizer pieces a document
    splits into vs its whitespace word count — the tokens-per-word ratio is
    the standard proxy for how expensive a document is to a BPE tokenizer.

    One regex pass per row, shuffle-free, fused into the scan stage."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    pieces = F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0)
    n_words = F.size(whitespace_tokens(F.col("text")))
    # whitespace runs are fragment separators, not tokens
    n_pieces = F.size(F.filter(pieces, lambda p: F.trim(p) != ""))
    return docs.select(
        "doc_id",
        n_pieces.alias("n_bpe_tokens"),
        n_words.alias("n_words"),
        F.round(n_pieces.cast("double") / n_words, 6).alias("tokens_per_word"),
    )


_BPE_SQL_LIT = BPE_PATTERN.replace("'", "''")

BPE_TOKEN_STATS_SQL = rf"""
WITH m AS (
  SELECT doc_id,
         len(list_filter(regexp_extract_all(text, '{_BPE_SQL_LIT}'),
                         p -> trim(p) != '')) AS n_bpe_tokens,
         len(string_split_regex(trim(text), '\s+')) AS n_words
  FROM documents
)
SELECT doc_id, n_bpe_tokens, n_words,
       ROUND(n_bpe_tokens::DOUBLE / n_words, 6) AS tokens_per_word
FROM m
"""


WINNOW_K = 3  # k-gram length (tokens) fed to the rolling hash
WINNOW_W = 4  # winnowing window: one fingerprint kept per w consecutive hashes


def winnow_fingerprint(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    hash every token 3-gram, keep the minimum hash of each sliding window of
    4, emit the distinct selected hashes as (doc_id, fp) rows.

    The classic formulation is a sequential Rabin-Karp rolling hash; the
    columnar equivalent hashes each k-gram independently (md5-derived 32-bit,
    same scheme as the dedup operators) so the whole thing is one shuffle-free
    projection over array expressions — per-gram hashing is embarrassingly
    parallel where a rolling hash is order-serial, which is the formulation
    that scales. Docs with fewer than w hashes keep their single minimum
    (standard winnowing boundary rule); docs with no 3-gram are dropped."""
    from pyspark.sql import functions as F

    from ..functions import md5_long, word_ngrams

    with_toks = _docs(spark, sf_dir).select(
        "doc_id", whitespace_tokens(F.col("text")).alias("toks")
    )
    with_grams = with_toks.where(F.size("toks") >= WINNOW_K).select(
        "doc_id", word_ngrams(F.col("toks"), WINNOW_K).alias("grams")
    )
    hashed = with_grams.select(
        "doc_id",
        F.transform("grams", lambda g: md5_long(g, 8)).alias("hv"),
    )
    n = F.size("hv")
    window_mins = F.transform(
        F.sequence(F.lit(1), n - WINNOW_W + 1),
        lambda i: F.array_min(F.slice(F.col("hv"), i, WINNOW_W)),
    )
    fps = F.when(n >= WINNOW_W, window_mins).otherwise(F.array(F.array_min("hv")))
    return hashed.select(
        "doc_id",
        F.explode(F.array_sort(F.array_distinct(fps))).alias("fp"),
    )


WINNOW_FINGERPRINT_SQL = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
  FROM documents
),
grams AS (
  SELECT doc_id,
         list_transform(range(1, len(w) - {WINNOW_K - 2}),
                        i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]) AS g
  FROM toks WHERE len(w) >= {WINNOW_K}
),
hashed AS (
  SELECT doc_id,
         list_transform(g, x -> CAST(CONCAT('0x', SUBSTR(md5(x), 1, 8))
                                     AS BIGINT)) AS hv
  FROM grams
),
fps AS (
  SELECT doc_id,
         CASE WHEN len(hv) >= {WINNOW_W}
              THEN list_transform(range(1, len(hv) - {WINNOW_W} + 2),
                                  i -> list_min(hv[i:i + {WINNOW_W - 1}]))
              ELSE [list_min(hv)] END AS mins
  FROM hashed
)
SELECT doc_id, unnest(list_sort(list_distinct(mins))) AS fp FROM fps
"""


KMV_K = 64  # sketch size: estimate distinct count from the k-th minimum hash


def kmv_distinct_tokens(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """KMV (k-minimum-values) distinct-count sketch over the corpus token
    vocabulary: hash every token to a uniform 32-bit value, keep the K
    smallest distinct hashes, estimate |V| = (K-1) * 2^32 / kth_min.

    This is the mergeable-sketch pattern behind approx_count_distinct, but
    built from deterministic md5 material so the estimate is bit-identical
    across engines — a property-tested sketch rather than a trust-me one.
    Scale shape: per-partition top-K (map-side partial via the sort-limit),
    then a single K-row reduce; the full vocabulary never ships. Exact
    distinct count rides along for the error check."""
    from pyspark.sql import functions as F

    from ..functions import md5_long

    toks = (
        _docs(spark, sf_dir)
        .select(F.explode(whitespace_tokens(F.col("text"))).alias("tok"))
        .select(md5_long(F.col("tok"), 8).alias("hv"), "tok")
    )
    kth_min = (
        toks.select("hv")
        .distinct()
        .orderBy("hv")
        .limit(KMV_K)
        .agg(F.max("hv").alias("kth_min"), F.count("*").alias("k_seen"))
    )
    exact = toks.agg(F.countDistinct("tok").alias("exact_distinct"))
    est = F.when(
        F.col("k_seen") < KMV_K, F.col("exact_distinct").cast("double")
    ).otherwise((KMV_K - 1) * 4294967296.0 / F.col("kth_min"))
    return (
        kth_min.crossJoin(exact)
        .select(
            F.lit(KMV_K).alias("k"),
            "kth_min",
            F.round(est, 4).alias("estimate"),
            "exact_distinct",
        )
    )


KMV_DISTINCT_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents
),
hashed AS (
  SELECT tok, CAST(CONCAT('0x', SUBSTR(md5(tok), 1, 8)) AS BIGINT) AS hv
  FROM toks
),
mins AS (
  SELECT hv FROM (SELECT DISTINCT hv FROM hashed) ORDER BY hv LIMIT {KMV_K}
),
kth AS (
  SELECT MAX(hv) AS kth_min, COUNT(*) AS k_seen FROM mins
),
ex AS (
  SELECT COUNT(DISTINCT tok) AS exact_distinct FROM hashed
)
SELECT {KMV_K} AS k, kth_min,
       ROUND(CASE WHEN k_seen < {KMV_K} THEN exact_distinct::DOUBLE
                  ELSE ({KMV_K} - 1) * 4294967296.0 / kth_min END, 4) AS estimate,
       exact_distinct
FROM kth CROSS JOIN ex
"""


def lang_median_quality(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Per-language median quality score via a grouped-aggregate pandas UDF
    (the UDAF surface): Arrow ships each group's quality column to Python as
    one Series, numpy takes the median. Median is not sum-decomposable, so
    it cannot ride Spark's partial-aggregation path — a UDAF (or the
    built-in ``percentile_approx`` when approximation is acceptable) is the
    right tool; at 100 TB per-group data must fit one worker, which holds
    for per-language medians (5 groups) but not per-user ones — those want
    the sketch-based built-in instead."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit GROUPED_AGG: type-hint inference would need pandas importable
    # from this module's globals, which defers heavy imports by convention
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def median_udaf(v):
        import numpy as np

        # SQL aggregate semantics (r18 audit): median() skips NULLs, but
        # Arrow ships them to the UDAF as NaN and np.median PROPAGATES
        # NaN — one NULL-quality document (e.g. empty text) would poison
        # its whole language's median vs the DuckDB oracle. All-NULL
        # groups return NULL, matching SQL.
        vals = v.dropna()
        return float(np.median(vals)) if len(vals) else None

    quality = quality_score(spark, sf_dir).select("doc_id", "quality")
    langs = _docs(spark, sf_dir).select("doc_id", "lang")
    per_doc = quality.join(langs, "doc_id")
    # a grouped-agg pandas UDF cannot share an agg() with built-in
    # aggregates (INVALID_PANDAS_UDF_PLACEMENT); counts come from a second
    # aggregation joined back on the 5-row result
    medians = per_doc.groupBy("lang").agg(
        F.round(median_udaf("quality"), 6).alias("median_quality")
    )
    counts = per_doc.groupBy("lang").agg(F.count("*").alias("n_docs"))
    return medians.join(counts, "lang")


LANG_MEDIAN_QUALITY_SQL = rf"""
WITH m AS (
  SELECT doc_id, lang,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens,
         length(regexp_replace(text, '[^a-z ]', '', 'g'))::DOUBLE
           / length(text) AS alpha_ratio
  FROM documents
),
q AS (
  SELECT doc_id, lang,
         ROUND(CASE WHEN n_tokens >= 40 THEN 50 ELSE n_tokens * 50 / 40 END
               + alpha_ratio * 50, 6) AS quality
  FROM m
)
SELECT lang, ROUND(median(quality), 6) AS median_quality,
       COUNT(*) AS n_docs
FROM q GROUP BY 1
"""


# --- PII redaction -----------------------------------------------------------

#: patterns deliberately limited to syntax valid (and identical in meaning)
#: in BOTH Java regex (Spark) and RE2 (DuckDB): char classes, bounded
#: repetition, \b. No lookaround (RE2 has none).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_redact(text: "Column") -> "Column":
    """Replace each PII pattern with its ``<KIND>`` placeholder — one
    codegen-fused chain of regexp_replace calls, shuffle-free, reusable on
    any string column."""
    from pyspark.sql import functions as F

    out = text
    for kind, pattern in PII_PATTERNS.items():
        out = F.regexp_replace(out, pattern, f"<{kind.upper()}>")
    return out


def text_pii_redact(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Per-document PII scrub: match counts per pattern plus the md5 of the
    redacted text (the digest keeps the oracle row narrow; the redacted
    column itself is what a pipeline would write). Scan-shaped: one
    projection, no shuffle. The driver corpus contains no PII, so corpus
    counts are zero — the planted-PII unit test proves the redaction; this
    query pins engine parity of the patterns themselves."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    counts = [
        F.regexp_count("text", F.lit(pattern)).cast("int").alias(f"n_{kind}")
        for kind, pattern in PII_PATTERNS.items()
    ]
    return docs.select(
        "doc_id",
        *counts,
        F.md5(pii_redact(F.col("text"))).alias("redacted_md5"),
    )


def _pii_sql() -> str:
    count_cols = ", ".join(
        f"CAST(len(regexp_extract_all(text, '{p}')) AS INTEGER) AS n_{k}"
        for k, p in PII_PATTERNS.items()
    )
    redacted = "text"
    for kind, pattern in PII_PATTERNS.items():
        redacted = f"regexp_replace({redacted}, '{pattern}', '<{kind.upper()}>', 'g')"
    return f"""
SELECT doc_id, {count_cols}, md5({redacted}) AS redacted_md5
FROM documents
"""


TEXT_PII_REDACT_SQL = _pii_sql()


# --- repetition statistics (Gopher-style quality signals) --------------------


def text_repetition_stats(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Per-document bigram repetition signals (the Gopher/RefinedWeb filter
    family): total bigrams, distinct bigrams, the most-frequent bigram's
    share, and the duplicate-bigram fraction. High top-share or duplicate
    fraction flags boilerplate/spam for removal.

    Shape: explode bigrams -> count per (doc_id, gram) -> reduce per doc.
    Two shuffles whose keys grow with the data (never a hot key: doc_id is
    in every key), with map-side partial aggregation on both."""
    from pyspark.sql import functions as F

    from ..functions import word_ngrams

    toks = _docs(spark, sf_dir).select(
        "doc_id", whitespace_tokens(F.col("text")).alias("toks")
    )
    grams = (
        toks.where(F.size("toks") >= 2)
        .select("doc_id", F.explode(word_ngrams(F.col("toks"), 2)).alias("gram"))
    )
    per_gram = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("cnt"))
    return per_gram.groupBy("doc_id").agg(
        F.sum("cnt").cast("int").alias("n_bigrams"),
        F.count("*").cast("int").alias("n_distinct"),
        F.round(F.max("cnt") / F.sum("cnt"), 6).alias("top_bigram_share"),
        F.round(
            (F.sum("cnt") - F.count("*")) / F.sum("cnt"), 6
        ).alias("dup_bigram_fraction"),
    )


TEXT_REPETITION_SQL = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])) AS gram
  FROM toks WHERE len(w) >= 2
),
per_gram AS (
  SELECT doc_id, gram, COUNT(*) AS cnt FROM grams GROUP BY 1, 2
)
SELECT doc_id,
       CAST(SUM(cnt) AS INTEGER) AS n_bigrams,
       CAST(COUNT(*) AS INTEGER) AS n_distinct,
       ROUND(MAX(cnt)::DOUBLE / SUM(cnt), 6) AS top_bigram_share,
       ROUND((SUM(cnt) - COUNT(*))::DOUBLE / SUM(cnt), 6) AS dup_bigram_fraction
FROM per_gram GROUP BY doc_id
"""


# --- TF-IDF ------------------------------------------------------------------

TFIDF_TOP_K = 3


def tfidf_top_terms(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Each document's top-3 TF-IDF terms (smoothed idf =
    ln((N+1)/(df+1)) + 1; ties broken alphabetically) — the classic
    keyword-extraction / relevance primitive.

    Shape at scale: explode -> (doc_id, term) counts [shuffle 1, map-side
    combine], document frequency per term [shuffle 2 on term — vocabulary-
    sized, not corpus-sized], the corpus count N rides a 1-row broadcast,
    and the per-doc top-k is a window on doc_id. Nothing holds the
    vocabulary in one place."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.explode(whitespace_tokens(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    idf = F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(F.col("tf") * idf, 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TFIDF_TOP_K)
    )


TFIDF_TOP_TERMS_SQL = rf"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
),
df_t AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         ROUND(tf.tf * (ln((n.n_docs + 1.0) / (df_t.df + 1.0)) + 1), 6) AS tfidf
  FROM tf JOIN df_t USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tf, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, term, tf, tfidf, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TFIDF_TOP_K}
"""


# --- quality-filter composition + deterministic stratified sampling ----------

QUALITY_KEEP_THRESHOLD = 75.0
MIN_TOKENS = 10


def docs_quality_filter(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """The filter step itself: keep documents passing the quality threshold
    and minimum length — the composition every training-data pipeline runs
    after scoring. Predicates are plain column comparisons over the scoring
    projection, so Catalyst pushes what it can into the scan and the rest
    stays in the same codegen stage."""
    from pyspark.sql import functions as F

    scored = quality_score(spark, sf_dir)
    return scored.where(
        (F.col("quality") >= QUALITY_KEEP_THRESHOLD)
        & (F.col("n_tokens") >= MIN_TOKENS)
    )


DOCS_QUALITY_FILTER_SQL = rf"""
WITH m AS (
  SELECT doc_id,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens,
         length(regexp_replace(text, '[^a-z ]', '', 'g'))::DOUBLE
           / length(text) AS alpha_ratio
  FROM documents
)
SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
       ROUND(alpha_ratio, 6) AS alpha_ratio,
       ROUND(CASE WHEN n_tokens >= 40 THEN 50 ELSE n_tokens * 50 / 40 END
             + alpha_ratio * 50, 6) AS quality
FROM m
WHERE ROUND(CASE WHEN n_tokens >= 40 THEN 50 ELSE n_tokens * 50 / 40 END
       + alpha_ratio * 50, 6) >= {QUALITY_KEEP_THRESHOLD}
  AND n_tokens >= {MIN_TOKENS}
"""
# ^ the WHERE thresholds the ROUNDED quality (r18 audit): the Spark side
# filters on its round-6 quality column, and a raw score just under the
# threshold that rounds up to it would otherwise be kept by one engine
# and dropped by the other.

#: per-language keep rates out of 1000 (downsample the dominant language,
#: keep more of the rest — the standard mixture-rebalancing move)
SAMPLE_RATES_PER_MILLE: dict[str, int] = {"en": 300}
DEFAULT_RATE_PER_MILLE = 600


def docs_stratified_sample(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Deterministic hash-based stratified sampling: a document is kept iff
    ``md5(doc_id) mod 1000`` falls under its language's keep rate. Unlike
    ``df.sample``/``sampleBy`` (RNG-seeded, partition-order-sensitive), the
    hash gate is a pure function of the row — reproducible across engines,
    retries, and cluster layouts, which is what makes sampled corpora
    auditable. Shuffle-free scan projection."""
    from pyspark.sql import functions as F

    from ..functions import md5_long

    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    bucket = F.pmod(md5_long(F.col("doc_id").cast("string"), 8), F.lit(1000))
    rate = F.lit(DEFAULT_RATE_PER_MILLE)
    for lang, per_mille in SAMPLE_RATES_PER_MILLE.items():
        rate = F.when(F.col("lang") == lang, F.lit(per_mille)).otherwise(rate)
    return docs.select(
        "doc_id", "lang", bucket.cast("int").alias("bucket")
    ).where(F.col("bucket") < rate)


def _stratified_sample_sql() -> str:
    rate = str(DEFAULT_RATE_PER_MILLE)
    for lang, per_mille in SAMPLE_RATES_PER_MILLE.items():
        rate = f"CASE WHEN lang = '{lang}' THEN {per_mille} ELSE {rate} END"
    return f"""
WITH b AS (
  SELECT doc_id, lang,
         CAST(CAST(CONCAT('0x', SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 1000 AS INTEGER) AS bucket
  FROM documents
)
SELECT doc_id, lang, bucket FROM b WHERE bucket < {rate}
"""


DOCS_STRATIFIED_SAMPLE_SQL = _stratified_sample_sql()


# --- RAG chunking -------------------------------------------------------------

CHUNK_SIZE = 64  # tokens per chunk
CHUNK_STRIDE = 48  # tokens between chunk starts (overlap = SIZE - STRIDE)


def docs_chunk_windows(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Split each document into overlapping token windows — the chunking
    step every RAG / embedding-indexing pipeline runs before embedding.
    Emits one row per chunk: (doc_id, chunk_idx, start_token,
    n_chunk_tokens, chunk_md5) — the chunk registry an indexer consumes
    (the md5 doubles as the chunk's stable id for incremental re-embedding).

    Chunk count is pure integer arithmetic on the token count
    (ceil((n_tokens - SIZE)/STRIDE) + 1, min 1), so a document shorter than
    one window still yields exactly one chunk. Shape at scale: one
    shuffle-free scan — tokenize, explode the per-doc chunk-index sequence
    (output grows ~n_tokens/STRIDE per doc, linear), slice + hash inside
    codegen. No joins, no windows, no Python."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    toks = whitespace_tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_chunks = F.greatest(
        F.floor((n_tokens - (CHUNK_SIZE - CHUNK_STRIDE + 1)) / F.lit(float(CHUNK_STRIDE))).cast("int")
        + 1,
        F.lit(1),
    )
    with_chunks = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = (F.col("chunk_idx") * CHUNK_STRIDE + 1).alias("start_token")
    chunk = F.slice(F.col("toks"), F.col("chunk_idx") * CHUNK_STRIDE + 1, CHUNK_SIZE)
    return with_chunks.select(
        "doc_id",
        "chunk_idx",
        start,
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


DOCS_CHUNK_WINDOWS_SQL = rf"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, toks,
         GREATEST(CAST(FLOOR((n_tokens - {CHUNK_SIZE - CHUNK_STRIDE + 1})
                             / {CHUNK_STRIDE}.0) AS INT) + 1, 1) AS n_chunks
  FROM t
),
x AS (
  SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_idx FROM c
)
SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
       CAST(chunk_idx * {CHUNK_STRIDE} + 1 AS INT) AS start_token,
       CAST(len(list_slice(toks, chunk_idx * {CHUNK_STRIDE} + 1,
                           chunk_idx * {CHUNK_STRIDE} + {CHUNK_SIZE})) AS INT)
         AS n_chunk_tokens,
       md5(array_to_string(list_slice(toks, chunk_idx * {CHUNK_STRIDE} + 1,
                                      chunk_idx * {CHUNK_STRIDE} + {CHUNK_SIZE}),
                           ' ')) AS chunk_md5
FROM x
"""


def langid_confusion(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Confusion matrix of the marker-token language heuristic against the
    table's ground-truth labels: (lang, lang_guess, n, frac_of_lang) — the
    evaluation every heuristic classifier in a pipeline should ship with,
    so its error modes (which languages bleed into which) are measured
    facts rather than folklore.

    Shape at scale: the per-doc guess is the existing shuffle-free scan
    projection; the matrix is one uniform (lang, guess) groupBy — at most
    |langs|^2 + 1 cells; per-language fractions come from exact integer
    counts via a broadcast of the |langs|-row marginals."""
    from pyspark.sql import functions as F

    guessed = lang_id(spark, sf_dir).select("doc_id", "lang", "lang_guess")
    cells = guessed.groupBy("lang", "lang_guess").agg(
        F.count("*").alias("n")
    )
    marginals = cells.groupBy("lang").agg(F.sum("n").alias("lang_total"))
    return cells.join(F.broadcast(marginals), "lang").select(
        "lang",
        "lang_guess",
        "n",
        F.round(F.col("n") / F.col("lang_total").cast("double"), 6).alias(
            "frac_of_lang"
        ),
    )


LANGID_CONFUSION_SQL = f"""
WITH g AS ({LANG_ID_SQL}),
cells AS (
  SELECT lang, lang_guess, COUNT(*) AS n FROM g GROUP BY 1, 2
),
marginals AS (
  SELECT lang, SUM(n) AS lang_total FROM cells GROUP BY 1
)
SELECT c.lang, c.lang_guess, CAST(c.n AS BIGINT) AS n,
       ROUND(c.n / CAST(m.lang_total AS DOUBLE), 6) AS frac_of_lang
FROM cells c JOIN marginals m USING (lang)
"""


QUERIES: dict[str, tuple[Callable, str]] = {
    "text_token_stats": (token_stats, TOKEN_STATS_SQL),
    "text_langid_confusion": (langid_confusion, LANGID_CONFUSION_SQL),
    "docs_chunk_windows": (docs_chunk_windows, DOCS_CHUNK_WINDOWS_SQL),
    "text_quality_score": (quality_score, QUALITY_SCORE_SQL),
    "text_lang_id": (lang_id, LANG_ID_SQL),
    "text_fingerprint": (fingerprint, FINGERPRINT_SQL),
    "text_bpe_token_stats": (bpe_token_stats, BPE_TOKEN_STATS_SQL),
    "text_winnow_fingerprint": (winnow_fingerprint, WINNOW_FINGERPRINT_SQL),
    "text_kmv_distinct_tokens": (kmv_distinct_tokens, KMV_DISTINCT_SQL),
    "text_lang_median_quality": (lang_median_quality, LANG_MEDIAN_QUALITY_SQL),
    "text_pii_redact": (text_pii_redact, TEXT_PII_REDACT_SQL),
    "text_tfidf_top_terms": (tfidf_top_terms, TFIDF_TOP_TERMS_SQL),
    "text_repetition_stats": (text_repetition_stats, TEXT_REPETITION_SQL),
    "docs_quality_filter": (docs_quality_filter, DOCS_QUALITY_FILTER_SQL),
    "docs_stratified_sample": (docs_stratified_sample, DOCS_STRATIFIED_SAMPLE_SQL),
}

