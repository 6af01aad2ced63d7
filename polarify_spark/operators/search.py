"""Full-text search operators over the ``documents`` table: a BM25-scored
keyword search (the retrieval primitive behind corpus exploration, eval-set
mining, and RAG indexing) and a corpus-trained character-bigram language
model scorer (the classic cheap perplexity proxy used as a quality filter
when a real LM is too expensive to run over 100 TB).

The reference (Quantco/polarify) has no search surface (SURVEY.md section
2.5); these implement the north-star extension set required by the build
brief, oracle-checked against DuckDB.

Cross-engine float convention: every per-term score is quantized to integer
micro-units (``ROUND(x * 1e6)`` as BIGINT) *before* any cross-row sum, so
the per-document totals are exact integer arithmetic on both engines and
no accumulation-order difference can flip a rounding boundary. Only the
per-term ``ln`` itself is trusted to agree (the module convention already
used by ``text.tfidf_top_terms``).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Callable

from ..functions import whitespace_tokens

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

#: the registered demo searches: tiny, fixed, and drawn from the synthetic
#: corpus vocabulary so every query matches real documents.
SEARCH_QUERIES: dict[int, tuple[str, ...]] = {
    0: ("hash", "join"),
    1: ("window", "agg", "stream"),
    2: ("slow", "scan", "filter"),
}
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 10

#: add-one smoothing over the observed character alphabet; documents are
#: lowercase ASCII words + spaces, so the alphabet is tiny and the bigram
#: table (alphabet^2 upper bound) is broadcastable at any corpus size.
CHARLM_NGRAM = 2


def _docs(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _query_terms_df(spark: "SparkSession") -> "DataFrame":
    rows = [
        (qid, term) for qid, terms in SEARCH_QUERIES.items() for term in terms
    ]
    return spark.createDataFrame(rows, "query_id INT, term STRING")


def _query_terms_sql() -> str:
    rows = ", ".join(
        f"({qid}, '{term}')"
        for qid, terms in SEARCH_QUERIES.items()
        for term in terms
    )
    return f"(VALUES {rows}) AS qt(query_id, term)"


def bm25_search(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Top-k documents per search query under BM25 (k1=1.2, b=0.75,
    Robertson/Sparck-Jones idf with the +1 floor so scores stay positive).

    Shape at scale: this is an inverted-index probe expressed relationally.
    Per-document term frequencies are one (doc_id, term) groupBy with
    map-side combine [the "index build"]; document frequencies aggregate
    that to the vocabulary [vocab-sized shuffle, not corpus-sized]; N and
    avgdl ride a 1-row broadcast. The query term list is a constant
    few-row broadcast, so the probe join `tf ⋈ query_terms` prunes the
    corpus to matching postings on the map side — at 100 TB nothing but
    the matched postings ever shuffles. The final top-k per query is a
    window over query_id (3 partitions here; queries are always few).

    Per-(query, doc, term) contributions are quantized to micro-units
    before the per-document sum — see the module docstring.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.explode(whitespace_tokens(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    doclen = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = doclen.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_len")
    )

    qt = F.broadcast(_query_terms_df(spark))
    postings = (
        tf.join(qt, "term")
        .join(df_t, "term")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    # avgdl = total_len / n_docs (exact integers; division deterministic)
    norm_len = (
        F.col("dl") * F.col("n_docs") / F.col("total_len")
    )
    tf_term = (
        F.col("tf") * (BM25_K1 + 1)
        / (F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * norm_len))
    )
    contrib_micro = F.round(idf * tf_term * 1e6).cast("long")
    scored = postings.groupBy("query_id", "doc_id").agg(
        F.count("*").alias("n_matched"),
        F.round(F.sum(contrib_micro) / 1e6, 6).alias("bm25"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= BM25_TOP_K)
    )


BM25_SEARCH_SQL = rf"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
),
doclen AS (
  SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1
),
df_t AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
),
stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS total_len FROM doclen
),
postings AS (
  SELECT qt.query_id, tf.doc_id, tf.tf, df_t.df, doclen.dl,
         stats.n_docs, stats.total_len
  FROM tf
  JOIN {_query_terms_sql()} USING (term)
  JOIN df_t USING (term)
  JOIN doclen USING (doc_id)
  CROSS JOIN stats
),
contrib AS (
  SELECT query_id, doc_id,
         CAST(ROUND(
           ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
           * (tf * ({BM25_K1} + 1)
              / (tf + {BM25_K1} * (1 - {BM25_B}
                 + {BM25_B} * dl * n_docs / total_len)))
           * 1e6) AS BIGINT) AS c_micro
  FROM postings
),
scored AS (
  SELECT query_id, doc_id, COUNT(*) AS n_matched,
         ROUND(SUM(c_micro) / 1e6, 6) AS bm25
  FROM contrib GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id, n_matched, bm25,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY bm25 DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT query_id, doc_id, n_matched, bm25, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {BM25_TOP_K}
"""


def charlm_quality(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Per-document average negative log-likelihood under a character-bigram
    language model trained on the corpus itself (add-one smoothing over the
    observed alphabet) — the standard cheap perplexity proxy: documents
    whose character statistics deviate from the corpus (boilerplate, random
    noise, wrong language) score high and get filtered.

    Shape at scale: per-document bigram counts collapse each document to
    its distinct bigrams (one uniform (doc_id, bigram) groupBy with map-side
    combine — the explode never shuffles raw characters); the trained model
    (bigram counts + prefix counts + alphabet size) is alphabet^2-bounded
    and always broadcast, so scoring is a map-side join over the per-doc
    counts followed by one doc_id groupBy. Two linear passes, no
    corpus-sized shuffle beyond the bigram-count combine.

    Per-bigram log-probs are quantized to micro-units before the weighted
    per-document sum — see the module docstring.
    """
    from pyspark.sql import functions as F

    # guard: Spark's sequence(1, 0) would run *descending*; DuckDB's
    # range(1, 1) is empty. Excluding sub-bigram docs on both sides keeps
    # the semantics identical (such docs simply have no bigrams).
    docs = _docs(spark, sf_dir).where(F.length("text") >= CHARLM_NGRAM)
    # (doc_id, bigram) for every adjacent character pair
    grams = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("text") - 1),
                lambda i: F.substring(F.col("text"), i, CHARLM_NGRAM),
            )
        ).alias("bigram"),
    )
    per_doc = grams.groupBy("doc_id", "bigram").agg(F.count("*").alias("n"))
    model = per_doc.groupBy("bigram").agg(F.sum("n").alias("c_bigram"))
    prefix = model.select(
        F.substring("bigram", 1, 1).alias("prefix"), "c_bigram"
    ).groupBy("prefix").agg(F.sum("c_bigram").alias("c_prefix"))
    alphabet = prefix.agg(F.count("*").alias("v"))

    logp = F.log(
        (F.col("c_bigram") + 1)
        / (F.col("c_prefix") + F.col("v")).cast("double")
    )
    scored = (
        per_doc.withColumn("prefix", F.substring("bigram", 1, 1))
        .join(F.broadcast(model), "bigram")
        .join(F.broadcast(prefix), "prefix")
        .crossJoin(F.broadcast(alphabet))
        .select(
            "doc_id",
            "n",
            F.round(-logp * 1e6).cast("long").alias("nll_micro"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("n").alias("n_bigrams"),
        F.round(
            F.sum(F.col("n") * F.col("nll_micro")) / (F.sum("n") * 1e6), 6
        ).alias("avg_nll"),
    )


CHARLM_QUALITY_SQL = f"""
WITH grams AS (
  SELECT doc_id, substr(text, i, {CHARLM_NGRAM}) AS bigram
  FROM documents,
       LATERAL unnest(range(1, length(text))) AS t(i)
  WHERE length(text) >= {CHARLM_NGRAM}
),
per_doc AS (
  SELECT doc_id, bigram, COUNT(*) AS n FROM grams GROUP BY 1, 2
),
model AS (
  SELECT bigram, SUM(n) AS c_bigram FROM per_doc GROUP BY 1
),
prefix AS (
  SELECT substr(bigram, 1, 1) AS prefix, SUM(c_bigram) AS c_prefix
  FROM model GROUP BY 1
),
alphabet AS (SELECT COUNT(*) AS v FROM prefix),
scored AS (
  SELECT per_doc.doc_id, per_doc.n,
         CAST(ROUND(-ln((model.c_bigram + 1)
                        / CAST(prefix.c_prefix + alphabet.v AS DOUBLE))
                    * 1e6) AS BIGINT) AS nll_micro
  FROM per_doc
  JOIN model USING (bigram)
  JOIN prefix ON substr(per_doc.bigram, 1, 1) = prefix.prefix
  CROSS JOIN alphabet
)
SELECT doc_id, SUM(n) AS n_bigrams,
       ROUND(SUM(n * nll_micro) / (SUM(n) * 1e6), 6) AS avg_nll
FROM scored GROUP BY 1
"""


QUERIES: dict[str, tuple[Callable, str]] = {
    "search_bm25": (bm25_search, BM25_SEARCH_SQL),
    "text_charlm_quality": (charlm_quality, CHARLM_QUALITY_SQL),
}
