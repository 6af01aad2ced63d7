"""Property tests for the portable-hash foundation: every oracle in the
repo relies on Spark's ``conv(substring(md5(x), 1, n), 16, 10)`` equalling
DuckDB's ``CAST(CONCAT('0x', SUBSTR(md5(x), 1, n)) AS BIGINT)`` for the
SAME input string. Pin that equivalence over hypothesis-generated inputs
(one Spark job per example set, not per string)."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from polarify_spark.functions import md5_long
from polarify_spark.functions.hashing import MERSENNE_P, minhash_perm_params

#: printable-ish text including unicode, newlines, and the CSV/null
#: sentinels the sources layer worries about
TEXTS = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=64
    ),
    min_size=1,
    max_size=64,
    unique=True,
)


@settings(max_examples=20, deadline=None)
@given(texts=TEXTS)
def test_md5_long_matches_duckdb(spark, texts):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(t,) for t in texts], "s string")
    got = {
        r["s"]: (r["h8"], r["h4"])
        for r in df.select(
            "s",
            md5_long(F.col("s"), 8).alias("h8"),
            md5_long(F.col("s"), 4).alias("h4"),
        ).collect()
    }

    con = duckdb.connect()
    try:
        want = {
            s: (
                con.execute(
                    "SELECT CAST(CONCAT('0x', SUBSTR(md5(?), 1, 8)) AS BIGINT),"
                    "       CAST(CONCAT('0x', SUBSTR(md5(?), 1, 4)) AS BIGINT)",
                    [s, s],
                ).fetchone()
            )
            for s in texts
        }
    finally:
        con.close()
    assert got == {s: (a, b) for s, (a, b) in want.items()}


@settings(max_examples=20, deadline=None)
@given(
    hashes=st.lists(
        st.integers(min_value=0, max_value=2**32 - 1),
        min_size=1,
        max_size=200,
        unique=True,
    )
)
def test_permutation_family_matches_python(spark, hashes):
    """The (a*h+b) mod p family (minhash, bloom positions) evaluated by
    Spark's integer expressions must equal plain-Python big-int arithmetic
    — i.e. no silent 64-bit wraparound anywhere in the expression."""
    from pyspark.sql import functions as F

    params = minhash_perm_params(4)
    df = spark.createDataFrame([(h,) for h in hashes], "h long")
    hmod = F.col("h") % MERSENNE_P
    rows = df.select(
        "h",
        *[
            ((F.lit(a) * hmod + F.lit(b)) % MERSENNE_P).alias(f"p{i}")
            for i, (a, b) in enumerate(params)
        ],
    ).collect()
    for r in rows:
        for i, (a, b) in enumerate(params):
            assert r[f"p{i}"] == (a * (r["h"] % MERSENNE_P) + b) % MERSENNE_P


def test_md5_top_n_ids_matches_its_sql_twin(spark):
    """The shared deterministic-sample helper must pick the same ids in
    both engines — the dedup recall denominator and the PQ training set
    depend on Spark and DuckDB agreeing on the top-N-by-md5 selection,
    including the id tie-break."""
    import duckdb

    from polarify_spark.functions import md5_top_n_ids, md5_top_n_ids_sql

    ids = list(range(200))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = [r["doc_id"] for r in md5_top_n_ids(df, "doc_id", 25).collect()]

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(i,) for i in ids])
    want = [
        r[0]
        for r in con.execute(md5_top_n_ids_sql("t", "doc_id", 25)).fetchall()
    ]
    assert got == want and len(got) == 25
