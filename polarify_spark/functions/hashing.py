"""Portable deterministic hashing built on MD5.

Spark's native ``hash()`` (Murmur3) and ``xxhash64`` have no DuckDB
counterpart, so operators that must be oracle-checkable derive integer hashes
from ``md5`` hex digests, which both engines produce identically:

    Spark :  conv(substring(md5(c), 1, n), 16, 10)  cast long
    DuckDB:  CAST(CONCAT('0x', SUBSTR(md5(c), 1, n)) AS BIGINT)

All of this is JVM-side expression work (no Python in the row path); at
cluster scale the md5 evaluation fuses into the same whole-stage-codegen
stage as the surrounding projections.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import Column

#: Largest signed-32-bit Mersenne prime; modulus for minhash permutations.
MERSENNE_P = 2_147_483_647


def md5_long(col: "Column | str", hex_chars: int = 8) -> "Column":
    """First ``hex_chars`` hex digits of md5 as a non-negative BIGINT.

    8 hex chars -> 32-bit range (minhash material); up to 15 stays within
    int64. DuckDB equivalent above.
    """
    from pyspark.sql import functions as F

    if not 1 <= hex_chars <= 15:
        raise ValueError("hex_chars must be in [1, 15] to fit a signed int64")
    return F.conv(F.substring(F.md5(col), 1, hex_chars), 16, 10).cast("long")


def md5_top_n_ids(df, id_col: str, n: int):
    """The ``n`` rows of ``df`` with the smallest ``md5(id)`` (ties to the
    lower id), projected to just ``id_col`` — the deterministic fixed-size
    sample bound shared by the dedup recall harness and PQ codebook
    training. A global top-N (TakeOrdered: linear scan + bounded heap,
    never a sort), so the sample is O(n) to pick and O(1) in the corpus.

    DuckDB twin: ``md5_top_n_ids_sql``. Keep both in sync — a tie-break or
    hash-width tweak on one side silently desynchronizes the Python
    sampler from its SQL oracle."""
    from pyspark.sql import functions as F

    return (
        df.select(id_col)
        .orderBy(md5_long(F.col(id_col).cast("string"), 8), F.col(id_col))
        .limit(n)
    )


def md5_top_n_ids_sql(table: str, id_col: str, n: int) -> str:
    """DuckDB twin of :func:`md5_top_n_ids`, as a full SELECT body."""
    return (
        f"SELECT {id_col} FROM {table}\n"
        f"  ORDER BY CAST(CONCAT('0x', SUBSTR(md5(CAST({id_col} AS VARCHAR))"
        f", 1, 8))\n                AS BIGINT),\n           {id_col}\n"
        f"  LIMIT {n}"
    )


def hex_nibble(col: "Column | str", position: int) -> "Column":
    """Value 0-15 of the ``position``-th (1-based) hex digit of md5(col).

    DuckDB: ``strpos('0123456789abcdef', substr(md5(c), pos, 1)) - 1``.
    When several nibbles of the same value are needed, materialize the
    digest once and use :func:`hex_nibble_of` — this form recomputes md5
    per call.
    """
    from pyspark.sql import functions as F

    return hex_nibble_of(F.md5(col), position)


def hex_nibble_of(digest: "Column", position: int) -> "Column":
    """Like :func:`hex_nibble` but over an already-computed md5 hex digest."""
    from pyspark.sql import functions as F

    return F.instr(F.lit("0123456789abcdef"), F.substring(digest, position, 1)) - 1


def minhash_perm_params(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) for the j-th minhash permutation
    ``(a * (h % p) + b) % p``. Shared verbatim by the SQL oracles; values are
    small enough that ``a * h`` stays far below int64 overflow."""
    return [(2 * j + 1, 7919 * j) for j in range(num_perm)]
