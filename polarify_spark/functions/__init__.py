"""Engine-portable column functions shared by the extension operators.

Everything here composes built-in ``pyspark.sql.functions`` only — JVM-side,
whole-stage-codegen friendly, no Python UDFs — and each helper has an exact
DuckDB SQL equivalent (used by the oracle queries), so results are
bit-reproducible across engines.
"""

from .hashing import (
    MERSENNE_P,
    hex_nibble,
    hex_nibble_of,
    md5_long,
    md5_top_n_ids,
    md5_top_n_ids_sql,
    minhash_perm_params,
)
from .temporal import ntz_as_utc_instant, ntz_epoch_seconds
from .textfn import whitespace_tokens, word_ngrams, normalize_ws

__all__ = [
    "md5_long",
    "md5_top_n_ids",
    "md5_top_n_ids_sql",
    "hex_nibble",
    "hex_nibble_of",
    "MERSENNE_P",
    "minhash_perm_params",
    "whitespace_tokens",
    "word_ngrams",
    "normalize_ws",
    "ntz_epoch_seconds",
    "ntz_as_utc_instant",
]
