"""Negative tests: unsupported constructs raise ``TranspileError`` (a
``ValueError``) with a stable, matchable message — the reference's error
contract (/root/reference/tests/test_error_handling.py:8-12)."""

from __future__ import annotations

import re

import pytest

from polarify_spark import TranspileError, sparkify

from .corpus import REJECTED


@pytest.mark.parametrize(
    ("func", "fragment"), REJECTED, ids=lambda p: getattr(p, "__name__", str(p))
)
def test_rejected_constructs(func, fragment):
    with pytest.raises(ValueError, match=re.escape(fragment)):
        sparkify(func)


def test_transpile_error_is_value_error():
    assert issubclass(TranspileError, ValueError)
