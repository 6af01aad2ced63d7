"""Time-series operators vs DuckDB oracle (incl. native ASOF JOIN)."""

from __future__ import annotations

import pytest

from polarify_spark.operators.timeseries import QUERIES

from .oracle_harness import compare_query

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", list(QUERIES), ids=list(QUERIES))
def test_timeseries_matches_oracle(spark, name):
    fn, sql = QUERIES[name]
    compare_query(spark, SF_DIR, fn, sql)


def test_percentile_approx_tracks_exact_percentiles(spark):
    """The documented scale swap-in (percentile_approx: mergeable sketch,
    bounded memory) guarantees RANK error <= 1/accuracy, not value error —
    a skewed tail can put neighboring ranks far apart in value. So the
    contract tested is the real one: each approx percentile must lie
    within the exact value band of percentiles eps on either side
    (eps = 0.01 >> 1/accuracy = 0.001)."""
    from pyspark.sql import functions as F

    from polarify_spark.operators.timeseries import _events

    sf = "/root/testdata/sf0.001"
    events = _events(spark, sf)
    targets = [0.5, 0.9, 0.99]
    eps = 0.01
    bands = [p for t in targets for p in (max(0.0, t - eps), min(1.0, t + eps))]
    exact_rows = (
        events.groupBy("event_type")
        .agg(F.percentile("value", F.array(*[F.lit(p) for p in bands])).alias("b"))
        .collect()
    )
    exact_bands = {r["event_type"]: list(r["b"]) for r in exact_rows}
    approx_rows = (
        events.groupBy("event_type")
        .agg(
            F.percentile_approx(
                "value", F.array(*[F.lit(t) for t in targets]), 1000
            ).alias("p")
        )
        .collect()
    )
    assert approx_rows
    for r in approx_rows:
        band = exact_bands[r["event_type"]]
        for i, got in enumerate(r["p"]):
            lo, hi = band[2 * i], band[2 * i + 1]
            assert lo <= got <= hi, (r["event_type"], targets[i], got, lo, hi)
