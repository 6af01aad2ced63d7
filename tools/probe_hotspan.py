"""Measure the repeated-span hot-span skew guard's WIN (SCALE.md r10).

This probe measures what the guard buys when a span genuinely IS
corpus-dominant: the guarded run's salted two-phase aggregate vs the
unguarded run's one serial WindowExec task. r10 redesign context: with
the window table materialized, a serial group processes ~2M rows/s, so
the threshold is 2^22 (~2 s serial) and the r9 fixture — 250k rows/hash,
~0.13 s serial — was BELOW it; r9's measured "win" on that fixture was
checkpoint fill-vs-warm, not guard routing (the warm-up below fixes the
methodology, and the fixture now plants a genuinely hot hash).

Corpus: the ``.scale/r100`` documents replica (500k docs), with a
47-token single-repeated-token prefix injected into every even doc_id:
all 40 of its SPAN_K-windows share ONE hash -> 250k docs x 40 = 10M rows
in ONE window group unguarded (~5 s serial at measured throughput).
The guarded run pays driver-side sampled detection (memoized once per
corpus — included in its wall) and routes that hash through the salted
aggregate. Both runs produce identical output (routing is
output-invariant; equality asserted on the interval counts).

Usage: ``PYTHONPATH=. python tools/probe_hotspan.py`` — prints one JSON
line; paste into SCALE.md. Body behind ``main()`` so imports are
side-effect free.
"""
import json
import sys
import time
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

BOILER = " ".join(["boiler"] * 47)  # one hash x 40 windows per doc
GUARD_OFF = 10**12  # hot_count no real group ever reaches


def main() -> None:
    sys.argv = ["probe_hotspan"]

    import shutil
    import tempfile

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("hotspan-guard-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from polarify_spark.operators.dedup import (
        SPAN_HOT_WINDOWS,
        dedup_repeated_spans,
    )
    from tools.scale_probe import build_scaled

    base = build_scaled(spark, 100)
    docs = spark.read.parquet(f"{base}/documents.parquet")
    injected = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit(BOILER + " "), F.col("text")),
        ).otherwise(F.col("text")),
    )
    tmp = tempfile.mkdtemp(prefix="polarify_spark_hotspan_probe_")
    injected.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    n_docs = spark.read.parquet(f"{tmp}/documents.parquet").count()

    def wall(hot_count, count_rows=True):
        t0 = time.perf_counter()
        df = dedup_repeated_spans(spark, tmp, hot_count=hot_count)
        df.write.format("noop").mode("overwrite").save()
        w = round(time.perf_counter() - t0, 3)
        # count() re-executes the whole pipeline (untimed) — skip it on
        # the warm-up calls, whose counts were discarded anyway
        return w, (df.count() if count_rows else None)

    # untimed warmup on the uninjected corpus (JIT/codegen/footers)
    dedup_repeated_spans(spark, base).write.format("noop").mode(
        "overwrite"
    ).save()
    # untimed warm of the INJECTED corpus's memoized window-table
    # checkpoint (r10: _span_windows is an eager localCheckpoint shared
    # by both variants). Without this, whichever timed variant runs
    # first absorbs the one-time materialization — the probe then
    # measures fill-vs-warm instead of guard-routing-vs-straggler,
    # which is what it claims to compare (both variants read the same
    # persisted signature table in production).
    from polarify_spark.operators.dedup import (
        _hot_span_hash_list,
        _span_windows,
    )

    _span_windows(spark, tmp).count()

    # driver-side sampled detection, timed separately: paid once per
    # corpus (memoized), so it belongs in neither steady wall
    t0 = time.perf_counter()
    hot = _hot_span_hash_list(spark, tmp, SPAN_HOT_WINDOWS)
    w_detect = round(time.perf_counter() - t0, 3)
    assert hot, "fixture must plant a hash above SPAN_HOT_WINDOWS"

    # one untimed pass each (whole-stage codegen compiles per plan
    # shape), then the timed steady walls — the state both variants run
    # in after the first call on a given corpus
    wall(SPAN_HOT_WINDOWS, count_rows=False)
    wall(GUARD_OFF, count_rows=False)
    w_guarded, rows_guarded = wall(SPAN_HOT_WINDOWS)
    w_unguarded, rows_unguarded = wall(GUARD_OFF)
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "boiler_docs": n_docs // 2,
                "hot_hashes": len(hot),
                "detect_wall": w_detect,
                "guarded_wall": w_guarded,
                "unguarded_wall": w_unguarded,
                "speedup": round(w_unguarded / w_guarded, 2),
                "rows_guarded": rows_guarded,
                "rows_unguarded": rows_unguarded,
                "outputs_equal": rows_guarded == rows_unguarded,
            }
        ),
        flush=True,
    )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
