"""Measure the repeated-span hot-span skew guard's WIN (SCALE.md round 9).

BENCH_DETAIL records the guard's steady COST (~+1.6 s at sf0.1: the
count pre-pass). This probe measures what that buys: on a corpus where
one boilerplate span IS corpus-dominant, the guarded run's salted
two-phase aggregate vs the unguarded run's one serial WindowExec task.

Corpus: the ``.scale/r100`` documents replica (500k docs), with a fixed
16-token boilerplate prefix injected into every even doc_id (250k docs →
each of the 9 span-window hashes lands ~2.25M rows in ONE window group
unguarded). Both runs produce identical output (routing is
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

BOILER = " ".join(f"boiler{i}" for i in range(16))  # 16-token shared span
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

    def wall(hot_count):
        t0 = time.perf_counter()
        df = dedup_repeated_spans(spark, tmp, hot_count=hot_count)
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3), df.count()

    # untimed warmup on the uninjected corpus (JIT/codegen/footers)
    dedup_repeated_spans(spark, base).write.format("noop").mode(
        "overwrite"
    ).save()

    w_guarded, rows_guarded = wall(SPAN_HOT_WINDOWS)
    w_unguarded, rows_unguarded = wall(GUARD_OFF)
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "boiler_docs": n_docs // 2,
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
