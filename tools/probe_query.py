"""Generic fresh-JVM per-query probe for the r19 optimization round.

Bench-identical session (local[$SPARK_GRAFT_CPUS or 32], shuffle
partitions = cores, AQE on, UTC, noop sink, bench warmups), then for each
named query: one FIRST wall (pays whatever memo fills the query owns,
like bench pass-1 when the query runs first in its family) and N steady
reruns (median + [min, max]). Optionally dumps `.explain("formatted")`
to plans/<tag>/<query>_<suffix>.txt.

Usage::

    python tools/probe_query.py QUERY [QUERY...] [--runs 3]
        [--sf-dir /root/testdata/sf0.1] [--plans-dir plans/r19]
        [--plan-suffix before] [--no-warm]

Prints one JSON line per query.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--plan-suffix", default="before")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("polarify-r19-probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.cleaner.periodicGC.interval", "30s")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    registry = entry_mod.queries()
    missing = [q for q in args.queries if q not in registry]
    if missing:
        sys.exit(f"unknown queries: {missing}")

    if not args.no_warm:
        # bench.py's warmups: parquet footers, Arrow worker pool, shuffle/
        # join/window codegen, localCheckpoint machinery
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").count()
        spark.range(spark.sparkContext.defaultParallelism * 2).repartition(
            spark.sparkContext.defaultParallelism
        ).mapInPandas(lambda it: it, schema="id long").count()
        warm = spark.range(10_000).select(
            F.col("id"),
            (F.col("id") % 100).alias("k"),
            F.md5(F.col("id").cast("string")).alias("s"),
        )
        (
            warm.groupBy("k")
            .agg(F.count("*").alias("n"), F.min("s").alias("m"))
            .join(F.broadcast(spark.range(100).withColumnRenamed("id", "k")), "k")
            .withColumn("r", F.row_number().over(Window.partitionBy("k").orderBy("n")))
            .count()
        )
        spark.range(1_000).localCheckpoint(eager=True).count()

    def timed(fn, name) -> float:
        # construction + execution together, exactly like bench.py's sweep
        # (iterative operators do driver-side work before returning the df)
        t0 = time.perf_counter()
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in args.queries:
        fn = registry[name]
        spark.sparkContext.setJobDescription(f"probe:{name}:first")
        first = timed(fn, name)
        runs = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"probe:{name}:steady{i}")
            runs.append(timed(fn, name))
        spark.sparkContext.setJobDescription(None)
        if args.plans_dir:
            out = Path(args.plans_dir) / f"{name}_{args.plan_suffix}.txt"
            out.parent.mkdir(parents=True, exist_ok=True)
            df = fn(spark, args.sf_dir)
            out.write_text(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        print(
            json.dumps(
                {
                    "query": name,
                    "first": round(first, 3),
                    "steady": round(statistics.median(runs), 3),
                    "spread": [round(min(runs), 3), round(max(runs), 3)],
                    "runs": args.runs,
                    "cpus": cpus,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
