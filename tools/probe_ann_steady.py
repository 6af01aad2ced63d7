"""Adjudicate the r18 similarity_topk steady-level shift (VERDICT r18 #1).

The r18 driver bench moved the ANN top-k subfamily's memo-warm walls hard
(`topk_pq` 0.60 -> 2.86 s pass-1 / 4.4 s steady, `topk_pq_rerank`
1.05 -> 7.82 / 5.0 s, `topk_ivf` 0.54 -> 2.20 / 2.8 s,
`topk_bruteforce` 0.64 -> 1.73 / 2.2 s) in the exact round that serialized
the three corpus-sized ANN memo checkpoints (commit 1b6dbce). Two
candidate causes, measured here in a FRESH JVM per invocation (the
`probe_spans_steady.py` adjudication pattern — bench-identical session:
local[32], shuffle partitions 32, AQE on, UTC, noop sink):

* the serialized `_CHECKPOINT_STORAGE` re-paying per-action
  deserialization — A/B'd by the ``pinned`` (shipped MEMORY_AND_DISK
  serialized) vs ``deser`` (Spark default deserialized) modes;
* driver-bench session state / host degradation — if a healthy fresh JVM
  reproduces sub-second steady medians for all four queries in BOTH
  storage modes, the driver numbers were session noise, not code.
  (`topk_bruteforce` is the control: byte-identical since r17 and it
  touches NO memo checkpoint, so any steady shift it shows is
  environment by construction.)

Per mode: release the ANN memo, pay each query's fill once IN REGISTRY
ORDER (earlier fills warm shared structures exactly like bench's pass-1
sweep), then time N steady reruns per query and report median +
[min, max]. ``dq_count`` decomposes the PQ pair's steady path: a bare
count over the memoized `_pq_dequantized` table (expected ~0.05 s — if
THIS is seconds, the checkpoint re-pays real work per action and the
storage trade is implicated). Usage::

    python tools/probe_ann_steady.py [--runs 5] [--modes pinned,deser]
        [--sf-dir /root/testdata/sf0.1]

Prints one JSON line per (mode, query); paste into SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

MODES = ["pinned", "deser"]

QUERIES = [
    "similarity_topk_bruteforce",
    "similarity_topk_ivf",
    "similarity_topk_pq",
    "similarity_topk_pq_rerank",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--modes", default="pinned,deser")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    modes = [m for m in args.modes.split(",") if m]
    unknown = [m for m in modes if m not in MODES]
    if unknown:
        ap.error(f"unknown modes {unknown}; choose from {MODES}")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("polarify-ann-steady-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from polarify_spark.operators import (
        EXTENSION_QUERIES,
        _memo,
        release_shared_caches,
        similarity,
    )

    sf_dir = args.sf_dir
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()  # warm fs

    pinned = _memo._CHECKPOINT_STORAGE  # shipped level, restored at exit
    levels = {"pinned": pinned, "deser": None}

    def run_once(name: str) -> float:
        fn = EXTENSION_QUERIES[name][0]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    try:
        for mode in modes:
            _memo._CHECKPOINT_STORAGE = levels[mode]
            release_shared_caches(spark, scope="ann")
            fills = {name: run_once(name) for name in QUERIES}
            for name in QUERIES:
                steady = [run_once(name) for _ in range(args.runs)]
                med = statistics.median(steady)
                extra = {}
                if name == "similarity_topk_pq":
                    # steady decomposition: the memoized dequantized
                    # corpus alone — seconds here = the checkpoint
                    # re-pays real work per action (storage implicated)
                    emb = similarity._emb(spark, sf_dir)
                    t0 = time.perf_counter()
                    similarity._pq_dequantized(emb).count()
                    extra["dq_count"] = round(time.perf_counter() - t0, 3)
                print(
                    json.dumps(
                        {
                            "mode": mode,
                            "query": name,
                            "sf_dir": sf_dir,
                            "fill": fills[name],
                            "steady": steady,
                            "median": med,
                            "spread": [min(steady), max(steady)],
                            **extra,
                        }
                    ),
                    flush=True,
                )
    finally:
        _memo._CHECKPOINT_STORAGE = pinned


if __name__ == "__main__":
    main()
