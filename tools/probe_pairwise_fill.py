"""A/B forensic for the r11 `dedup_ngram_jaccard` fill regression.

VERDICT r11 ask #1: first-wall went 3.34 s (r10, plain deserialized
``localCheckpoint``) -> 21.39 s (r11, `_materialize` at serialized
MEMORY_AND_DISK). This probe times the pairwise memo FILL only, one
fresh JVM per arm (mode-order independence — ADVICE r11 #3), so the
two storage levels are compared under identical conditions:

    python tools/probe_pairwise_fill.py            # run all arms
    python tools/probe_pairwise_fill.py ARM        # single arm (child)

Arms:
    default     _CHECKPOINT_STORAGE = None  (Spark's deserialized default)
    serialized  _CHECKPOINT_STORAGE = MEMORY_AND_DISK (the r11 pinned level)
    bare        no checkpoint at all — `_pairwise_jaccard(...).count()`
                (isolates kernel cost from materialization cost)

Each arm reports fill wall + a steady re-read wall.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
ARMS = ("default", "serialized", "bare")


def _session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName(f"probe-pairwise-{os.getpid()}")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )


def run_arm(arm: str) -> dict:
    from pyspark import StorageLevel

    from polarify_spark.operators import _memo, dedup

    spark = _session()
    pinned = _memo._CHECKPOINT_STORAGE
    try:
        if arm == "default":
            _memo._CHECKPOINT_STORAGE = None
        elif arm == "serialized":
            _memo._CHECKPOINT_STORAGE = StorageLevel.MEMORY_AND_DISK
        grams = dedup._grams_df(spark, SF_DIR)
        t0 = time.perf_counter()
        if arm == "bare":
            n = dedup._pairwise_jaccard(grams).count()
            fill = time.perf_counter() - t0
            steady = None
        else:
            df = dedup._memoized_pairwise(grams)
            n = df.count()
            fill = time.perf_counter() - t0
            t1 = time.perf_counter()
            dedup._memoized_pairwise(grams).count()
            steady = round(time.perf_counter() - t1, 3)
        return {
            "arm": arm,
            "rows": n,
            "fill_s": round(fill, 3),
            "steady_s": steady,
        }
    finally:
        _memo._CHECKPOINT_STORAGE = pinned
        spark.stop()


def main() -> None:
    if len(sys.argv) > 1:  # child: one arm, fresh JVM
        print(json.dumps(run_arm(sys.argv[1])))
        return
    results = []
    for arm in ARMS:
        out = subprocess.run(
            [sys.executable, __file__, arm],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            results.append(json.loads(line))
        except (json.JSONDecodeError, ValueError):
            results.append({"arm": arm, "error": out.stderr[-800:]})
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"probe": "pairwise_fill", "sf_dir": SF_DIR, "arms": results}))


if __name__ == "__main__":
    main()
