"""Reproduce the BENCH in-sweep context for `dedup_ngram_jaccard`.

The isolated A/B (tools/probe_pairwise_fill.py) shows the fill costs
~7.1 s (deserialized) vs ~7.5 s (serialized) in a fresh session — the
storage level is NOT the +18 s. This probe runs the 12 dedup queries
that precede `dedup_ngram_jaccard` in bench's sorted order (same
session, same warm-up), then times the ngram fill — isolating how much
of the r11 21.4 s is sweep-context (co-resident memo blocks, GC) vs
kernel. One fresh JVM per arm:

    python tools/probe_pairwise_sweep_ctx.py            # both arms
    python tools/probe_pairwise_sweep_ctx.py ARM        # child

Arms: `pinned` (the shipped serialized level) and `default`
(deserialized localCheckpoint, the r10 level).
"""
from __future__ import annotations

import importlib.util
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
TARGET = "dedup_ngram_jaccard"


def _entry():
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(_REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def run_arm(arm: str) -> dict:
    from pyspark.sql import SparkSession

    from polarify_spark.operators import _memo, dedup

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName(f"probe-sweep-ctx-{os.getpid()}")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    pinned = _memo._CHECKPOINT_STORAGE
    try:
        if arm == "default":
            _memo._CHECKPOINT_STORAGE = None
        entry = _entry()
        qs = entry.queries()
        names = sorted(qs)
        prefix = names[: names.index(TARGET)]
        walls = {}
        for name in prefix:
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            walls[name] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        qs[TARGET](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        target_wall = round(time.perf_counter() - t0, 3)
        return {
            "arm": arm,
            "target_wall_s": target_wall,
            "prefix_total_s": round(sum(walls.values()), 3),
            "prefix": walls,
        }
    finally:
        _memo._CHECKPOINT_STORAGE = pinned
        spark.stop()


def main() -> None:
    if len(sys.argv) > 1:
        print(json.dumps(run_arm(sys.argv[1])))
        return
    for arm in ("pinned", "default"):
        out = subprocess.run(
            [sys.executable, __file__, arm], capture_output=True, text=True
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            print(line, flush=True)
        except ValueError:
            print(json.dumps({"arm": arm, "error": out.stderr[-800:]}), flush=True)


if __name__ == "__main__":
    main()
