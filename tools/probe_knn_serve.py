"""Scale probe for the persisted-index kNN serving path (SCALE.md round 8).

`tools/scale_probe.py` times whole registered queries; the serving path
needs a finer split — per replication factor R in {1,10,100}:

* on-disk IVF index BUILD wall (`_served_index_path` after a memo + dir
  cleanup, so every build is cold);
* first SERVE wall (cold scan of the freshly persisted index);
* steady SERVE wall (second run — the latency a warmed session pays);
* the same first/steady split for ``similarity_knn_join_rplsh``.

Replica dirs come from :func:`tools.scale_probe.build_scaled` (cached
under ``.scale/``). The query block is the fixed ``KNN_QUERY_LO..HI``
window, so the probe answers the serving question directly: corpus grows
R×, query load doesn't — what happens to latency?

Usage: ``PYTHONPATH=. python tools/probe_knn_serve.py`` — prints one
JSON line per factor; paste into SCALE.md. The probe body lives behind
``main()`` / ``__main__`` (matching ``tools/plan_audit.py`` and
``tools/staleness.py``) so an accidental import — e.g. a test sweeping
``tools/`` — cannot launch a 24g-driver Spark session or mutate
``sys.argv`` as an import side effect.
"""
import json
import sys
import time
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    sys.argv = ["probe_knn_serve"]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("knn-serve-scale-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from tools.scale_probe import build_scaled
    from polarify_spark.operators import knn

    reg = e.queries()
    serve_q = reg["similarity_knn_index_serve"]
    rplsh_q = reg["similarity_knn_join_rplsh"]

    def noop_wall(fn, d):
        t0 = time.perf_counter()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # untimed warmup at R=1: JIT, codegen, Arrow workers, parquet footers
    warm = build_scaled(spark, 1)
    serve_q(spark, warm).count()
    rplsh_q(spark, warm).count()

    for f in (1, 10, 100):
        d = build_scaled(spark, f)
        knn._cleanup_index_dirs()
        spark.catalog.clearCache()
        spark.read.parquet(f"{d}/embeddings.parquet").count()  # warm fs cache

        t0 = time.perf_counter()
        knn._served_index_path(spark, d)  # index build (memo now cold)
        build = round(time.perf_counter() - t0, 3)

        serve_cold = noop_wall(serve_q, d)  # index already built: cold scan
        serve_steady = noop_wall(serve_q, d)
        serve_rows = serve_q(spark, d).count()

        rplsh_cold = noop_wall(rplsh_q, d)
        rplsh_steady = noop_wall(rplsh_q, d)
        rplsh_rows = rplsh_q(spark, d).count()

        print(
            json.dumps(
                {
                    "factor": f,
                    "index_build": build,
                    "serve_cold": serve_cold,
                    "serve_steady": serve_steady,
                    "serve_rows": serve_rows,
                    "rplsh_cold": rplsh_cold,
                    "rplsh_steady": rplsh_steady,
                    "rplsh_rows": rplsh_rows,
                }
            ),
            flush=True,
        )

    knn._cleanup_index_dirs()
    spark.stop()


if __name__ == "__main__":
    main()
