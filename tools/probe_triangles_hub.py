"""Hub-stress probe for degree-oriented triangle enumeration (SCALE.md r9).

Two stresses, each timing the id-oriented two-join form against the
degree-oriented (Suri-Vassilvitskii) form that ``dedup_graph_triangles``
now uses:

* **clique replica (end-to-end)**: one sf0.01 document replicated 1000×
  (fresh doc_ids, same text) — the SimHash graph gains a 1000-member
  clique (~500k edges, ~166M triangles flowing through the join into the
  per-doc partial aggregate). All degrees inside a clique are equal, so
  both orientations plan the same shape; the probe demonstrates the
  pipeline COMPLETES with bounded tasks when a boilerplate family is
  dense, and what the output-bound cost looks like.
* **star hub (synthetic edge list)**: one hub with STAR_LEAVES leaves on
  EACH side of its id (degree 2*STAR_LEAVES) plus a background of small
  cliques. Here the forms genuinely diverge: with the hub mid-order the
  id-oriented wedge join streams STAR_LEAVES^2 hub wedges (2.5x10^7 for
  the default 5k) into the closure join, while degree orientation points
  every hub edge INTO the hub, so the hub sources no wedges at all.

Usage: ``PYTHONPATH=. python tools/probe_triangles_hub.py`` — prints one
JSON line per stress; paste into SCALE.md. Body behind ``main()`` so
imports are side-effect free.
"""
import json
import sys
import time
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

CLIQUE = 1000
STAR_LEAVES = 5_000


def main() -> None:
    sys.argv = ["probe_triangles_hub"]

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("triangles-hub-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from polarify_spark.operators.dedup import (
        _triangles_degree_oriented,
        _triangles_id_oriented,
        graph_triangles,
    )

    def per_doc_counts(tri):
        return (
            tri.select(F.explode(F.array("a", "b", "c")).alias("doc_id"))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_triangles"))
        )

    def wall(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # --- stress 1: end-to-end 1000-member clique replica ------------------
    import tempfile

    src = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{src}/documents.parquet")
    base_id = docs.agg(F.max("doc_id")).first()[0] + 1
    seed = docs.orderBy("doc_id").limit(1)
    clones = seed.crossJoin(
        spark.range(CLIQUE).select((F.col("id") + base_id).alias("new_id"))
    ).select(
        F.col("new_id").alias("doc_id"),
        *[c for c in docs.columns if c != "doc_id"],
    )
    tmp = tempfile.mkdtemp(prefix="polarify_spark_hub_probe_")
    docs.unionByName(clones).write.mode("overwrite").parquet(
        f"{tmp}/documents.parquet"
    )

    t0 = time.perf_counter()
    n_docs = graph_triangles(spark, tmp).count()
    e2e = round(time.perf_counter() - t0, 3)
    clique_rows = (
        graph_triangles(spark, tmp)
        .where(F.col("doc_id") >= base_id)
        .agg(F.count("*"), F.max("n_triangles"))
        .first()
    )
    print(
        json.dumps(
            {
                "stress": f"clique_replica_{CLIQUE}",
                "e2e_wall": e2e,
                "docs_with_triangles": n_docs,
                "clique_members_reported": clique_rows[0],
                "max_triangles_per_doc": clique_rows[1],
                # the seed doc is identical to its clones, so the clique
                # actually has CLIQUE+1 members; each participates in
                # C(CLIQUE, 2) triangles
                "expected_per_member": CLIQUE * (CLIQUE - 1) // 2,
            }
        ),
        flush=True,
    )
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)

    # --- stress 2: synthetic star hub -------------------------------------
    # hub id placed mid-order so the id-oriented form wedges at the hub
    hub = STAR_LEAVES
    leaves = list(range(hub)) + list(
        range(hub + 1, 2 * STAR_LEAVES + 1)
    )
    star = [(min(v, hub), max(v, hub)) for v in leaves]
    # background cliques so both plans have real triangles to find
    bg = []
    for c in range(200):
        basev = 10_000_000 + 10 * c
        ids = list(range(basev, basev + 5))
        bg += [
            (a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]
        ]
    edges = spark.createDataFrame(star + bg, "d1 long, d2 long").repartition(
        32
    )
    edges = edges.localCheckpoint(eager=True)

    w_deg = wall(per_doc_counts(_triangles_degree_oriented(edges)))
    w_id = wall(per_doc_counts(_triangles_id_oriented(edges)))
    print(
        json.dumps(
            {
                "stress": f"star_hub_{STAR_LEAVES}",
                "degree_oriented_wall": w_deg,
                "id_oriented_wall": w_id,
                "speedup": round(w_id / w_deg, 2) if w_deg else None,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
