"""Anchored-kernel cost decomposition + PPJoin prefix-filter estimate (r19).

Measurement only — no product code change. Bench-identical session.

Variants (paired, alternating, min-of-N):
  full          the shipped kernel (join + intersect + threshold + distinct)
  no_distinct   kernel minus the final distinct()
  arrays        join + force array transport (hv[0]+hv[0]) but NO intersect
  skeleton      join on equi keys + ratio gate, arrays pruned out entirely

Then (stats, one pass each):
  n_candidates  pairs evaluated by the residual (post equi+ratio, pre jaccard)
  prefix filter simulation at t=JACCARD_THRESHOLD with global-frequency
  ordering: candidate pairs sharing >=1 prefix gram, same lang/band/ratio
  gates -> measured reduction factor vs n_candidates.
"""
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("decomp-anchored")
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

from polarify_spark.operators import dedup as D

sf_dir = "/root/testdata/sf0.1"

# warmups (bench-identical enough: footers + join/agg codegen)
spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
w = spark.range(10_000).select(F.col("id"), (F.col("id") % 100).alias("k"))
w.groupBy("k").count().join(F.broadcast(spark.range(100).withColumnRenamed("id", "k")), "k").count()
spark.range(1_000).localCheckpoint(eager=True).count()

T = D.JACCARD_THRESHOLD
sampled_raw = D._recall_sample_grams(spark, sf_dir)
sampled = sampled_raw.localCheckpoint()
grams = D._grams_df(spark, sf_dir)

s = sampled.withColumn("sz", F.size("hv")).withColumn(
    "band", F.floor(F.col("sz") / D.SIZE_BAND).cast("int"))
g = grams.withColumn("sz", F.size("hv")).withColumn(
    "band", F.floor(F.col("sz") / D.SIZE_BAND).cast("int"))
probe = s.select(
    "doc_id", "lang", "hv", "sz",
    F.explode(F.array(F.col("band") - 1, F.col("band"), F.col("band") + 1)).alias("blk"),
)
a = F.broadcast(probe).alias("a")
b = g.alias("b")
ratio_ok = F.least(F.col("a.sz"), F.col("b.sz")) >= (
    F.greatest(F.col("a.sz"), F.col("b.sz")) * (T - 1e-6))
cond = ((F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.blk") == F.col("b.band"))
        & (F.col("a.doc_id") != F.col("b.doc_id"))
        & ratio_ok)
inter = F.size(F.array_intersect(F.col("a.hv"), F.col("b.hv")))
union = F.col("a.sz") + F.col("b.sz") - inter
jac = inter.cast("double") / union

joined = a.join(b, cond)
pairs = joined.select(
    F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("d1"),
    F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("d2"),
    F.round(jac, 6).alias("jaccard"),
).where(F.col("jaccard") >= T)

variants = {
    "full": lambda: pairs.distinct(),
    "no_distinct": lambda: pairs,
    "arrays": lambda: joined.select(
        (F.element_at(F.col("a.hv"), 1) + F.element_at(F.col("b.hv"), 1)).alias("x")),
    "skeleton": lambda: joined.select(F.lit(1).alias("x")),
}

def run(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0

REPS = 4
times = {k: [] for k in variants}
order = list(variants)
for r in range(REPS):
    seq = order if r % 2 == 0 else order[::-1]
    for k in seq:
        spark.sparkContext.setJobDescription(f"decomp:{k}:{r}")
        times[k].append(run(variants[k]()))
print(json.dumps({k: {"min": round(min(v), 3), "all": [round(x, 3) for x in v]}
                  for k, v in times.items()}), flush=True)

# ---- stats: candidate counts ----
spark.sparkContext.setJobDescription("decomp:n_candidates")
n_cand = joined.count()
n_result = pairs.distinct().count()
print(json.dumps({"n_candidates": n_cand, "n_result_pairs": n_result}), flush=True)

# ---- PPJoin prefix-filter simulation ----
# Global gram doc-frequency over the corpus gram table (one aggregate).
spark.sparkContext.setJobDescription("decomp:prefix_sim")
t0 = time.perf_counter()
freq = (grams.select(F.explode("hv").alias("gram"))
        .groupBy("gram").agg(F.count("*").alias("df")))

def prefix_df(side, id_col):
    # order each doc's grams rarest-first, keep prefix of length
    # sz - ceil(t*sz) + 1 (exact for Jaccard >= t with size lower bound)
    e = side.select(id_col, "lang", "sz",
                    F.floor(F.col("sz") / D.SIZE_BAND).cast("int").alias("band"),
                    F.explode("hv").alias("gram"))
    e = e.join(freq, "gram")
    from pyspark.sql.window import Window
    wn = Window.partitionBy(id_col).orderBy(F.col("df").asc(), F.col("gram").asc())
    e = e.withColumn("rk", F.row_number().over(wn))
    plen = F.col("sz") - F.ceil(F.lit(T) * F.col("sz")) + 1
    return e.where(F.col("rk") <= plen).select(id_col, "lang", "sz", "band", "gram")

sp = prefix_df(s, "doc_id").withColumnRenamed("doc_id", "a_id") \
    .withColumnRenamed("sz", "a_sz").withColumnRenamed("band", "a_band")
gp = prefix_df(g, "doc_id").withColumnRenamed("doc_id", "b_id") \
    .withColumnRenamed("sz", "b_sz").withColumnRenamed("band", "b_band")

pref_ratio = F.least(F.col("a_sz"), F.col("b_sz")) >= (
    F.greatest(F.col("a_sz"), F.col("b_sz")) * (T - 1e-6))
pref_pairs = (sp.join(gp, ["lang", "gram"])
              .where((F.col("a_id") != F.col("b_id"))
                     & (F.abs(F.col("a_band") - F.col("b_band")) <= 1)
                     & pref_ratio)
              .select("a_id", "b_id").distinct())
n_pref = pref_pairs.count()
t_pref = time.perf_counter() - t0
print(json.dumps({"n_prefix_candidates": n_pref,
                  "reduction_vs_current": round(n_cand / max(n_pref, 1), 2),
                  "prefix_sim_wall_s": round(t_pref, 1)}), flush=True)
spark.stop()
