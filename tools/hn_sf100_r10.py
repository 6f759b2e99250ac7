"""Hard-negative mining at sf100 (2M-vector catalog) — the similarity
stack's second-decade row (VERDICT r9 #5). The exact 0.9/0.95 pair
censuses are candidate-bound at sf100 by the generator's compounding
self-similar replication (see tools/sf100_census_bound_check.log and
SCALING.md round 10), so the operators measured here are the ones a
100 TB corpus actually runs: the guarded-broadcast GEMM miner (one
catalog scan regardless of anchor count) and the IVF over-fetch path.

Usage: python tools/hn_sf100_r10.py [sf_dir]
"""

import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "128")
    .config("spark.driver.memory", "64g")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from recommender_system_with_pyspark_spark.io import load_table
from recommender_system_with_pyspark_spark.operators.similarity import (
    hard_negatives_ann,
    hard_negatives_blas,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf100"
emb = load_table(spark, sf_dir, "embeddings").localCheckpoint()
n = emb.count()
print(f"catalog: {n} vectors at {sf_dir}", flush=True)

for nq in (1000, 8000):
    q = emb.filter(F.pmod(F.col("vec_id"), F.lit(n // nq)) == 0).localCheckpoint()
    cnt = q.count()
    t0 = time.time()
    hard_negatives_blas(q, emb, k=10).write.mode("overwrite").format("noop").save()
    print(f"blas {cnt:>5} anchors: {time.time()-t0:6.1f}s", flush=True)

q = emb.filter(F.pmod(F.col("vec_id"), F.lit(n // 1000)) == 0).localCheckpoint()
cnt = q.count()
t0 = time.time()
hard_negatives_ann(q, emb, k=10).write.mode("overwrite").format("noop").save()
print(f"ann  {cnt:>5} anchors: {time.time()-t0:6.1f}s (incl. IVF index build)", flush=True)
print("ALL OK", flush=True)
