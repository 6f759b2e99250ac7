"""Round-10 hard-negative mining scale evidence (VERDICT r9 #1 'done'
criterion): at sf10 (200k embedding catalog), show the ANN over-fetch
path scales SUB-LINEARLY in anchor count where brute force is linear —
the difference between mining a training set and scanning the catalog
once per anchor.

Measures, in one session (ANN probes dominate; session state is not the
story here):
- brute force at a small anchor count (the linear reference; its cost/
  anchor extrapolates to the full-training-set disaster the r9 verdict
  called out: ~10^6 s for 1M anchors),
- hard_negatives_ann (IVF) at 1k and 8k anchors (8x the anchors should
  cost well under 8x the time: the KMeans index build + candidate-probe
  constant amortizes),
- recall@10 of the ANN path vs brute force on a 64-anchor subset.

Usage: python tools/hn_scale_r10.py [sf_dir]
"""

import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.driver.memory", "64g")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from recommender_system_with_pyspark_spark.io import load_table
from recommender_system_with_pyspark_spark.operators.similarity import (
    hard_negatives,
    hard_negatives_ann,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10"
emb = load_table(spark, sf_dir, "embeddings").localCheckpoint()
n_cand = emb.count()
print(f"catalog: {n_cand} vectors at {sf_dir}", flush=True)

K = 10
# Index geometry matters at this catalog size (measured, sf10/200k):
# 64 cells / 8 probes reads ~30% of the catalog per anchor (anchors
# gravitate to dense cells) and is barely better than brute per anchor;
# 256 cells / 16 probes targets ~6% and measures ~5x less pair work.
# max_iter=6: coarse cells need balance, not convergence — and the build
# is a once-per-catalog constant anyway.
ANN = dict(k=K, overfetch=4, method="ivf", n_cells=256, n_probe=16, max_iter=6)

# anchor sets: vec_id is stride-partitioned across copies; modulo keeps the
# sets spread over the whole catalog rather than one copy
anchors = {n: emb.filter(F.pmod(F.col("vec_id"), F.lit(n_cand // n)) == 0) for n in (1000, 8000)}
for n, df in anchors.items():
    anchors[n] = df.localCheckpoint()
    print(f"anchors[{n}]: {anchors[n].count()} rows", flush=True)

# linear reference: brute force on 250 anchors
brute_q = emb.filter(F.pmod(F.col("vec_id"), F.lit(n_cand // 250)) == 0).localCheckpoint()
nb = brute_q.count()
t0 = time.time()
hard_negatives(brute_q, emb, k=K).write.mode("overwrite").format("noop").save()
t_brute = time.time() - t0
print(
    f"brute  {nb:>5} anchors: {t_brute:6.1f}s  ({t_brute/nb*1000:.1f} ms/anchor -> "
    f"~{t_brute/nb*1_000_000/3600:.0f} h for 1M anchors)",
    flush=True,
)

times = {}
# 1-anchor leg first: its wall-clock is ~pure index build (KMeans fit +
# catalog cell assignment), the once-per-catalog constant
one = emb.limit(1).localCheckpoint()
t0 = time.time()
hard_negatives_ann(one, emb, **ANN).write.mode("overwrite").format("noop").save()
t_index = time.time() - t0
print(f"ann        1 anchor : {t_index:6.1f}s  (~index build constant)", flush=True)
for n, q in anchors.items():
    t0 = time.time()
    hard_negatives_ann(q, emb, **ANN).write.mode("overwrite").format("noop").save()
    times[n] = time.time() - t0
    print(f"ann    {q.count():>5} anchors: {times[n]:6.1f}s", flush=True)
ratio = times[8000] / times[1000]
marg = (times[8000] - t_index) / max(times[1000] - t_index, 1e-9)
print(
    f"8x anchors cost {ratio:.2f}x end-to-end / {marg:.2f}x marginal "
    "(index build amortizes across anchor batches)",
    flush=True,
)

# recall vs brute force on 64 anchors
small = emb.filter(F.pmod(F.col("vec_id"), F.lit(n_cand // 64)) == 0)
truth = hard_negatives(small, emb, k=K).select("query_id", F.col("neighbor_id").alias("t"))
approx = hard_negatives_ann(small, emb, **ANN)
n_small = small.count()
hits = truth.join(
    approx.withColumnRenamed("query_id", "q2"),
    (F.col("query_id") == F.col("q2")) & (F.col("t") == F.col("neighbor_id")),
).count()
print(f"recall@{K} vs brute force on {n_small} anchors: {hits/(K*n_small):.4f}", flush=True)
print("ALL OK", flush=True)
