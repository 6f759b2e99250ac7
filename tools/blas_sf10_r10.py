import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions","64")
    .config("spark.ui.showConsoleProgress","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from recommender_system_with_pyspark_spark.io import load_table
from recommender_system_with_pyspark_spark.operators.similarity import hard_negatives, hard_negatives_blas
emb = load_table(spark, "/root/repo/.scale/sf10", "embeddings").localCheckpoint()
n = emb.count()
for nq in (1000, 8000):
    q = emb.filter(F.pmod(F.col("vec_id"), F.lit(n // nq)) == 0).localCheckpoint()
    cnt = q.count()
    t0=time.time()
    hard_negatives_blas(q, emb, k=10).write.mode("overwrite").format("noop").save()
    print(f"blas {cnt:>5} anchors: {time.time()-t0:6.1f}s", flush=True)
# equality vs brute on 100 anchors
small = emb.filter(F.pmod(F.col("vec_id"), F.lit(n // 100)) == 0)
a = sorted(map(tuple, hard_negatives(small, emb, k=10).collect()))
b = sorted(map(tuple, hard_negatives_blas(small, emb, k=10).collect()))
print("equal to brute on", len(a)//10, "anchors:", a == b, flush=True)
