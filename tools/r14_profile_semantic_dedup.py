import os, sys, time
sys.path.insert(0, "/root/repo")
SF="/root/testdata/sf0.1"
from recommender_system_with_pyspark_spark.session import get_spark
from recommender_system_with_pyspark_spark.io import load_table
from pyspark.sql import functions as F
spark = get_spark(app_name="prof", master="local[32]", shuffle_partitions=32)
emb = load_table(spark, SF, "embeddings")
from recommender_system_with_pyspark_spark.operators import similarity as S
def noop(df):
    t0=time.time(); df.write.mode("overwrite").format("noop").save(); return time.time()-t0
# timestamped phases via a hacked copy: just time the full call 3x
for i in range(4):
    t0=time.time()
    out = S.semantic_dedup_pairs(emb, "vec_id", "embedding", threshold=0.45, n_cells=32, seed=1)
    t_build = time.time()-t0
    t_exec = noop(out)
    print(f"run{i}: build={t_build:.3f}s exec={t_exec:.3f}s total={t_build+t_exec:.3f}s")
