import os, sys, time
sys.path.insert(0, "/root/repo")
SF="/root/testdata/sf0.1"
from recommender_system_with_pyspark_spark.session import get_spark
from recommender_system_with_pyspark_spark.io import load_table
from recommender_system_with_pyspark_spark.operators import similarity as S
from pyspark.sql import functions as F
spark = get_spark(app_name="profemb", master="local[32]", shuffle_partitions=32)
emb = load_table(spark, SF, "embeddings")
def noop(df):
    t0=time.time(); df.write.mode("overwrite").format("noop").save(); return time.time()-t0
def med(fn, n=4):
    ts = sorted(fn() for _ in range(n)); return (ts[1]+ts[2])/2
for nc in (4, 8, 16, 32):
    print(f"blocked n_chunks={nc}: {med(lambda: noop(S.embedding_near_dup_blocked(emb,'vec_id','embedding',threshold=0.4,n_chunks=nc))):.3f}s")
print(f"blas broadcast: {med(lambda: noop(S.embedding_near_dup_blas(emb,'vec_id','embedding',threshold=0.4))):.3f}s")
