import os, sys, time
sys.path.insert(0, "/root/repo")
SF="/root/testdata/sf0.1"
from recommender_system_with_pyspark_spark.session import get_spark
from recommender_system_with_pyspark_spark.io import load_table
from pyspark.sql import functions as F
spark = get_spark(app_name="mp3cap", master="local[32]", shuffle_partitions=32)
docs = load_table(spark, SF, "documents").filter(F.length("text") > 0)
from recommender_system_with_pyspark_spark.operators import multimodal as M
def noop(df):
    t0=time.time(); df.write.mode("overwrite").format("noop").save(); return time.time()-t0
def med(fn, n=5):
    fn()
    ts = sorted(fn() for _ in range(n)); return ts[n//2]
print("docs plan sizeInBytes:", docs._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
for tgt in (1, 4, 8, 12, 16, 32):
    d = docs.repartition(tgt, "doc_id") if tgt > 1 else docs.coalesce(1)
    media = M.text_to_mp3_media(d, n_frames=24)   # feed spread is no-op after repartition
    t = med(lambda: noop(M.mp3_header_audit(media)))
    print(f"target={tgt}: header_audit={t:.3f}s")
