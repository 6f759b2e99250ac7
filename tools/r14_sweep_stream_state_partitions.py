import os, sys, time
sys.path.insert(0, "/root/repo")
SF="/root/testdata/sf0.1"
from recommender_system_with_pyspark_spark.session import get_spark
spark = get_spark(app_name="profstream", master="local[32]", shuffle_partitions=32)
import __spark_entry__ as e
qs = e.queries()
def run(name):
    t0=time.time()
    df = qs[name](spark, SF)
    df.write.mode("overwrite").format("noop").save()
    return time.time()-t0
for n in ("32","8","4"):
    spark.conf.set("spark.sql.shuffle.partitions", n)
    for q in ("stream_tumbling_counts","stream_decayed_features"):
        ts = sorted(run(q) for _ in range(4))[1:3]
        print(f"shuffle={n} {q}: {sum(ts)/2:.3f}s")
spark.conf.set("spark.sql.shuffle.partitions", "32")
