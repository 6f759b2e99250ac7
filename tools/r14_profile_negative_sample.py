import os, sys, time
sys.path.insert(0, "/root/repo")
SF="/root/testdata/sf0.1"
from recommender_system_with_pyspark_spark.session import get_spark
from recommender_system_with_pyspark_spark.io import load_table
from pyspark.sql import functions as F
spark = get_spark(app_name="profneg", master="local[32]", shuffle_partitions=32)
from recommender_system_with_pyspark_spark.operators.sampling import negative_sample
from recommender_system_with_pyspark_spark.operators.partitioning import spread_small_input
orders = load_table(spark, SF, "orders")
lineitem = spread_small_input(load_table(spark, SF, "lineitem").select("l_orderkey","l_partkey"), "l_orderkey")
inter = orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]).select(
    F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item_id"))
def noop(df):
    t0=time.time(); df.write.mode("overwrite").format("noop").save(); return time.time()-t0
for i in range(3):
    t0=time.time()
    out = negative_sample(inter, "user_id", "item_id", k=4, oversample=3, seed=5)
    t_build=time.time()-t0
    t_exec=noop(out)
    print(f"run{i}: build(eager stats+ckpt)={t_build:.3f}s exec={t_exec:.3f}s total={t_build+t_exec:.3f}s")
