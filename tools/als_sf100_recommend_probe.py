"""ALS sf100 recommend-throughput probe — the last component of the
second-decade ALS picture (tools/als_sf100_probe.py measures build /
compaction / fit; its 1% recommendForUserSubset run was disk-cut at ~60
min in this container).

recommendForUserSubset is a blocked users × items factor GEMM with
per-user top-k: linear in the user count at fixed item count, so a 0.1%
user sample (15k of 15.0M) measures the per-user constant the full
recommend extrapolates from. The 20M-item side is what makes each user
expensive here (the sf0.1 entry recommends over 20k items — the sf100
item catalog is 1000× wider, so per-user cost scales with it; MLlib
runs the GEMM on the pure-Java BLAS fallback in this container).

Reuses the probe's compacted parquet; model = one maxIter=1 fit
(recommend cost depends on factor shapes, not fit iterations).

Usage: python tools/als_sf100_recommend_probe.py [frac_denominator]
       (default 1000 -> 0.1% of users)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "88g")

TMP = "/root/repo/.scale/_als_probe_tmp"


def main() -> int:
    denom = int(sys.argv[1]) if len(sys.argv) > 1 else 1000

    from pyspark.ml.recommendation import ALS
    from pyspark.sql import functions as F

    from recommender_system_with_pyspark_spark.session import get_spark

    spark = get_spark(
        app_name="als_sf100_recommend", shuffle_partitions=256,
        extra_conf={"spark.cleaner.periodicGC.interval": "1min"},
    )

    def loadavg() -> float:
        return round(os.getloadavg()[0], 1)

    compacted = spark.read.parquet(f"{TMP}/compacted")
    with open(f"{TMP}/counts.json") as fh:
        meta = json.load(fh)
    n_users, n_items = meta["users"], meta["items"]

    t0 = time.time()
    als = ALS(rank=8, maxIter=1, regParam=0.1, seed=1,
              userCol="user_id", itemCol="item_id", ratingCol="rating",
              coldStartStrategy="drop", checkpointInterval=2,
              intermediateStorageLevel="MEMORY_ONLY")
    model = als.fit(compacted)
    print(json.dumps({"fit1_sec": round(time.time() - t0, 1),
                      "loadavg": loadavg()}), flush=True)

    frac_users = max(1, n_users // denom)
    subset = model.userFactors.select(
        F.col("id").alias("user_id")).limit(frac_users)
    t0 = time.time()
    recs = model.recommendForUserSubset(subset, 3)
    n_recs = recs.count()
    t_sub = round(time.time() - t0, 1)
    full_recommend = round(t_sub * (n_users / frac_users), 1)
    print(json.dumps({
        "recommend_subset_users": frac_users, "rec_rows": n_recs,
        "sec": t_sub, "users": n_users, "items": n_items,
        "extrapolated_full_recommend_sec": full_recommend,
        "loadavg": loadavg(),
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
