"""ALS serving from the IVF index at sf100 (VERDICT r12 #1).

The r12 probe priced EXACT recommendForAllUsers at sf100 at 522,300 s
(~145.6 h) — 99.6% the users×items factor GEMM, driven by the 20M-item
catalog every user scores in full (tools/als_sf100_recommend_r12.log).
This run measures the engine's scale path for the same query:

1. reuse (or rebuild) the probe's compacted ratings + one maxIter=1 fit
   (recommend cost depends on factor shapes, not fit iterations);
2. MIPS→cosine reduction (Bachrach et al. 2014): augment the 20M item
   factors so cosine order = dot order, then ``write_ivf_index`` with
   N_CELLS KMeans cells — the fit-ONCE cost every later probe batch
   amortizes;
3. ANN-serve a 15k-user sample (0.1%, the same fraction the exact probe
   used) through ``hard_negatives_indexed(pos_col=None,
   exclude_self=False)`` — the GEMM scorer fused with partition
   pruning — at n_probe = 4 and 8;
4. recall: exact ``recommendForUserSubset`` on a 1k-user subsample
   (bounded exact cost) vs the ANN answer on the same users;
5. extrapolate the full 15M-user serve and compare to the 145.6 h
   exact number.

Usage: python tools/als_ann_sf100_r13.py [sf_dir] [--reuse-index]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "88g")

TMP = "/root/repo/.scale/_als_probe_tmp"
IDX = "/root/repo/.scale/_als_ann_idx_r13"
N_CELLS = 64
K = 10


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/repo/.scale/sf100"
    reuse_index = "--reuse-index" in sys.argv

    from pyspark.ml.recommendation import ALS
    from pyspark.sql import functions as F

    from recommender_system_with_pyspark_spark.flagship import implicit_ratings
    from recommender_system_with_pyspark_spark.operators.relational import (
        dense_id_compaction,
    )
    from recommender_system_with_pyspark_spark.operators import similarity as S
    from recommender_system_with_pyspark_spark.session import get_spark

    spark = get_spark(
        app_name="als_ann_sf100", shuffle_partitions=256,
        extra_conf={"spark.cleaner.periodicGC.interval": "1min"},
    )
    spark.sparkContext.setCheckpointDir("/tmp/als_ann_ckpt")

    def loadavg() -> float:
        return round(os.getloadavg()[0], 1)

    def emit(**kw) -> None:
        kw["loadavg"] = loadavg()
        print(json.dumps(kw), flush=True)

    def have(stage: str) -> bool:
        return os.path.exists(f"{TMP}/{stage}/_SUCCESS")

    t0 = time.time()
    if not have("ratings"):
        implicit_ratings(spark, sf_dir).write.mode("overwrite").parquet(f"{TMP}/ratings")
    ratings = spark.read.parquet(f"{TMP}/ratings")
    if not have("compacted"):
        compacted, maps = dense_id_compaction(
            ratings, ["user_id", "item_id"], idx_cols=["user_idx", "item_idx"])
        compacted.write.mode("overwrite").parquet(f"{TMP}/compacted")
        for m in maps.values():
            if m is not None:
                m.unpersist()
    compacted = spark.read.parquet(f"{TMP}/compacted")
    emit(stage="data", sec=round(time.time() - t0, 1))

    t0 = time.time()
    als = ALS(rank=8, maxIter=1, regParam=0.1, seed=1,
              userCol="user_id", itemCol="item_id", ratingCol="rating",
              coldStartStrategy="drop", checkpointInterval=2,
              intermediateStorageLevel="MEMORY_ONLY")
    model = als.fit(compacted)
    emit(stage="fit1", sec=round(time.time() - t0, 1))

    # persist factors so probes read parquet, not the model's shuffle lineage
    t0 = time.time()
    if not os.path.exists(f"{TMP}/item_factors/_SUCCESS"):
        model.itemFactors.write.mode("overwrite").parquet(f"{TMP}/item_factors")
    if not os.path.exists(f"{TMP}/user_factors/_SUCCESS"):
        model.userFactors.write.mode("overwrite").parquet(f"{TMP}/user_factors")
    items = spark.read.parquet(f"{TMP}/item_factors")
    users = spark.read.parquet(f"{TMP}/user_factors")
    n_items, n_users = items.count(), users.count()
    emit(stage="factors", n_items=n_items, n_users=n_users,
         sec=round(time.time() - t0, 1))

    # --- index build (the fit-once cost) ---
    t0 = time.time()
    if not (reuse_index and os.path.exists(f"{IDX}/_SUCCESS")):
        m_norm = S.mips_max_norm(items, "features")
        items_aug = S.mips_augment_items(items, m_norm, "features")
        S.write_ivf_index(
            items_aug, IDX, id_col="id", vec_col="features",
            n_cells=N_CELLS, seed=1, max_iter=5,
        )
        emit(stage="index_build", n_cells=N_CELLS, max_norm=round(m_norm, 4),
             sec=round(time.time() - t0, 1))
    centers = S.read_ivf_centers(spark, IDX)

    # --- ANN serve: 15k-user sample (the exact probe's 0.1%) ---
    sample = users.limit(15_000)
    q = S.mips_augment_queries(sample, "features").localCheckpoint()
    n_sample = q.count()
    results = {}
    for n_probe in (4, 8):
        t0 = time.time()
        ann = S.hard_negatives_indexed(
            spark, IDX, q, centers=centers, id_col="id", vec_col="features",
            pos_col=None, k=K, n_probe=n_probe, exclude_self=False,
            max_broadcast_rows=2_000_000,
        ).localCheckpoint()
        n_rows = ann.count()
        sec = round(time.time() - t0, 1)
        results[n_probe] = ann
        emit(stage="ann_serve", n_probe=n_probe, users=n_sample, rows=n_rows,
             sec=sec,
             extrapolated_full_serve_sec=round(sec * n_users / n_sample, 1),
             exact_full_serve_sec=522300.0,
             speedup_vs_exact=round(522300.0 / (sec * n_users / n_sample), 1))

    # --- recall vs exact on a bounded 1k subsample ---
    sub = sample.limit(1000).select(F.col("id").alias("user_id"))
    t0 = time.time()
    exact = (
        model.recommendForUserSubset(sub, K)
        .select("user_id", F.explode("recommendations.item_id").alias("true_id"))
        .select(F.col("user_id").alias("query_id"), "true_id")
        .localCheckpoint()
    )
    n_exact = exact.count()
    emit(stage="exact_subset", users=1000, rows=n_exact,
         sec=round(time.time() - t0, 1))
    sub_ids = [r["user_id"] for r in sub.collect()]
    for n_probe, ann in results.items():
        hits = exact.join(
            ann.filter(F.col("query_id").isin(sub_ids))
            .withColumnRenamed("query_id", "_q2"),
            (F.col("query_id") == F.col("_q2"))
            & (F.col("true_id") == F.col("neighbor_id")),
            "inner",
        ).count()
        emit(stage="recall", n_probe=n_probe, n_cells=N_CELLS,
             recall=round(hits / max(n_exact, 1), 4))
    return 0


if __name__ == "__main__":
    sys.exit(main())
