"""ALS second-decade probe at sf100 — VERDICT r9 #5 / r10 #3 / r11 #1.

The registered entry at sf100 extrapolates to ~12 h in this container
(sf10 solo cold was 4167.6 s on MLlib's pure-Java BLAS fallback), so the
second-decade evidence for ALS is MEASURED COMPONENT CONSTANTS rather
than one infeasible end-to-end run:

1. ratings build (the engine's own join+groupBy over 600M lineitem ×
   150M orders) — timed to completion, row count printed;
2. id compaction (the >int32 branch — sf100 keys reach 9.99e10);
3. ALS fit at maxIter=1 and maxIter=3 (same rank/reg/seed as the entry):
   (t3 - t1) / 2 isolates the per-iteration cost from startup/first-pass;
4. recommendForUserSubset over a 1% user sample: recommendForAllUsers
   is a users × items factor GEMM, linear in users at fixed item count,
   so the subset throughput extrapolates the full recommend.

The printout ends with the extrapolated full-entry wall-clock
(build + compaction + 5 iterations + full recommend), each term measured.

MATERIALIZATION IS PARQUET, NOT PERSIST. The r11 run at the
deserialized persist default spent >75 min GC-bound inside compaction;
the r11b rerun at MEMORY_AND_DISK serialized crashed inside Spark's
CacheManager (recacheByPlan NPE: "SparkPlan.session() is null" while
rebuilding the compacted cache over dense_id_compaction's cached
mapping frames — tools/als_sf100_probe_r11b.log). Writing each stage to
parquet and re-reading gives a fresh lineage per stage: no nested cache
rebuild, no boxed-row heap residency, and it is what a real 100 TB
pipeline does between stages anyway.

HEAP IS PINNED (round-12 finding, SCALING.md): the first r12 attempt ran
on ``get_spark``'s 8 GB default and the user-id distinct crawled — at
sf100 ``user_id`` is NEARLY UNIQUE (~150M distinct over 599M ratings;
2.15M distinct in a 2.34M-row file sample), so each partial-agg task
needs ~1.5 GB of map for its ~17M keys vs ~145 MB available: perpetual
spill cycling at old-gen 99.95%, 70 min of CPU per task with no task
completing. Dedicated second-decade sessions get a dedicated heap, like
every other sf100 tool in tools/.

Stages are RESUMABLE: an existing ``{TMP}/ratings`` (or ``compacted``)
parquet with _SUCCESS is reused, so a cut run continues instead of
repaying the 600M-row build.

Usage: python tools/als_sf100_probe.py [sf_dir]   (default .scale/sf100)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "88g")

TMP = "/root/repo/.scale/_als_probe_tmp"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf100"

    from pyspark.ml.recommendation import ALS
    from pyspark.sql import functions as F

    from recommender_system_with_pyspark_spark.flagship import implicit_ratings
    from recommender_system_with_pyspark_spark.operators.relational import (
        dense_id_compaction,
    )
    from recommender_system_with_pyspark_spark.session import get_spark

    # periodicGC 1min: with an 88g heap, full GCs are rare, so the
    # ContextCleaner (GC-driven) lags and dropped iterations' shuffle
    # files linger on disk — the r12 fit(3) run filled the disk with
    # stale shuffles from fit(1) before its own iterations finished.
    spark = get_spark(
        app_name="als_sf100_probe", shuffle_partitions=256,
        extra_conf={"spark.cleaner.periodicGC.interval": "1min"},
    )
    spark.sparkContext.setCheckpointDir("/tmp/als_probe_ckpt")

    def loadavg() -> float:
        return round(os.getloadavg()[0], 1)

    def have(stage: str) -> bool:
        return os.path.exists(f"{TMP}/{stage}/_SUCCESS")

    t0 = time.time()
    if not have("ratings"):
        ratings = implicit_ratings(spark, sf_dir)
        ratings.write.mode("overwrite").parquet(f"{TMP}/ratings")
    ratings = spark.read.parquet(f"{TMP}/ratings")
    n = ratings.count()
    t_build = round(time.time() - t0, 1)
    print(json.dumps({"ratings_rows": n, "build_sec": t_build,
                      "loadavg": loadavg()}), flush=True)

    def drain_shuffles(min_free_gb: float = 38.0, timeout: float = 180.0) -> None:
        """Disk barrier between fits: a dropped fit's shuffle files are
        only deleted when the ContextCleaner sees the refs die in a GC —
        with an 88 GB heap that can lag minutes, and the r12 fit(2) run
        ENOSPC'd under the previous fit's still-live shuffles. Force the
        GC and wait until the free-disk floor (sized to one fit's live
        shuffle set) is back before starting the next fit.

        The Python-side ref matters as much as the JVM GC: an ALSModel
        whose factors were never checkpointed (maxIter < interval)
        chains its lineage through EVERY training shuffle, so a live
        model object pins all of them — the calibration fit drops its
        model, and gc.collect() here detaches the py4j ref before
        System.gc() runs."""
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        free = shutil.disk_usage("/tmp").free / 1e9
        while time.time() - t0 < timeout and free < min_free_gb:
            time.sleep(5)
            free = shutil.disk_usage("/tmp").free / 1e9
        print(json.dumps({"disk_free_gb": round(free, 1),
                          "drain_sec": round(time.time() - t0, 1)}), flush=True)

    t0 = time.time()
    if not have("compacted"):
        # dense_id_compaction KEEPS the original column names on the
        # compacted frame (withColumnRenamed(idx, col) + select(*df.columns));
        # idx_cols only name the returned MAPPING frames' second column — so
        # ALS is configured on user_id/item_id exactly like ml/models.py
        # (ADVICE r10).
        compacted, maps = dense_id_compaction(
            ratings, ["user_id", "item_id"], idx_cols=["user_idx", "item_idx"])
        compacted.write.mode("overwrite").parquet(f"{TMP}/compacted")
        # at sf100 keys reach 9.99e10, so the compaction branch is engaged
        # and the mapping frames exist; fall back to distincts if it isn't
        n_users = (maps["user_id"].count() if maps["user_id"] is not None
                   else compacted.select("user_id").distinct().count())
        n_items = (maps["item_id"].count() if maps["item_id"] is not None
                   else compacted.select("item_id").distinct().count())
        for m in maps.values():
            if m is not None:
                m.unpersist()
    else:
        n_users = n_items = None
    compacted = spark.read.parquet(f"{TMP}/compacted")
    nc = compacted.count()
    meta_path = f"{TMP}/counts.json"
    if n_users is None:  # resumed: recount once, then cache in a sidecar
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                meta = json.load(fh)
            n_users, n_items = meta["users"], meta["items"]
        else:
            n_users = compacted.select("user_id").distinct().count()
            n_items = compacted.select("item_id").distinct().count()
    with open(meta_path, "w") as fh:
        json.dump({"users": n_users, "items": n_items}, fh)
    t_compact = round(time.time() - t0, 1)
    print(json.dumps({"compacted_rows": nc, "users": n_users,
                      "items": n_items, "compact_sec": t_compact,
                      "loadavg": loadavg()}), flush=True)

    def fit(iters: int, keep_model: bool = True):
        # intermediate blocks MEMORY_ONLY: the box has 125 GB RAM and a
        # dedicated 88 GB heap but only ~50 GB of free disk — the default
        # MEMORY_AND_DISK spilled the 599M-row in/out blocks while
        # per-iteration shuffles were also accumulating, and the r12
        # fit(3) run died on ENOSPC at iteration 2.
        als = ALS(rank=8, maxIter=iters, regParam=0.1, seed=1,
                  userCol="user_id", itemCol="item_id", ratingCol="rating",
                  coldStartStrategy="drop", checkpointInterval=2,
                  intermediateStorageLevel="MEMORY_ONLY")
        t0 = time.time()
        model = als.fit(compacted)
        sec = round(time.time() - t0, 1)
        print(json.dumps({"fit_iters": iters, "sec": sec,
                          "loadavg": loadavg()}), flush=True)
        if not keep_model:
            del model  # calibration fit: release so its shuffles can drain
            return None, sec
        return model, sec

    # (t2 - t1) isolates one marginal iteration; the original (t3 - t1)/2
    # form averaged two, but each extra iteration holds another round of
    # shuffle files on the ~50 GB disk budget — one marginal iteration is
    # the same constant, measured within the disk we actually have.
    drain_shuffles()
    _, t1 = fit(1, keep_model=False)
    drain_shuffles()
    model, t2 = fit(2)
    per_iter = round(t2 - t1, 1)

    frac_users = max(1, n_users // 100)
    subset = model.userFactors.select(
        F.col("id").alias("user_id")).limit(frac_users)
    t0 = time.time()
    recs = model.recommendForUserSubset(subset, 3)
    n_recs = recs.count()
    t_sub = round(time.time() - t0, 1)
    print(json.dumps({"recommend_subset_users": frac_users,
                      "rec_rows": n_recs, "sec": t_sub,
                      "loadavg": loadavg()}), flush=True)

    full_recommend = round(t_sub * (n_users / frac_users), 1)
    full_entry = round(t_build + t_compact + t1 + 4 * per_iter
                       + full_recommend, 1)  # entry trains maxIter=5
    print(json.dumps({
        "sf_dir": sf_dir, "per_iteration_sec": per_iter,
        "extrapolated_full_recommend_sec": full_recommend,
        "extrapolated_full_entry_sec": full_entry,
        "terms": {"build": t_build, "compact": t_compact,
                  "first_fit": t1, "plus_4_iters": 4 * per_iter,
                  "recommend": full_recommend},
    }), flush=True)
    shutil.rmtree(TMP, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
