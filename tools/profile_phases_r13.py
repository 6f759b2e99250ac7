"""Phase-level profiling for the round-13 optimization targets.

Times sub-steps of the expensive headline queries with the noop sink and
prints partition counts, so the optimization work targets the real cost
(guide §1: measure first). Read-only — no engine changes.

Usage: python tools/profile_phases_r13.py [target ...]
Targets: mp3, bpe, negsample, triangles, clusters, kmeans, als, scans
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df) -> float:
    t0 = time.time()
    df.write.mode("overwrite").format("noop").save()
    return time.time() - t0


def bench(label, fn, n=3):
    # one warmup, then median-ish of n
    fn()
    ts = sorted(fn() for _ in range(n))
    print(f"  {label}: {ts[n // 2]:.3f}s  (all: {['%.3f' % t for t in ts]})")


def main() -> int:
    targets = set(sys.argv[1:]) or {"scans", "mp3", "bpe", "negsample", "triangles",
                                    "clusters", "kmeans", "als"}
    from pyspark.sql import functions as F

    from recommender_system_with_pyspark_spark.session import get_spark
    from recommender_system_with_pyspark_spark.io import load_table

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(app_name="profile_r13", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)

    if "scans" in targets:
        print("== scan partition counts ==")
        for t in ("lineitem", "orders", "documents", "embeddings", "events"):
            df = load_table(spark, SF_DIR, t)
            print(f"  {t}: partitions={df.rdd.getNumPartitions()} rows={df.count()}")

    if "mp3" in targets:
        print("== mp3 header audit phases ==")
        from recommender_system_with_pyspark_spark.operators import multimodal as M

        docs = load_table(spark, SF_DIR, "documents").filter(F.length("text") > 0)
        media = M.text_to_mp3_media(docs, n_frames=24)
        print(f"  media partitions: {media.rdd.getNumPartitions()}")
        bench("encode only", lambda: noop(media))
        bench("encode+parse", lambda: noop(M.mp3_header_audit(media)))
        spread = docs.repartition(cpus, "doc_id")
        media_s = M.text_to_mp3_media(spread, n_frames=24)
        bench("spread encode only", lambda: noop(media_s))
        bench("spread encode+parse", lambda: noop(M.mp3_header_audit(media_s)))

    if "bpe" in targets:
        print("== bpe_train_batched phases ==")
        from recommender_system_with_pyspark_spark.operators.text import bpe_train_batched

        docs = load_table(spark, SF_DIR, "documents")
        t0 = time.time()
        bpe_train_batched(docs, n_merges=8, batch_size=4)
        print(f"  full train: {time.time() - t0:.3f}s")
        t0 = time.time()
        bpe_train_batched(docs.repartition(cpus, "doc_id"), n_merges=8, batch_size=4)
        print(f"  spread train: {time.time() - t0:.3f}s")

    if "negsample" in targets:
        print("== negative_sample phases ==")
        from recommender_system_with_pyspark_spark.operators.sampling import negative_sample

        orders = load_table(spark, SF_DIR, "orders")
        lineitem = load_table(spark, SF_DIR, "lineitem")
        inter = orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]).select(
            F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item_id")
        )
        bench("interactions distinct only",
              lambda: noop(inter.select("user_id", "item_id").distinct()), n=3)
        bench("full negative_sample",
              lambda: noop(negative_sample(inter, "user_id", "item_id", k=4,
                                           oversample=3, seed=5)), n=3)

    if "triangles" in targets:
        print("== part_triangles phases ==")
        li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
        a = li.select("l_orderkey", F.col("l_partkey").alias("pa"))
        b = li.select("l_orderkey", F.col("l_partkey").alias("pb"))
        edges = (
            a.join(b, "l_orderkey").filter(F.col("pa") < F.col("pb"))
            .groupBy("pa", "pb").agg(F.count_distinct("l_orderkey").alias("_s"))
            .filter(F.col("_s") >= 2).select("pa", "pb")
        )
        bench("edge derivation", lambda: noop(edges))
        from recommender_system_with_pyspark_spark.operators.graph import triangle_stats

        def full():
            e = edges.localCheckpoint(eager=False)
            return noop(triangle_stats(e, "pa", "pb"))
        bench("full triangle census", full)

    if "clusters" in targets:
        print("== dedup_clusters ==")
        import __spark_entry__ as e
        qs = e.queries()
        bench("dedup_clusters", lambda: noop(qs["dedup_clusters"](spark, SF_DIR)))

    if "kmeans" in targets:
        print("== kmeans_embeddings ==")
        import __spark_entry__ as e
        qs = e.queries()
        bench("kmeans_embeddings", lambda: noop(qs["kmeans_embeddings"](spark, SF_DIR)))

    if "als" in targets:
        print("== als_recommend phases ==")
        from recommender_system_with_pyspark_spark.flagship import (
            implicit_ratings, als_safe_ids, recommend_top_items,
        )
        from recommender_system_with_pyspark_spark.operators.relational import (
            prune_sparse_entities,
        )
        from pyspark.ml.recommendation import ALS

        def fit_only():
            ratings = implicit_ratings(spark, SF_DIR).cache()
            pruned = prune_sparse_entities(ratings, "item_id", "user_id", 2, 2)
            als_in, umap, imap = als_safe_ids(pruned)
            t0 = time.time()
            model = ALS(rank=8, maxIter=5, regParam=0.1, userCol="user_id",
                        itemCol="item_id", ratingCol="rating",
                        coldStartStrategy="drop", seed=1).fit(als_in)
            t_fit = time.time() - t0
            t0 = time.time()
            noop(model.recommendForAllUsers(3))
            t_rec = time.time() - t0
            ratings.unpersist()
            return t_fit, t_rec

        for i in range(3):
            f, r = fit_only()
            print(f"  fit={f:.3f}s recommend={r:.3f}s")
        bench("full als_recommend query",
              lambda: noop(recommend_top_items(spark, SF_DIR, k=3, max_iter=5)), n=3)

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
