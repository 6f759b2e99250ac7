"""Tune ANN parameters until candidate recall is provably 1.0 at sf0.01.

Rationale (VERDICT r4 task #1): once the approximate candidate set provably
contains every true top-k neighbor for every query at the checked scale, the
exact re-ranked output EQUALS brute force, so the brute-force SQL oracle
attaches to the approximate operator — the same trick that made
`minhash_near_dup` hash-checkable (operators/dedup.py:101).

Run:  python tools/tune_ann.py [sf_dir]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from recommender_system_with_pyspark_spark.io import load_table
from recommender_system_with_pyspark_spark.operators import similarity as S


def recall(truth_rows, approx_df) -> float:
    approx = {(r["query_id"], r["neighbor_id"]) for r in approx_df.collect()}
    hits = sum(1 for t in truth_rows if t in approx)
    return hits / len(truth_rows)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("tune-ann")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    k = 5

    exact = S.cosine_topk(queries, emb, "vec_id", "embedding", k=k)
    truth = [(r["query_id"], r["neighbor_id"]) for r in exact.collect()]
    print(f"truth pairs: {len(truth)}")

    print("--- LSH (bucket_length, num_hash_tables) ---")
    for bl in (0.5, 1.0, 2.0):
        for nht in (4, 8, 12):
            approx = S.lsh_topk(queries, emb, "vec_id", "embedding", k=k,
                                bucket_length=bl, num_hash_tables=nht)
            print(f"bl={bl} nht={nht} recall={recall(truth, approx):.4f}")

    print("--- IVF (n_cells, n_probe) ---")
    for nc in (8, 4):
        for np_ in (2, 3, 4, 6):
            if np_ > nc:
                continue
            approx = S.ivf_topk(queries, emb, "vec_id", "embedding", k=k,
                                n_cells=nc, n_probe=np_)
            print(f"nc={nc} np={np_} recall={recall(truth, approx):.4f}")

    spark.stop()


if __name__ == "__main__":
    main()
