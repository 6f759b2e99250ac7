"""Prebuilt-index hard-negative mining at sf100 — VERDICT r10 #1's
closing measurement. Round-10 numbers on the same 2M-vector catalog:
`hard_negatives_blas` (GEMM catalog scan) 29.2 s for 1000 anchors;
`hard_negatives_ann` END-TO-END (k-means fit inside the call) 1068.1 s,
index-build dominated. The fit-once/probe-many split this round makes
code (`write_ivf_index(extra_cols=...)` + `hard_negatives_indexed`)
should put a PROBE at a small multiple of the GEMM scan:

1. build the labeled IVF index once (timed — the amortized cost);
2. mine 1000 and 8000 anchors as pure probes (timed — the per-call cost),
   at production-ish geometry (n_cells=64, n_probe=8: ~1/8 of the catalog
   read per anchor batch, partition-pruned file reads);
3. re-probe 1000 anchors at n_probe=16 for the recall-vs-scan trade.

Usage: python tools/hn_indexed_sf100_r11.py [sf_dir] [index_dir]
"""

import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "128")
    .config("spark.driver.memory", "64g")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from recommender_system_with_pyspark_spark.io import load_table
from recommender_system_with_pyspark_spark.operators.similarity import (
    hard_negatives_indexed,
    write_ivf_index,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf100"
idx_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ivf_sf100_r11"
N_CELLS = 64

emb = load_table(spark, sf_dir, "embeddings").localCheckpoint()
n = emb.count()
print(f"catalog: {n} vectors at {sf_dir}", flush=True)

shutil.rmtree(idx_dir, ignore_errors=True)
t0 = time.time()
centers = write_ivf_index(
    emb, idx_dir, "vec_id", "embedding", n_cells=N_CELLS, seed=1,
    extra_cols=("label",), max_iter=3,  # coarse cells: balanced, not converged
)
t_build = round(time.time() - t0, 1)
print(json.dumps({"index_build_sec": t_build, "n_cells": N_CELLS}), flush=True)

for nq, n_probe in ((1000, 8), (8000, 8), (1000, 16)):
    q = emb.filter(F.pmod(F.col("vec_id"), F.lit(n // nq)) == 0).localCheckpoint()
    cnt = q.count()
    t0 = time.time()
    (hard_negatives_indexed(spark, idx_dir, q, centers=centers, k=10, n_probe=n_probe)
        .write.mode("overwrite").format("noop").save())
    sec = round(time.time() - t0, 1)
    print(json.dumps({"probe_anchors": cnt, "n_probe": n_probe,
                      "probe_sec": sec}), flush=True)
print("ALL OK", flush=True)
