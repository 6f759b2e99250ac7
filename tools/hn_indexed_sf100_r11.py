"""Prebuilt-index hard-negative mining at sf100 — VERDICT r10 #1's
closing measurement. Round-10 numbers on the same 2M-vector catalog:
`hard_negatives_blas` (GEMM catalog scan) 29.2 s for 1000 anchors;
`hard_negatives_ann` END-TO-END (k-means fit inside the call) 1068.1 s,
index-build dominated. The fit-once/probe-many split (`write_ivf_index`
+ `hard_negatives_indexed`) is measured here with the comparisons that
matter, ALL IN ONE SESSION after one discarded warmup probe (the first
probe of a cold session pays JVM/Arrow/Python-worker spin-up and the OS
page-cache fill of the index — a production probe server holds both
warm):

1. index build, timed once (the amortized cost; max_iter=3 — coarse
   cells need balance, not convergence);
2. same-session `hard_negatives_blas` full-catalog scan (the r10
   scale-default baseline);
3. probes: 1000 and 8000 RANDOM anchors (their probed-cell union covers
   ~all cells — the adversarial case where pruning cannot help and the
   probe must still match the full scan), and 1000 LOCALIZED anchors
   drawn from one cell's residents (the production case: the union stays
   small and pruned cells are unread files) — probed-cell counts printed
   per run;
4. a probe at n_probe=16 for the recall-vs-scan trade.

Usage: python tools/hn_indexed_sf100_r11.py [sf_dir] [index_dir] [--reuse]
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
    hard_negatives_blas,
    hard_negatives_indexed,
    read_ivf_centers,
    write_ivf_index,
)

args = [a for a in sys.argv[1:] if not a.startswith("--")]
sf_dir = args[0] if args else "/root/repo/.scale/sf100"
idx_dir = args[1] if len(args) > 1 else "/tmp/ivf_sf100_r11"
reuse = "--reuse" in sys.argv
N_CELLS = 64

emb = load_table(spark, sf_dir, "embeddings").localCheckpoint()
n = emb.count()
print(f"catalog: {n} vectors at {sf_dir}", flush=True)

if reuse:
    centers = read_ivf_centers(spark, idx_dir)
    print(json.dumps({"index": "reused", "n_cells": len(centers)}), flush=True)
else:
    shutil.rmtree(idx_dir, ignore_errors=True)
    t0 = time.time()
    centers = write_ivf_index(
        emb, idx_dir, "vec_id", "embedding", n_cells=N_CELLS, seed=1,
        extra_cols=("label",), max_iter=3,
    )
    print(json.dumps({"index_build_sec": round(time.time() - t0, 1),
                      "n_cells": N_CELLS}), flush=True)


def anchors_random(nq):
    return emb.filter(F.pmod(F.col("vec_id"), F.lit(n // nq)) == 0).localCheckpoint()


def anchors_localized(nq):
    # residents of one index cell: the production shape (a labeled slice /
    # one domain's anchors cluster together)
    ids = spark.read.parquet(idx_dir).filter(F.col("cell") == 0).select(
        F.col("neighbor_id").alias("vec_id")).limit(nq)
    return emb.join(ids, "vec_id").localCheckpoint()


def probe(tag, q, n_probe):
    cnt = q.count()
    t0 = time.time()
    (hard_negatives_indexed(spark, idx_dir, q, centers=centers, k=10, n_probe=n_probe)
        .write.mode("overwrite").format("noop").save())
    sec = round(time.time() - t0, 1)
    # recompute the probed-cell union the operator used (driver-side math)
    import numpy as np
    qp = q.select("vec_id", "embedding").toPandas()
    qm = np.stack(qp["embedding"].to_numpy()).astype("float64")
    qm /= np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-30)
    cm = np.array(centers); cm /= np.maximum(np.linalg.norm(cm, axis=1, keepdims=True), 1e-30)
    order = np.argsort(-(qm @ cm.T), axis=1, kind="stable")[:, :n_probe]
    print(json.dumps({"probe": tag, "anchors": cnt, "n_probe": n_probe,
                      "cells_probed": len(set(order.ravel().tolist())),
                      "sec": sec}), flush=True)


# discarded warmup (JVM/Arrow/python-worker spin-up + index page cache)
probe("warmup_discard", anchors_random(1000), 8)

q1k = anchors_random(1000)
t0 = time.time()
hard_negatives_blas(q1k, emb, k=10).write.mode("overwrite").format("noop").save()
print(json.dumps({"blas_full_scan": 1000, "sec": round(time.time() - t0, 1)}), flush=True)

probe("random_1k", q1k, 8)
probe("random_8k", anchors_random(8000), 8)
probe("random_1k_probe16", q1k, 16)
probe("localized_1k", anchors_localized(1000), 8)
print("ALL OK", flush=True)
