"""Recall-targeted indexed mining at sf100 — VERDICT r11 #2's closing
measurement. The r11 recall report (0.56 @ 2/8 probes, 0.78 @ 4/8 at
sf0.01) was honest but left the n_probe choice to guesswork; round 12's
``select_n_probe`` samples the full recall-vs-n_probe curve from ONE
exact probe run on a held-out anchor sample and picks the smallest
n_probe meeting the caller's recall target (flagging a too-coarse index).

This run does it at deployment scale against the 2M-vector sf100 catalog
and the 64-cell physical index:

1. build (or reuse) the index — the amortized fit-once cost;
2. ``select_n_probe(target=0.9)`` on 1000 held-out anchors — prints the
   curve, the chosen operating point, the coarse flag, and the wall
   clock of the whole tuning pass (≈ one exact probe + driver matmul);
3. VALIDATE the dial: mine a DISJOINT 1000-anchor batch at the chosen
   n_probe and measure its true recall vs brute force — the curve is a
   sample estimate, so the held-out recall should land near the target
   (sampling noise, not bias);
4. price the operating point: wall clock + probed-cell count of the
   chosen-n_probe probe vs the n_probe=n_cells exact probe.

Usage: python tools/select_nprobe_sf100_r12.py [sf_dir] [index_dir] [--reuse]
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
    read_ivf_centers,
    select_n_probe,
    write_ivf_index,
)

args = [a for a in sys.argv[1:] if not a.startswith("--")]
sf_dir = args[0] if args else "/root/repo/.scale/sf100"
idx_dir = args[1] if len(args) > 1 else "/tmp/ivf_sf100_r12"
reuse = "--reuse" in sys.argv
N_CELLS = 64
K = 10


def loadavg():
    import os
    return round(os.getloadavg()[0], 1)


emb = load_table(spark, sf_dir, "embeddings").localCheckpoint()
n = emb.count()
print(f"catalog: {n} vectors at {sf_dir} (loadavg {loadavg()})", flush=True)

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

stride = n // 1000
tune = emb.filter(F.pmod(F.col("vec_id"), F.lit(stride)) == 0).localCheckpoint()
held = emb.filter(F.pmod(F.col("vec_id"), F.lit(stride)) == 1).localCheckpoint()
print(f"anchors: tune {tune.count()}, held-out {held.count()}", flush=True)

# warm discard: cold-session JVM/Arrow/page-cache spin-up is not tuning cost
hard_negatives_indexed(spark, idx_dir, tune.limit(50), centers=centers,
                       k=K, n_probe=2).write.mode("overwrite").format("noop").save()

t0 = time.time()
sel = select_n_probe(spark, idx_dir, tune, target_recall=0.9,
                     centers=centers, k=K)
t_sel = round(time.time() - t0, 1)
print(json.dumps({"select_n_probe_sec": t_sel, "loadavg": loadavg(),
                  **{k: v for k, v in sel.items() if k != "curve"}}), flush=True)
print(json.dumps({"curve": sel["curve"]}), flush=True)

# validate on the disjoint batch: measured recall at the chosen n_probe
t0 = time.time()
mined = hard_negatives_indexed(spark, idx_dir, held, centers=centers,
                               k=K, n_probe=sel["n_probe"])
mined_set = {(r.query_id, r.neighbor_id) for r in mined.collect()}
t_probe = round(time.time() - t0, 1)
t0 = time.time()
exact = hard_negatives_indexed(spark, idx_dir, held, centers=centers,
                               k=K, n_probe=N_CELLS)
truth = {(r.query_id, r.neighbor_id) for r in exact.collect()}
t_exact = round(time.time() - t0, 1)
print(json.dumps({
    "held_out_recall": round(len(truth & mined_set) / len(truth), 4),
    "target": sel["target"], "n_probe": sel["n_probe"],
    "probe_sec": t_probe, "exact_probe_sec": t_exact,
    "loadavg": loadavg(),
}), flush=True)
