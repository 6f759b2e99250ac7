"""sf100 embedding census — VERDICT r9 #5 (second decade).

Same methodology as tools/sf10_census_09.py one decade up: the 3000-row
numpy sample estimator predicts the qualifying-pair count first (it was
within 0.2% at sf10), then the SAME operators the registry entries use
run to completion with block geometry scaled by the operators' own
100 TB sizing rule — block/cell count grows with n so per-task inputs
stay executor-sized:

- semantic_dedup_pairs: DEFAULT threshold 0.95 with n_cells=128 (2M rows
  keep ~16k rows/cell, inside the sf10 geometry's 12.5k-50k band) — the
  0.9 run on the REPLICATED tier is result-bound by generator artifact
  (2.45e9 predicted pairs, tools/sf100_census_bound_check.log), so the
  completing census threshold is 0.95; pass 0.9 explicitly to reproduce
  the bound check. Triangle-inequality cell-pair pruning is what makes
  the census sub-quadratic — the pruned fraction is the measurement.
- embedding_near_dup_blocked: n_chunks=48 (~42k rows/chunk) — this one
  IS the brute O(n^2) ground truth (1,176 block GEMMs, ~2e12 dot
  products); run it only with --brute to cross-check the pair count.

Usage: python tools/sf100_census_09.py [sf_dir] [threshold=0.95] [n_cells=128] [n_chunks=48] [--brute] [--no-semantic]
Prints one JSON line per measurement and a summary tail.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAMPLE_N = 3000
SEED = 7


def sample_estimate(spark, sf_dir: str, threshold: float) -> dict:
    import numpy as np

    from recommender_system_with_pyspark_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_total = emb.count()
    frac = min(1.0, (SAMPLE_N * 1.3) / n_total)
    rows = emb.sample(fraction=frac, seed=SEED).limit(SAMPLE_N).collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    n = len(rows)
    iu = np.triu_indices(n, k=1)
    q = int((sims[iu] >= threshold).sum())
    density = q / (n * (n - 1) / 2)
    predicted = density * (n_total * (n_total - 1) / 2)
    return {"n_total": n_total, "sample_n": n, "sample_pairs": q,
            "predicted_pairs": int(predicted)}


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/repo/.scale/sf100"
    brute = "--brute" in sys.argv
    # --no-semantic: on DECORRELATED tiers the cell-pruned census cannot
    # prune (random rotations spread copies across the sphere, cell radii
    # approach the diameter, the bound keeps ~all 128²/2 cell pairs and the
    # cogroup replication of 2M members × ~128 paired cells is a ~77 GB
    # shuffle — measured disk-stop, tools/census_sf100fresh_r11.log); the
    # block-matrix brute path replicates members only n_chunks+1 times and
    # completes. Unclusterable data routes to --brute or LSH.
    semantic = "--no-semantic" not in sys.argv
    threshold = float(args[1]) if len(args) > 1 else 0.95
    n_cells = int(args[2]) if len(args) > 2 else 128
    # brute block count: the cogroup replicates each member ~n_chunks times
    # PER SIDE, so shuffle bytes scale with it (48 → ~41 GB at 2M rows,
    # measured; 16 → ~1/3 of that) while the strip-tiled scorer keeps
    # per-task memory bounded at any block size — on a single node pick the
    # smallest count whose shuffle fits local disk
    n_chunks = int(args[3]) if len(args) > 3 else 48

    from recommender_system_with_pyspark_spark.io import load_table
    from recommender_system_with_pyspark_spark.operators import similarity as S
    from recommender_system_with_pyspark_spark.session import get_spark

    spark = get_spark(app_name="sf100_census_09", shuffle_partitions=128)

    est = sample_estimate(spark, sf_dir, threshold)
    print(json.dumps({"estimator": est}), flush=True)

    jobs = []
    if semantic:
        jobs.append((f"semantic_dedup@{threshold}", lambda df: S.semantic_dedup_pairs(
            df, "vec_id", "embedding", threshold=threshold, n_cells=n_cells, seed=1)))
    if brute:
        jobs.append((f"embedding_near_dup@{threshold}", lambda df: S.embedding_near_dup_blocked(
            df, "vec_id", "embedding", threshold=threshold, n_chunks=n_chunks)))

    results = {}
    for name, build in jobs:
        emb = load_table(spark, sf_dir, "embeddings")
        t0 = time.time()
        pairs = build(emb).count()
        sec = round(time.time() - t0, 1)
        results[name] = {"pairs": pairs, "sec": sec}
        print(json.dumps({name: results[name]}), flush=True)

    counts = {k: v["pairs"] for k, v in results.items()}
    agree = len(set(counts.values())) == 1
    ratio = (next(iter(counts.values())) / est["predicted_pairs"]
             if est["predicted_pairs"] else None)
    print(json.dumps({
        "sf_dir": sf_dir, "threshold": threshold, "n_cells": n_cells, "results": results,
        "operators_agree": agree if len(counts) > 1 else None,
        "measured_vs_predicted": round(ratio, 3) if ratio is not None else None,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
