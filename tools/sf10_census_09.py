"""sf10 embedding census at threshold 0.9 — VERDICT r7 #4.

Round 7 showed the 0.4-threshold exact censuses are RESULT-bound at sf10
(sample-estimated ≈1.74e9 qualifying pairs; runs correctly stopped). This
completes the decade table with a finishable measurement at threshold 0.9
(estimator prediction ≈2.2M pairs): the SAME operators the registry
entries use, threshold raised to 0.9 and block geometry scaled with the
data (n_chunks=16 / n_cells=16 — the operators' own 100 TB sizing rule:
block count grows with n so per-task inputs stay executor-sized; the
sf0.01/sf0.1 registry geometries at sf10 left 50k-row blocks whose
untiled similarity buffer OOM-killed Python workers, now ALSO fixed
generally by strip-tiling inside _block_pair_scorer), run to completion,
measured wall-clock + exact pair count, checked against the estimator.

Usage: python tools/sf10_census_09.py [sf_dir]   (default .scale/sf10)
Prints one JSON line per measurement and a summary tail.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

THRESHOLD = 0.9
SAMPLE_N = 3000
SEED = 7


def sample_estimate(spark, sf_dir: str) -> dict:
    """3000-row numpy exact all-pairs estimator (same construction that
    reproduced sf1's measured 0.4-census within 0.5%, SCALING.md r7):
    qualifying-pair density on the sample, scaled by (N choose 2)."""
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
    q = int((sims[iu] >= THRESHOLD).sum())
    density = q / (n * (n - 1) / 2)
    predicted = density * (n_total * (n_total - 1) / 2)
    return {"n_total": n_total, "sample_n": n, "sample_pairs": q,
            "predicted_pairs": int(predicted)}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10"

    from recommender_system_with_pyspark_spark.io import load_table
    from recommender_system_with_pyspark_spark.operators import similarity as S
    from recommender_system_with_pyspark_spark.session import get_spark

    spark = get_spark(app_name="sf10_census_09", shuffle_partitions=64)

    est = sample_estimate(spark, sf_dir)
    print(json.dumps({"estimator": est}), flush=True)

    results = {}
    for name, build in (
        ("embedding_near_dup@0.9", lambda df: S.embedding_near_dup_blocked(
            df, "vec_id", "embedding", threshold=THRESHOLD, n_chunks=16)),
        ("semantic_dedup@0.9", lambda df: S.semantic_dedup_pairs(
            df, "vec_id", "embedding", threshold=THRESHOLD, n_cells=16, seed=1)),
    ):
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
        "sf_dir": sf_dir, "threshold": THRESHOLD, "results": results,
        "operators_agree": agree,
        "measured_vs_predicted": round(ratio, 3) if ratio else None,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
