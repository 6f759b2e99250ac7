"""Reference-scale ALS benchmark — VERDICT r1 tasks #2/#3.

Mirrors the reference's `als.py` end-to-end at the reference's raw scale
(~18.9M ratings, ~411k users, ~22k games; grid rank{20,30} x reg{0.1,0.01},
maxIter=20, seed=1, TVS trainRatio=0.8) on the calibrated synthetic corpus
(domain/golden.py) and measures wall-clock against the published anchor:

    Execution time: 49.75 min            (risultati.txt:175, full script)
    rmse 1.1024 / r2 0.4225              (risultati.txt:140-141)
    Best rank 20 / regParam 0.1 / maxIter 20

Usage:
    python tools/als_reference_scale.py [--ratings N] [--quick]

Writes a one-line JSON result and appends a markdown row to REFSCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ratings", type=int, default=None)
    ap.add_argument("--quick", action="store_true", help="1/10 scale smoke run")
    args = ap.parse_args()

    from recommender_system_with_pyspark_spark.domain import golden
    from recommender_system_with_pyspark_spark.domain.bgg import als_workflow
    from recommender_system_with_pyspark_spark.session import get_spark

    n = args.ratings or (1_890_000 if args.quick else golden.REF_N_RATINGS)
    scale = n / golden.REF_N_RATINGS
    n_users = max(1000, int(golden.REF_N_USERS * scale))
    n_items = max(200, int(golden.REF_N_ITEMS * scale))
    head_items = max(100, int(golden.REF_HEAD_ITEMS * scale))
    # prune thresholds shrink with scale so the kept fraction matches the
    # full-scale shape (thresholds are absolute counts in the reference)
    min_game = max(10, int(1000 * scale))
    min_user = max(2, int(10 * scale)) if scale < 1 else 10

    spark = get_spark(
        app_name="als-reference-scale",
        extra_conf={"spark.driver.memory": "48g"},
    )

    t0 = time.time()
    ratings, games = golden.synthetic_bgg_corpus(
        spark, n_ratings=n, n_users=n_users, n_items=n_items,
        head_items=head_items,
    )
    raw_rows = ratings.count()
    t_gen = time.time() - t0

    t1 = time.time()
    recs, res = als_workflow(
        ratings, games,
        min_game_ratings=min_game, min_user_ratings=min_user,
        k=10, tune=True,
        ranks=(20, 30), reg_params=(0.1, 0.01), max_iter=20, seed=1,
    )
    # metrics are computed inside als_workflow (fit + transform + evaluate
    # already executed); this timestamp bounds the model-selection phase
    t_fit = time.time() - t1

    t2 = time.time()
    rec_rows = recs.count()
    t_recs = time.time() - t2

    out = {
        "metric": "als_reference_scale",
        "raw_rows": raw_rows,
        "recommendation_rows": rec_rows,
        "rmse": round(res.metrics["rmse"], 4),
        "r2": round(res.metrics["r2"], 4),
        "best_params": res.best_params,
        "gen_sec": round(t_gen, 1),
        "tvs_fit_sec": round(t_fit, 1),
        "recommend_sec": round(t_recs, 1),
        "total_sec": round(time.time() - t0, 1),
        "total_min": round((time.time() - t0) / 60, 2),
        "reference_min": 49.75,
        "reference_rmse": 1.1024,
        "reference_r2": 0.4225,
        "scale": round(scale, 4),
    }
    print(json.dumps(out))
    if scale >= 0.99:
        with open("REFSCALE.md", "a") as f:
            f.write(
                f"\n| {raw_rows} | {out['rmse']} | {out['r2']} | "
                f"rank={out['best_params'].get('rank')} reg={out['best_params'].get('regParam')} | "
                f"{out['total_min']} min | 49.75 min |"
            )


if __name__ == "__main__":
    main()
