"""Reference-scale E3/FMRegressor wall-clock measurement.

Mirrors `PySpark Scripts/logreg.py:19-40` + `bgrfunctions.py:204-236`
(fmreg_prediction): StringIndexer(Username) → OneHotEncoder(UserId, BGGId)
→ assemble → FMRegressor TVS grid stepSize {0.1,0.01} × factorSize {1,2}
on the calibrated synthetic corpus. Published anchor
(`risultati.txt:31-33`): rmse 1.3834 / r2 0.2854, **121.99 min**.

Metric parity is NOT claimed here — FM's gradient-descent metrics are
corpus-shape-dependent in a way ALS's closed-form solves are not (see
REFSCALE.md for the calibrated ALS parity). This measures THROUGHPUT of
the identical pipeline shape (one-hot dims ≈ users+items, same grid, same
trainRatio/seed discipline) at a chosen fraction of the 18.9M-row scale.

Usage: python tools/fm_reference_scale.py [--scale 0.25]
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
    ap.add_argument("--scale", type=float, default=0.25)
    args = ap.parse_args()

    from pyspark.ml import Pipeline
    from pyspark.ml.feature import OneHotEncoder, StringIndexer, VectorAssembler
    from pyspark.sql import functions as F

    from recommender_system_with_pyspark_spark.domain import golden
    from recommender_system_with_pyspark_spark.ml.models import fm_regressor
    from recommender_system_with_pyspark_spark.session import get_spark

    n = int(golden.REF_N_RATINGS * args.scale)
    n_users = max(1000, int(golden.REF_N_USERS * args.scale))
    n_items = max(200, int(golden.REF_N_ITEMS * args.scale))
    head_items = max(100, int(golden.REF_HEAD_ITEMS * args.scale))

    spark = get_spark(app_name="fm-reference-scale",
                      extra_conf={"spark.driver.memory": "48g"})
    t0 = time.time()
    ratings, _games = golden.synthetic_bgg_corpus(
        spark, n_ratings=n, n_users=n_users, n_items=n_items, head_items=head_items
    )
    # logreg.py:20-25 — index usernames, one-hot both ids
    pipe = Pipeline(stages=[
        StringIndexer(inputCol="Username", outputCol="UserId"),
        OneHotEncoder(inputCols=["UserId", "BGGId"], outputCols=["UserId_onehot", "BGGId_onehot"]),
        VectorAssembler(inputCols=["UserId_onehot", "BGGId_onehot"], outputCol="features"),
    ])
    feats = pipe.fit(ratings).transform(ratings).select(
        "features", F.col("Rating").alias("label")
    ).cache()
    rows = feats.count()
    t_prep = time.time() - t0

    t1 = time.time()
    res = fm_regressor(feats, "features", "label")
    t_fit = time.time() - t1

    out = {
        "metric": "fm_reference_scale",
        "scale": args.scale,
        "rows": rows,
        "onehot_dim": n_users + n_items,
        "rmse": round(res.metrics["rmse"], 4),
        "r2": round(res.metrics["r2"], 4),
        "best_params": {
            "stepSize": res.model.getOrDefault("stepSize"),
            "factorSize": res.model.getOrDefault("factorSize"),
        },
        "prep_sec": round(t_prep, 1),
        "fit_sec": round(t_fit, 1),
        "total_min": round((time.time() - t0) / 60, 2),
        "reference_min_at_full_scale": 121.99,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
