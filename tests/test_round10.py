"""Round-10 tests: hard-negative mining scale paths (VERDICT r9 #1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _emb(spark, sf_small):
    from recommender_system_with_pyspark_spark.io import load_table

    return load_table(spark, sf_small, "embeddings")


def test_hard_negatives_guard_raises(spark, sf_small):
    """An oversized query frame must raise (pointing at the ANN path),
    never broadcast — the repo's no-unbounded-broadcast policy."""
    from recommender_system_with_pyspark_spark.operators.similarity import hard_negatives

    emb = _emb(spark, sf_small)
    with pytest.raises(ValueError, match="hard_negatives_ann"):
        hard_negatives(emb.limit(8), emb, k=3, max_broadcast_rows=4)


def test_hard_negatives_ivf_equals_brute_force(spark, sf_small):
    """The IVF-pruned exact path is bit-identical to brute force — cell
    pruning + the label-aware radius bound change nothing."""
    from recommender_system_with_pyspark_spark.operators.similarity import (
        hard_negatives,
        hard_negatives_ivf,
    )

    emb = _emb(spark, sf_small)
    q = emb.filter(F.col("vec_id") < 12)
    brute = hard_negatives(q, emb, k=4).collect()
    ivf = hard_negatives_ivf(q, emb, k=4, n_cells=8, n_probe=2).collect()
    assert sorted(map(tuple, brute)) == sorted(map(tuple, ivf))


def test_hard_negatives_ann_contract(spark, sf_small):
    """Over-fetch path honors the output contract: dense ranks 1..k per
    query, never a self pair, never a same-label pair (null-safe)."""
    from recommender_system_with_pyspark_spark.operators.similarity import hard_negatives_ann

    emb = _emb(spark, sf_small)
    q = emb.filter(F.col("vec_id") < 8)
    out = hard_negatives_ann(q, emb, k=3, overfetch=4, method="lsh")
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    rows = out.collect()
    assert rows, "over-fetch path returned nothing"
    by_q: dict[int, list[int]] = {}
    for r in rows:
        assert r["query_id"] != r["neighbor_id"]
        assert labels[r["query_id"]] != labels[r["neighbor_id"]]
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3


def test_hard_negatives_ann_rejects_bad_method(spark, sf_small):
    from recommender_system_with_pyspark_spark.operators.similarity import hard_negatives_ann

    emb = _emb(spark, sf_small)
    with pytest.raises(ValueError, match="method"):
        hard_negatives_ann(emb.limit(2), emb, method="faiss")
