"""Invariant tests for the round-4 corpus/analytics operators
(operators/drift.py, the weighted/budget samplers, co-occurrence, IDF
keywords, unigram LM). The DuckDB hash checks live in
test_oracle_queries.py; these pin the semantic properties an oracle
re-run can't express (reproducibility under repartition, probability
bounds, symmetry)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from recommender_system_with_pyspark_spark.io import load_table
from recommender_system_with_pyspark_spark.operators import drift as DR
from recommender_system_with_pyspark_spark.operators import relational as R
from recommender_system_with_pyspark_spark.operators import sampling as SA
from recommender_system_with_pyspark_spark.operators import text as X


def test_psi_identical_cohorts_is_near_zero(spark):
    """Same distribution on both sides ⇒ PSI ≈ 0 (exactly 0 when the
    cohorts are equal-sized and bucket-identical)."""
    rows = [(i, "a", float(i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    both = df.withColumn("cohort", F.when(F.col("id") % 2 == 0, "p").otherwise("q"))
    # id%2 splits each v-value evenly except rounding; PSI must be tiny
    out = DR.population_stability(both, "v", "cohort", "p", "q", "grp").collect()
    assert len(out) == 1
    assert abs(out[0]["psi"]) < 0.01


def test_psi_disjoint_cohorts_is_large(spark):
    rows = [(i, "a", 0.0 if i < 100 else 100.0, "p" if i < 100 else "q")
            for i in range(200)]
    df = spark.createDataFrame(rows, "id long, grp string, v double, cohort string")
    out = DR.population_stability(df, "v", "cohort", "p", "q", "grp").collect()
    assert out[0]["psi"] > 1.0


def test_psi_range_ignores_rows_outside_cohorts(spark):
    """An extreme value in a third cohort must not stretch the buckets:
    PSI with and without the stray row is identical (ADVICE r4)."""
    rows = [(i, "a", float(i % 7), "p" if i % 2 == 0 else "q") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, grp string, v double, cohort string")
    stray = spark.createDataFrame(
        [(999, "a", 1e12, "neither")], "id long, grp string, v double, cohort string"
    )
    clean = DR.population_stability(df, "v", "cohort", "p", "q", "grp").collect()
    dirty = DR.population_stability(df.unionByName(stray), "v", "cohort", "p", "q", "grp").collect()
    assert clean[0]["psi"] == dirty[0]["psi"]


def test_psi_constant_column_is_finite_zero(spark):
    """vmax == vmin (zero bucket width) puts every row in bucket 0 —
    identical one-bucket distributions ⇒ PSI exactly 0, not null/NaN."""
    rows = [(i, "a", 5.0, "p" if i % 2 == 0 else "q") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, grp string, v double, cohort string")
    out = DR.population_stability(df, "v", "cohort", "p", "q", "grp").collect()
    assert out[0]["psi"] == 0.0


def test_weighted_sample_drops_nonpositive_weights(spark):
    """A-ES is undefined for w <= 0; such rows (and null weights) must be
    excluded, not allowed to sort first with negative scores (ADVICE r4)."""
    rows = [(i, float(i % 5) + 1.0) for i in range(50)]
    rows += [(100, -5.0), (101, 0.0), (102, None)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = {r["id"] for r in SA.weighted_sample_topk(df, "id", "w", k=10, seed=3).collect()}
    assert got.isdisjoint({100, 101, 102})
    assert len(got) == 10


def test_weighted_sample_deterministic_under_repartition(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").select("doc_id", "n_chars")
    a = SA.weighted_sample_topk(docs, "doc_id", "n_chars", k=15, seed=0)
    b = SA.weighted_sample_topk(docs.repartition(13), "doc_id", "n_chars", k=15, seed=0)
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )


def test_weighted_sample_prefers_heavy_rows(spark):
    """With weight ratios of 1000:1 the heavy rows should dominate the
    sample (A-ES inclusion probability ∝ weight)."""
    rows = [(i, 1000.0 if i < 50 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = SA.weighted_sample_topk(df, "id", "w", k=20, seed=7).collect()
    heavy = sum(1 for r in got if r["id"] < 50)
    assert heavy >= 15  # overwhelmingly the heavy rows


def test_token_budget_select_prefix_and_budget(spark):
    rows = [("en", i, 10.0 - i, 30) for i in range(10)]  # quality desc = id asc
    df = spark.createDataFrame(rows, "lang string, doc_id long, q double, n_tokens int")
    kept = SA.token_budget_select(df, "lang", "q", "doc_id", "n_tokens", budget=100)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [0, 1, 2]  # 3 × 30 = 90 <= 100; 4th would be 120
    assert kept.agg(F.sum("n_tokens")).first()[0] <= 100


def test_cooccurrence_symmetric_and_ranked(spark):
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"), (3, "a"), (3, "b")]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = R.cooccurrence_topk(df, "basket", "item", k=2).collect()
    by_item = {(r["item"], r["other"]): r for r in out}
    # a-b co-occur 3×, a-c and b-c 1×
    assert by_item[("a", "b")]["n_baskets"] == 3
    assert by_item[("b", "a")]["n_baskets"] == 3  # symmetric
    assert by_item[("a", "b")]["rank"] == 1
    ranks = [r["rank"] for r in out if r["item"] == "a"]
    assert sorted(ranks) == [1, 2]


def test_key_skew_audit_flags_hot_key(spark):
    rows = [(1,)] * 80 + [(k,) for k in range(2, 22)]
    df = spark.createDataFrame(rows, "k long")
    out = R.key_skew_audit(df, "k", top=5, skew_factor=4.0).collect()
    assert out[0]["key"] == 1 and out[0]["skewed"] is True
    assert all(r["skewed"] is False for r in out[1:])
    assert abs(out[0]["share"] - 0.8) < 1e-6


def test_idf_keywords_rarest_first(spark):
    rows = [(1, "x common common"), (2, "y common"), (3, "z common")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = X.idf_keywords(df, "text", "doc_id", k=2).collect()
    top = {r["doc_id"]: r["token"] for r in out if r["rank"] == 1}
    assert top == {1: "x", 2: "y", 3: "z"}  # df=1 beats df=3


def test_unigram_logprob_bounds(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    out = X.unigram_logprob(docs, "text", "doc_id")
    rows = out.collect()
    assert len(rows) == docs.count()
    assert all(r["avg_logprob"] < 0 for r in rows)
    # mean logprob can't beat the entropy floor of a 1-token corpus: > ln(1/N)
    n_total = docs.select(F.sum(F.size(X.tokens("text")))).first()[0]
    floor = math.log(1.0 / n_total)
    assert all(r["avg_logprob"] > floor for r in rows)


def test_bigram_logprob_penalizes_shuffled_text(spark):
    """Word order must matter: a corpus of one repeated fluent sentence
    scores its in-order doc higher than a token-shuffled twin (same
    unigram profile)."""
    fluent = "the cat sat on the mat " * 5
    shuffled = "mat the on sat the cat " * 5
    corpus = [(i, fluent) for i in range(20)] + [(100, fluent), (101, shuffled)]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r["doc_id"]: r["avg_bigram_logprob"]
           for r in X.bigram_logprob(df, "text", "doc_id").collect()}
    assert got[100] > got[101]


def test_inverted_index_postings_sorted_and_complete(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    idx = X.inverted_index(docs, "text", "doc_id", top_tokens=10)
    rows = idx.collect()
    assert len(rows) == 10
    for r in rows:
        assert r["df"] == len(r["postings"])
        assert r["postings"] == sorted(r["postings"])
        assert len(set(r["postings"])) == len(r["postings"])  # distinct docs


def test_bm25_tf_monotone_and_missing_terms(spark):
    from recommender_system_with_pyspark_spark.operators.text import bm25_rank

    docs = spark.createDataFrame(
        [
            (1, "cat cat cat dog mouse"),
            (2, "cat dog bird fish tree"),
            (3, "bird fish tree rock sand"),   # no query terms at all
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["score"] for r in bm25_rank(docs, ["cat"], k=10).collect()}
    assert 3 not in out                       # zero-match docs don't appear
    assert out[1] > out[2] > 0                # higher tf, same dl -> higher score


def test_bm25_length_normalization(spark):
    from recommender_system_with_pyspark_spark.operators.text import bm25_rank

    docs = spark.createDataFrame(
        [(1, "cat " * 1 + "x " * 3), (2, "cat " + "x " * 30)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["score"] for r in bm25_rank(docs, ["cat"], k=10).collect()}
    assert out[1] > out[2]                    # same tf, longer doc scores lower


def test_crossdoc_ngram_overlap_flags_shared_not_internal(spark):
    from recommender_system_with_pyspark_spark.operators.text import crossdoc_ngram_overlap

    shared = "a b c d e f g h"               # exactly one 8-gram
    docs = spark.createDataFrame(
        [
            (1, shared + " unique1 tail1 tail2"),
            (2, "lead1 lead2 " + shared),      # shares the 8-gram with doc 1
            (3, "p q r s t u v w " + "p q r s t u v w"),  # internal repeat only
            (4, "too short"),                  # < 8 tokens
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in crossdoc_ngram_overlap(docs, n=8).collect()}
    assert out[1]["dup_grams"] >= 1 and out[2]["dup_grams"] >= 1
    # doc 3's repeat is within ONE doc: distinct-doc count stays 1
    assert out[3]["dup_grams"] == 0 and out[3]["n_grams"] == 9
    assert out[4]["n_grams"] == 0 and out[4]["dup_ratio"] == 0.0


def test_psi_out_of_cohort_rows_do_not_stretch_buckets(spark):
    """ADVICE r4: the bucket range must come from the two compared cohorts
    ONLY. An extreme outlier in a third cohort once stretched [min,max] so
    far that both real cohorts collapsed into bucket 1 and PSI read ~0 for
    clearly shifted distributions."""
    rows = [(i, "a", float(i % 10), "p") for i in range(100)]
    rows += [(1000 + i, "a", float(i % 10) + 5.0, "q") for i in range(100)]
    shifted = spark.createDataFrame(rows, "id long, grp string, v double, cohort string")
    want = DR.population_stability(shifted, "v", "cohort", "p", "q", "grp").collect()[0]["psi"]
    # same data plus one gigantic out-of-cohort value
    noisy = shifted.unionByName(
        spark.createDataFrame([(9999, "a", 1.0e12, "zz")],
                              "id long, grp string, v double, cohort string"))
    got = DR.population_stability(noisy, "v", "cohort", "p", "q", "grp").collect()[0]["psi"]
    assert got == want  # third-cohort row is invisible to the buckets
    assert want > 0.5   # and the shift itself is clearly detected
