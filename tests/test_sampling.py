"""Deterministic sampling / splitting / PII scrubbing operators."""

from __future__ import annotations

import pyspark.sql.functions as F

from recommender_system_with_pyspark_spark.operators import sampling as SA
from recommender_system_with_pyspark_spark.operators.text import scrub_pii


def _ids(spark, n=10_000):
    return spark.range(n).withColumnRenamed("id", "key")


def test_hash_sample_is_partitioning_invariant(spark):
    df2 = _ids(spark).repartition(2)
    df13 = _ids(spark).repartition(13)
    a = sorted(r["key"] for r in SA.hash_sample(df2, "key", 0.2).collect())
    b = sorted(r["key"] for r in SA.hash_sample(df13, "key", 0.2).collect())
    assert a == b
    # fraction is honored within binomial tolerance
    assert 0.17 < len(a) / 10_000 < 0.23


def test_hash_sample_seeds_are_independent(spark):
    df = _ids(spark)
    a = {r["key"] for r in SA.hash_sample(df, "key", 0.2, seed=1).collect()}
    b = {r["key"] for r in SA.hash_sample(df, "key", 0.2, seed=2).collect()}
    # overlap ~ product of fractions, nowhere near identical
    overlap = len(a & b) / 10_000
    assert 0.02 < overlap < 0.07
    assert a != b


def test_stable_split_exhaustive_and_sized(spark):
    df = _ids(spark)
    out = SA.stable_split(df, "key", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 10_000  # exhaustive — no dropped rows
    assert 0.77 < counts["train"] / 10_000 < 0.83
    assert 0.08 < counts["val"] / 10_000 < 0.12
    # membership is disjoint by construction (single CASE expression)


def test_stable_split_rejects_bad_weights(spark):
    import pytest

    with pytest.raises(ValueError):
        SA.stable_split(_ids(spark), "key", {"a": 0.5, "b": 0.3})


def test_scrub_pii_redacts_in_order(spark):
    df = spark.createDataFrame(
        [(1, "mail me at a.b+c@site.org or see https://x.io/p?u=z@y.com now 12345678 ok"),
         (2, "clean text only"),
         (3, None)],
        "id int, text string",
    )
    out = {r["id"]: r for r in scrub_pii(df, "text", out_col="s").collect()}
    assert out[1]["s"] == "mail me at <EMAIL> or see <URL> now <NUM> ok"
    # the email inside the URL query string counts as URL, not email
    assert out[1]["s_n_urls"] == 1 and out[1]["s_n_emails"] == 1 and out[1]["s_n_digits"] == 1
    assert out[2]["s"] == "clean text only"
    assert out[2]["s_n_urls"] == 0
    assert out[3]["s"] is None


def test_stratified_hash_sample_rates(spark):
    df = spark.range(20_000).select(
        F.col("id").alias("key"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("stratum"),
    )
    out = SA.stratified_hash_sample(
        df, "key", "stratum", rates={"a": 1.0, "b": 0.25}, default_rate=0.0
    )
    counts = {r["stratum"]: r["n"] for r in
              out.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert counts["a"] == 10_000  # rate 1.0 keeps every row
    assert 0.21 < counts["b"] / 10_000 < 0.29


def test_stratified_hash_sample_default_rate_drops_unlisted(spark):
    df = spark.range(1000).select(F.col("id").alias("key"), F.lit("zz").alias("stratum"))
    assert SA.stratified_hash_sample(df, "key", "stratum", rates={"a": 1.0}).count() == 0


def test_pack_sequences_invariants(spark):
    from recommender_system_with_pyspark_spark.operators import packing as P

    docs = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(200)) + 1).cast("int").alias("n_tokens"),
    )
    packed = P.pack_sequences(docs, "doc_id", "n_tokens", budget=128, n_groups=8).cache()
    try:
        # every doc packed exactly once
        assert packed.count() == 3000
        assert packed.select("doc_id").distinct().count() == 3000
        # no window exceeds the budget unless it holds a single truncated doc
        over = (
            packed.groupBy("window_id")
            .agg(F.sum("n_tokens").alias("t"), F.count("*").alias("c"),
                 F.max(F.col("truncated").cast("int")).alias("tr"))
            .filter((F.col("t") > 128) & ~((F.col("c") == 1) & (F.col("tr") == 1)))
            .count()
        )
        assert over == 0
        # deterministic across partitionings
        repacked = P.pack_sequences(docs.repartition(13), "doc_id", "n_tokens",
                                    budget=128, n_groups=8)
        a = {(r["doc_id"], r["window_id"]) for r in packed.collect()}
        b = {(r["doc_id"], r["window_id"]) for r in repacked.collect()}
        assert a == b
        # FFD within groups stays near the global lower bound sum/budget
        n_windows = packed.select("window_id").distinct().count()
        floor = docs.select((F.ceil(F.sum("n_tokens") / 128)).cast("int")).first()[0]
        assert n_windows <= floor * 1.25 + 8
    finally:
        packed.unpersist()


def test_stratified_fixed_k_exact_and_stable(spark):
    from recommender_system_with_pyspark_spark.operators.sampling import stratified_fixed_k

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(100)], "id long, grp string")
    s1 = stratified_fixed_k(df, "grp", "id", k=10, seed=3)
    assert {r.grp: r.n for r in s1.groupBy("grp").count()
            .withColumnRenamed("count", "n").collect()} == {"a": 10, "b": 10}
    # same rows under a different partitioning
    s2 = stratified_fixed_k(df.repartition(7), "grp", "id", k=10, seed=3)
    assert sorted(r.id for r in s1.collect()) == sorted(r.id for r in s2.collect())
    # k larger than the stratum keeps everything
    tiny = spark.createDataFrame([(1, "x"), (2, "x")], "id long, grp string")
    assert stratified_fixed_k(tiny, "grp", "id", k=10).count() == 2


def test_chunk_documents_overlap_and_coverage(spark):
    from recommender_system_with_pyspark_spark.operators.packing import chunk_documents

    text = " ".join(f"t{i}" for i in range(100))  # 100 tokens
    df = spark.createDataFrame([(1, text), (2, "short doc")], "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=64, stride=32)
    chunks = {(r.doc_id, r.chunk_idx): r for r in out.collect()}
    # 100 tokens, chunk 64, stride 32 -> ceil((100-64)/32)+1 = 3 chunks
    assert sorted(i for d, i in chunks if d == 1) == [0, 1, 2]
    assert chunks[(1, 0)].n_tokens == 64
    assert chunks[(1, 2)].n_tokens == 100 - 2 * 32  # tail chunk
    # 50% overlap: second half of chunk 0 == first half of chunk 1
    c0, c1 = chunks[(1, 0)].chunk_text.split(), chunks[(1, 1)].chunk_text.split()
    assert c0[32:] == c1[:32]
    # short doc -> single whole-doc chunk
    assert chunks[(2, 0)].n_tokens == 2 and chunks[(2, 0)].chunk_text == "short doc"
    # every token covered
    assert set(text.split()) == {t for (d, _), r in chunks.items() if d == 1
                                 for t in r.chunk_text.split()}
