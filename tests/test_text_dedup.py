"""Unit tests for text analysis + dedup operators on planted fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from recommender_system_with_pyspark_spark.operators import dedup as D
from recommender_system_with_pyspark_spark.operators import text as X

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog", "a"),
    (2, "the quick brown fox jumps over the lazy cat", "a"),  # near-dup of 1
    (3, "completely different words here entirely unrelated", "a"),
    (4, "the quick brown fox jumps over the lazy dog", "a"),  # exact dup of 1
    (5, "der hund und die katze und der vogel ist da", "b"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    out = df.select(X.word_shingles("text", 3).alias("s")).first()["s"]
    assert out == ["a b c", "b c d"]


def test_token_stats_values(spark):
    df = spark.createDataFrame([(1, "Hello, world! xy")], "doc_id int, text string")
    row = X.add_token_stats(df).first()
    assert row["n_tokens"] == 3
    assert row["n_punct"] == 2  # comma + bang
    assert row["n_chars"] == 16


def test_quality_score_bounds(spark):
    out = X.add_quality_score(_docs(spark))
    vals = [r["quality"] for r in out.collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_language_id_profiles(spark):
    out = X.add_language_id(_docs(spark))
    got = {r["doc_id"]: r["lang_pred"] for r in out.collect()}
    assert got[1] == "en"
    assert got[5] == "de"


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello World"), (2, "hello, world!"), (3, "other")],
        "doc_id int, text string",
    )
    out = X.add_fingerprint(df)
    fps = {r["doc_id"]: r["fingerprint"] for r in out.collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_simhash_identical_and_near(spark):
    df = _docs(spark)
    sigs = X.add_simhash(df.select("doc_id", "text"), "text")
    got = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
    assert got[1] == got[4]  # identical text → identical signature
    near = df.sparkSession.createDataFrame(
        [(got[1], got[2]), (got[1], got[3])], "a long, b long"
    ).select(X.hamming64(F.col("a"), F.col("b")).alias("d")).collect()
    d_near, d_far = near[0]["d"], near[1]["d"]
    assert d_near < d_far  # near-dup closer than unrelated doc


def test_add_simhash_preserves_row_multiplicity(spark):
    # id-keyed aggregation: exact-duplicate rows stay distinct rows (the
    # former group-by-all-columns form collapsed them and shuffled raw text
    # as the group key)
    df = spark.createDataFrame(
        [(1, "same text here"), (2, "same text here"), (3, "other words entirely")],
        "doc_id int, text string",
    )
    out = X.add_simhash(df, "text")
    rows = out.collect()
    assert len(rows) == 3
    got = {r["doc_id"]: r["simhash"] for r in rows}
    assert got[1] == got[2]
    assert got[1] != got[3]


def test_dedup_exact_counts(spark):
    out = D.dedup_exact(_docs(spark), "text", "doc_id")
    rows = {r["keep_id"]: r["dupes"] for r in out.collect()}
    assert rows[1] == 2  # docs 1 and 4
    assert sum(rows.values()) == 5


def test_jaccard_pairs_finds_near_dup(spark):
    pairs = D.jaccard_pairs(_docs(spark), "text", "doc_id", block_col="lang", threshold=0.5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(1, 4)] == 1.0  # exact dup
    assert (1, 2) in got and 0.5 <= got[(1, 2)] < 1.0
    assert (1, 3) not in got
    assert all(a < b for a, b in got)


def test_minhash_near_dup_finds_planted_pair(spark):
    pairs = D.minhash_near_dup(_docs(spark), "text", "doc_id", threshold=0.3, shingle_n=2)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 4) in found
    assert (1, 2) in found or (2, 4) in found  # near-dup caught by LSH


def test_simhash_near_dup_blocking(spark):
    pairs = D.simhash_near_dup(_docs(spark), "text", "doc_id", max_hamming=3, bands=4)
    found = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert found.get((1, 4)) == 0  # exact dup always recalled at hamming 0


def test_jaccard_composite_blocking_bounds_blocks(spark, sf_small):
    """VERDICT r1 #10: (lang, length-bucket) composite blocking must keep
    every block far below the single-key (lang) block size, bounding the
    quadratic exact-verify cost, while still recalling same-bucket dups."""
    from recommender_system_with_pyspark_spark.io import load_table
    from recommender_system_with_pyspark_spark.operators.text import tokens

    docs = load_table(spark, sf_small, "documents")
    bucketed = docs.withColumn(
        "len_bucket", F.floor(F.size(F.array_distinct(tokens("text"))) / 4)
    )
    single = docs.groupBy("lang").count().agg(F.max("count")).first()[0]
    composite = (
        bucketed.groupBy("lang", "len_bucket").count().agg(F.max("count")).first()[0]
    )
    # worst composite block is a small fraction of the worst language block
    assert composite <= single / 2
    # and the composite-blocked pairs are a subset of the lang-blocked pairs
    fine = D.jaccard_pairs(bucketed, "text", "doc_id",
                           block_col=["lang", "len_bucket"], threshold=0.8)
    coarse = D.jaccard_pairs(docs, "text", "doc_id",
                             block_col="lang", threshold=0.8)
    fine_pairs = {(r["id_a"], r["id_b"]) for r in fine.collect()}
    coarse_pairs = {(r["id_a"], r["id_b"]) for r in coarse.collect()}
    assert fine_pairs <= coarse_pairs


def test_connected_components_transitive_chain(spark):
    """A-B, B-C, C-D must collapse into one component labeled by the min
    node; disjoint pair E-F stays separate; convergence beats diameter."""
    from recommender_system_with_pyspark_spark.operators.graph import (
        connected_components,
        dedup_clusters,
    )

    edges = spark.createDataFrame(
        [(2, 3), (3, 4), (4, 5), (10, 11)], "src long, dst long"
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert comp == {2: 2, 3: 2, 4: 2, 5: 2, 10: 10, 11: 10}

    clustered = dedup_clusters(edges.selectExpr("src as id_a", "dst as id_b"))
    rows = {r["doc_id"]: (r["cluster_id"], r["cluster_size"]) for r in clustered.collect()}
    assert rows[5] == (2, 4)
    assert rows[11] == (10, 2)


def test_fuzzy_pairs_blocked_recall(spark):
    from recommender_system_with_pyspark_spark.operators import dedup as D
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("red rod",), ("red rodd",), ("red bolt",), ("blue rod",), ("red rod",)],
        "name string",
    )
    pairs = {(r.val_a, r.val_b, r.distance)
             for r in D.fuzzy_pairs(df, "name", max_distance=2).collect()}
    # within-block near-dup found once (distinct first); cross-block pair
    # ("blue rod" vs "red rod", distance 3>2 anyway) excluded by blocking
    assert ("red rod", "red rodd", 1) in pairs
    assert all(a.split()[0] == b.split()[0] for a, b, _ in pairs)
    # duplicate input rows don't duplicate output pairs
    assert len([p for p in pairs if p[0] == "red rod" and p[1] == "red rodd"]) == 1


def test_contamination_flags_planted_overlap(spark):
    from recommender_system_with_pyspark_spark.operators.text import contamination_flags

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon eta theta"),   # shares a 5-gram
         (2, "one two three four five six seven")],          # disjoint
        "doc_id long, text string")
    got = {r.doc_id: (r.n_overlap, r.contaminated)
           for r in contamination_flags(docs, bench, n=5).collect()}
    assert got[1][1] is True and got[1][0] >= 1
    assert got[2] == (0, False)


def test_ngram_list_keeps_multiplicity(spark):
    from pyspark.sql import functions as F
    from recommender_system_with_pyspark_spark.operators.text import ngram_list

    df = spark.createDataFrame([("spam spam spam spam",)], "text string")
    bgs = df.select(ngram_list("text", 2).alias("b")).first()["b"]
    assert bgs == ["spam spam"] * 3  # word_shingles would collapse to one
