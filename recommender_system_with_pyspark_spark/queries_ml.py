"""ML query surface (SURVEY §2.8). Deterministic transforms (StringIndexer,
MinMaxScaler, Correlation) get full DuckDB oracles; iterative/stochastic
estimators (ALS, PCA, ChiSquare) are rows-only with invariants enforced in
tests."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import load_table
from .registry import query


@query(
    "string_indexer",
    oracle="""
    WITH freq AS (
        SELECT c_mktsegment, count(*) AS cnt FROM customer GROUP BY c_mktsegment
    ), idx AS (
        SELECT c_mktsegment,
               CAST(rank() OVER (ORDER BY cnt DESC, c_mktsegment ASC) - 1 AS DOUBLE) AS seg_indexed
        FROM freq
    )
    SELECT c.c_custkey, i.seg_indexed
    FROM customer c JOIN idx i USING (c_mktsegment)
    """,
)
def string_indexer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 — StringIndexer: frequency-ordered double index, modal value → 0.0
    (PDF p.17), ties broken alphabetically (Spark's documented frequencyDesc
    behavior). Internally one countByValue job + broadcast map."""
    from pyspark.ml.feature import StringIndexer

    cust = load_table(spark, sf_dir, "customer")
    model = StringIndexer(inputCol="c_mktsegment", outputCol="seg_indexed").fit(cust)
    return model.transform(cust).select("c_custkey", "seg_indexed")


@query(
    "minmax_scaler_ml",
    oracle="""
    WITH m AS (SELECT min(c_acctbal) AS lo, max(c_acctbal) AS hi FROM customer)
    SELECT c_custkey, round((c_acctbal - lo) / (hi - lo), 6) AS bal_scaled
    FROM customer, m
    """,
)
def minmax_scaler_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 — MLlib MinMaxScaler (PDF p.13 formula): fit is one min/max
    aggregate; transform is a broadcast projection. Same oracle as the
    relational ``minmax_scale`` — proving the MLlib path computes the
    identical formula."""
    from pyspark.ml.feature import MinMaxScaler, VectorAssembler
    from pyspark.ml.functions import vector_to_array

    cust = load_table(spark, sf_dir, "customer")
    v = VectorAssembler(inputCols=["c_acctbal"], outputCol="_v").transform(cust)
    scaled = MinMaxScaler(inputCol="_v", outputCol="_s").fit(v).transform(v)
    return scaled.select(
        "c_custkey",
        F.round(vector_to_array("_s")[0], 6).alias("bal_scaled"),
    )


@query(
    "correlation_matrix",
    oracle="""
    WITH c AS (
        SELECT corr(l_quantity, l_quantity)      AS qq,
               corr(l_quantity, l_extendedprice) AS qe,
               corr(l_quantity, l_discount)      AS qd,
               corr(l_extendedprice, l_extendedprice) AS ee,
               corr(l_extendedprice, l_discount) AS ed,
               corr(l_discount, l_discount)      AS dd
        FROM lineitem
    )
    SELECT 'l_quantity' AS feature_a, 'l_quantity' AS feature_b, round(qq, 6) AS corr FROM c
    UNION ALL SELECT 'l_quantity', 'l_extendedprice', round(qe, 6) FROM c
    UNION ALL SELECT 'l_quantity', 'l_discount', round(qd, 6) FROM c
    UNION ALL SELECT 'l_extendedprice', 'l_quantity', round(qe, 6) FROM c
    UNION ALL SELECT 'l_extendedprice', 'l_extendedprice', round(ee, 6) FROM c
    UNION ALL SELECT 'l_extendedprice', 'l_discount', round(ed, 6) FROM c
    UNION ALL SELECT 'l_discount', 'l_quantity', round(qd, 6) FROM c
    UNION ALL SELECT 'l_discount', 'l_extendedprice', round(ed, 6) FROM c
    UNION ALL SELECT 'l_discount', 'l_discount', round(dd, 6) FROM c
    """,
)
def correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 — MLlib Correlation.corr full matrix (`functions.py:153-171`) as
    tidy rows; driver holds only len(cols)² doubles (ceiling documented in
    ml.stats)."""
    from .ml.stats import correlation_matrix as corr_m

    li = load_table(spark, sf_dir, "lineitem")
    return corr_m(li, ["l_quantity", "l_extendedprice", "l_discount"])


@query(
    "chi_square",
    oracle="""
    WITH base AS (
        SELECT CASE WHEN event_type = 'click' THEN 0.0
                    WHEN event_type = 'error' THEN 1.0
                    WHEN event_type = 'purchase' THEN 2.0
                    WHEN event_type = 'signup' THEN 3.0
                    ELSE 4.0 END AS type_code,
               CAST(hour(ts) AS DOUBLE) AS hour_code,
               CASE WHEN value < 50.0 THEN 0.0 ELSE 1.0 END AS label
        FROM events
    ), stacked AS (
        SELECT 'type_code' AS feature, type_code AS f, label FROM base
        UNION ALL
        SELECT 'hour_code', hour_code, label FROM base
    ), obs AS (
        SELECT feature, f, label, count(*)::DOUBLE AS o FROM stacked GROUP BY 1, 2, 3
    ), fm AS (SELECT feature, f, sum(o) AS rt FROM obs GROUP BY 1, 2),
    lm AS (SELECT feature, label, sum(o) AS ct FROM obs GROUP BY 1, 2),
    tot AS (SELECT feature, sum(o) AS n FROM obs GROUP BY 1),
    cells AS (
        SELECT fm.feature, fm.f, lm.label,
               coalesce(o.o, 0) AS o, fm.rt * lm.ct / tot.n AS e
        FROM fm JOIN lm ON fm.feature = lm.feature
        JOIN tot ON fm.feature = tot.feature
        LEFT JOIN obs o ON o.feature = fm.feature AND o.f = fm.f AND o.label = lm.label
    )
    SELECT feature,
           CAST((count(DISTINCT f) - 1) * (count(DISTINCT label) - 1) AS INTEGER) AS dof,
           round(sum((o - e) * (o - e) / e), 4) AS statistic
    FROM cells GROUP BY feature
    """,
)
def chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 — ChiSquareTest of categorical features against a binary label.
    The STATISTIC and dof are pinned against a from-scratch SQL contingency
    construction (observed vs expected over the full category grid,
    including zero cells); the p-value needs the chi² CDF — not SQL — and
    stays covered by the stats-module tests."""
    from .ml.stats import chi_square_test
    from .operators.cleaning import discretize_label

    ev = load_table(spark, sf_dir, "events")
    labeled = discretize_label(ev, "value", "label", threshold=50.0).withColumn(
        "type_code",
        F.when(F.col("event_type") == "click", 0.0)
        .when(F.col("event_type") == "error", 1.0)
        .when(F.col("event_type") == "purchase", 2.0)
        .when(F.col("event_type") == "signup", 3.0)
        .otherwise(4.0),
    ).withColumn("hour_code", (F.hour("ts")).cast("double"))
    res = chi_square_test(labeled, ["type_code", "hour_code"], "label")
    return res.select("feature", "dof", F.round("statistic", 4).alias("statistic"))


@query("feature_pipeline_pca")  # eigenvector sign/rotation → rows-only
def feature_pipeline_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1-M5+M8 — the full feature Pipeline (index → onehot → assemble →
    minmax-scale → PCA) in one fit, sparse throughout."""
    from pyspark.ml.functions import vector_to_array

    from .ml.features import feature_pipeline, fit_features

    part = load_table(spark, sf_dir, "part")
    pipe = feature_pipeline(
        index_cols=["p_brand", "p_type"],
        numeric_cols=["p_size", "p_retailprice"],
        scale=True,
        pca_k=3,
    )
    model = fit_features(pipe, part)
    out = model.transform(part)
    arr = vector_to_array(F.col("features"))
    return out.select(
        "p_partkey",
        F.round(arr[0], 4).alias("pc1"),
        F.round(arr[1], 4).alias("pc2"),
        F.round(arr[2], 4).alias("pc3"),
    )


@query("als_golden")  # iterative estimator → rows-only; golden bands asserted in-row
def als_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-metric pin for the reference's E2 result (`risultati.txt:140-144`:
    RMSE 1.1024 / R^2 0.4225 at rank 20, regParam 0.1, maxIter 20, seed 1).

    Runs ALS with the reference's winning hyperparameters on the calibrated
    synthetic BGG corpus (domain/golden.py — deterministic hash-based draws,
    partitioning-independent; reference per-user/per-item density at 2M
    rows). Emits the measured metrics plus in-band flags so the driver's
    row hash pins them; `tools/als_reference_scale.py` runs the same
    pipeline at the full 18.9M-row scale with the full TVS grid."""
    from .domain.golden import synthetic_ratings
    from .ml.models import als_prediction

    df = synthetic_ratings(spark, 2_000_000, 42_000, 2_300, partitions=64).cache()
    res = als_prediction(
        df, user_col="user_id", item_col="item_id", rating_col="rating",
        ranks=(20,), reg_params=(0.1,), max_iter=20, seed=1, tune=False,
    )
    rmse, r2 = res.metrics["rmse"], res.metrics["r2"]
    return spark.createDataFrame(
        [(round(rmse, 2), round(r2, 2),
          bool(abs(rmse - 1.1024) <= 0.05), bool(abs(r2 - 0.4225) <= 0.05))],
        "rmse double, r2 double, rmse_in_band boolean, r2_in_band boolean",
    )


@query("pca_loadings")  # eigenvector sign ambiguity → rows-only
def pca_loadings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M22 — the PCA loading matrix (``PCAModel.pc``, reference
    `functions.py:209-215` loading heatmap) as (feature_idx, component,
    loading) rows. Columns are orthonormal (invariant-tested); sign is
    implementation-defined, hence rows-only."""
    from .ml.features import feature_pipeline, fit_features, principal_components

    part = load_table(spark, sf_dir, "part")
    pipe = feature_pipeline(
        index_cols=["p_brand", "p_type"],
        numeric_cols=["p_size", "p_retailprice"],
        scale=True,
        pca_k=3,
    )
    model = fit_features(pipe, part)
    pc = principal_components(model)
    rows = [
        (i, j, round(abs(w), 4))
        for i, row in enumerate(pc)
        for j, w in enumerate(row)
    ]
    return spark.createDataFrame(rows, "feature_idx int, component int, abs_loading double")


@query(
    "onehot_features",
    oracle="""
    WITH freq AS (
        SELECT c_mktsegment, count(*) AS cnt FROM customer GROUP BY c_mktsegment
    ), idx AS (
        SELECT c_mktsegment,
               CAST(rank() OVER (ORDER BY cnt DESC, c_mktsegment ASC) - 1 AS INTEGER) AS active_index
        FROM freq
    )
    SELECT c.c_custkey, i.active_index
    FROM customer c JOIN idx i USING (c_mktsegment)
    """,
)
def onehot_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 — OneHotEncoder: index → sparse one-hot; emitted as (key, active
    index, size) rows to stay sparse-friendly."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import OneHotEncoder, StringIndexer

    cust = load_table(spark, sf_dir, "customer")
    pipe = Pipeline(
        stages=[
            StringIndexer(inputCol="c_mktsegment", outputCol="_idx"),
            OneHotEncoder(inputCol="_idx", outputCol="_oh", dropLast=False),
        ]
    )
    out = pipe.fit(cust).transform(cust)
    return out.select(
        "c_custkey",
        F.col("_idx").cast("int").alias("active_index"),
    )


@query("als_recommend")  # iterative factorization → rows-only
def als_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M10+M11+F3/F4 — the flagship ALS path at query granularity."""
    from .flagship import recommend_top_items

    return recommend_top_items(spark, sf_dir, k=3, max_iter=5)


@query("als_tuned")  # TVS grid search → rows-only (metrics row)
def als_tuned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M10+M17+M18+M19 — ALS under TrainValidationSplit with a small grid,
    seeded split; returns the metric row (rmse, r2, best rank)."""
    from .flagship import implicit_ratings
    from .ml.models import als_prediction

    ratings = implicit_ratings(spark, sf_dir).cache()
    res = als_prediction(
        ratings, ranks=(4, 8), reg_params=(0.1,), max_iter=5, seed=1, tune=True
    )
    return spark.createDataFrame(
        [(round(res.metrics["rmse"], 4), round(res.metrics["r2"], 4), int(res.best_params["rank"]))],
        "rmse double, r2 double, best_rank int",
    )


@query(
    "tfidf_features",
    oracle="""
    WITH ex AS (
        SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
        FROM documents
    ),
    per AS (
        SELECT doc_id, token, count(*) AS tf
        FROM ex WHERE token <> '' GROUP BY doc_id, token
    ),
    dfreq AS (SELECT token, count(*) AS df FROM per GROUP BY token),
    n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents)
    SELECT p.doc_id,
           CAST(count(*) AS INTEGER) AS nnz,
           round(sqrt(sum(pow(p.tf * (ln((n.n_docs + 1) / (d.df + 1)) + 1), 2))), 4) AS l2
    FROM per p JOIN dfreq d USING (token) CROSS JOIN n
    GROUP BY p.doc_id
    """,
)
def tfidf_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-term TF-IDF per document (smooth idf = ln((N+1)/(df+1)) + 1),
    emitting (doc_id, nnz = distinct terms, l2 = ‖tf·idf‖₂). All native:
    explode → (doc, term) tf counts → term-keyed df join → per-doc
    aggregate. The term-keyed shuffle join scales with corpus vocabulary
    (no driver-held vocab, unlike CountVectorizer), which is what lets the
    plain-SQL oracle attach (VERDICT r5 #6); the vocabulary-free HashingTF
    twin stays available as ``tfidf_hashed_features``."""
    from .operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    ex = docs.select("doc_id", F.explode(tokens("text")).alias("token")).filter(
        F.col("token") != ""
    )
    per = ex.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = per.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    idf = F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1
    return (
        per.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("nnz"),
            F.round(F.sqrt(F.sum(F.pow(F.col("tf") * idf, 2))), 4).alias("l2"),
        )
    )


@query("tfidf_hashed_features")  # murmur3 HashingTF is JVM-only → rows-only
def tfidf_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF via the stateless hashing pipeline (Tokenizer →
    StopWordsRemover → HashingTF → IDF): no vocabulary fit at all — the
    fixed-width-feature path for model input at 100 TB. Bucket nnz/l2
    depend on MLlib's murmur3 term hash, which no SQL engine reproduces,
    so this twin is rows-only; ``tfidf_features`` carries the exact-term
    hash-matched oracle."""
    from pyspark.ml.functions import vector_to_array

    from .ml.text_features import tfidf_pipeline

    docs = load_table(spark, sf_dir, "documents")
    model = tfidf_pipeline(num_features=1 << 12).fit(docs)
    out = model.transform(docs)
    arr = vector_to_array(F.col("tfidf"))
    return out.select(
        "doc_id",
        F.size(F.filter(arr, lambda x: x != 0)).alias("nnz"),
        F.round(F.sqrt(F.aggregate(F.transform(arr, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)), 4).alias("l2"),
    )


@query("word2vec_neighbors")  # trained embedding → rows-only
def word2vec_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word2Vec document embeddings fed into the engine's own similarity
    operator (cosine top-3 per query doc) — the text → embedding → ANN
    composition a training-data pipeline runs end-to-end."""
    from .ml.text_features import embed_documents
    from .operators.similarity import cosine_topk

    docs = load_table(spark, sf_dir, "documents").limit(200)
    emb, _ = embed_documents(docs, vector_size=16)
    queries_df = emb.filter(F.col("doc_id") < 5)
    return cosine_topk(queries_df, emb, id_col="doc_id", vec_col="embedding", k=3)


@query(
    "feature_binning",
    oracle="""
    SELECT event_id,
           round(value, 2) AS value,
           CAST(ntile(10) OVER (ORDER BY value, event_id) AS INTEGER) AS decile,
           CASE WHEN value < 0.0::DOUBLE THEN 0
                WHEN value >= 200.0::DOUBLE THEN 11
                ELSE CAST(1 + floor((value - 0.0::DOUBLE) / 200.0::DOUBLE * 10) AS INTEGER)
           END AS width_bin
    FROM events
    """,
)
def feature_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature binning both ways: equal-frequency deciles (ntile over a
    deterministic total order — event_id breaks value ties) and equal-width
    bins over [0, 200) with explicit floor arithmetic (bit-reproducible,
    unlike engine-specific width_bucket internals). ntile is a global sort —
    fine per-feature; at 100 TB switch to approx-quantile cut points +
    broadcast lookup (see quantile_bins docstring)."""
    from .operators.cleaning import equal_width_bins, quantile_bins

    ev = load_table(spark, sf_dir, "events")
    binned = quantile_bins(ev, "value", n_bins=10, out_col="decile",
                           tiebreak=["event_id"])
    binned = equal_width_bins(binned, "value", 0.0, 200.0, n_bins=10,
                              out_col="width_bin")
    return binned.select(
        "event_id", F.round("value", 2).alias("value"), "decile", "width_bin"
    )


@query("als_item_neighbors")  # solver-output factors → rows-only
def als_item_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item "related games" rail from ALS latent factors: cosine
    top-5 per query item over model.itemFactors (flagship.py). Seeded and
    tie-broken → deterministic; invariants in test_flagship.py."""
    from .flagship import item_factor_neighbors

    return item_factor_neighbors(spark, sf_dir, k=5, max_iter=5)
