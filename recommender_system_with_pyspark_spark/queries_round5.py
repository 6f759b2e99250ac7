"""Round-5 query surface: declarative data-quality audits, per-group
linear trends, exact robust scaling, exact heavy hitters, a JSONL
source/sink round-trip, and exact cluster-pruned semantic dedup. Every
query here is DuckDB-oracle hash-checked.

These widen the engine past the reference's hand-rolled pandas audits
(`datacleaning.py:34-44` null scans, `functions.py:61-74`
find_missing_values) into the constraint-gating / trend-monitoring /
semantic-dedup operations a 100 TB training-data pipeline runs on every
ingest batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import load_table
from .operators import quality as Q
from .operators import similarity as S
from .operators import text as X
from .operators.cleaning import robust_scale
from .operators.partitioning import spread_small_input
from .operators.relational import heavy_hitters
from .operators.temporal import per_group_trend
from .registry import query


@query(
    "dq_audit",
    oracle="""
    SELECT 'customer.not_null:c_name' AS check,
           CAST(count(*) FILTER (c_name IS NULL) AS BIGINT) AS violations,
           CAST(count(*) AS BIGINT) AS total,
           count(*) FILTER (c_name IS NULL) = 0 AS passed
    FROM customer
    UNION ALL
    SELECT 'customer.in_range:c_acctbal',
           CAST(count(*) FILTER (c_acctbal IS NULL OR c_acctbal NOT BETWEEN 0 AND 10000) AS BIGINT),
           CAST(count(*) AS BIGINT),
           count(*) FILTER (c_acctbal IS NULL OR c_acctbal NOT BETWEEN 0 AND 10000) = 0
    FROM customer
    UNION ALL
    SELECT 'customer.accepted_values:c_mktsegment',
           CAST(count(*) FILTER (c_mktsegment IS NULL OR c_mktsegment NOT IN
               ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY')) AS BIGINT),
           CAST(count(*) AS BIGINT),
           count(*) FILTER (c_mktsegment IS NULL OR c_mktsegment NOT IN
               ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY')) = 0
    FROM customer
    UNION ALL
    SELECT 'customer.unique:c_custkey',
           CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT),
           CAST(count(*) AS BIGINT),
           count(*) - count(DISTINCT c_custkey) = 0
    FROM customer
    UNION ALL
    SELECT 'documents.not_null:text',
           CAST(count(*) FILTER (text IS NULL) AS BIGINT),
           CAST(count(*) AS BIGINT),
           count(*) FILTER (text IS NULL) = 0
    FROM documents
    UNION ALL
    SELECT 'documents.matches:lang',
           CAST(count(*) FILTER (lang IS NULL OR NOT regexp_matches(lang, '^[a-z]{2}$')) AS BIGINT),
           CAST(count(*) AS BIGINT),
           count(*) FILTER (lang IS NULL OR NOT regexp_matches(lang, '^[a-z]{2}$')) = 0
    FROM documents
    UNION ALL
    SELECT 'orders.custkey_in_customer',
           CAST((SELECT count(*) FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
                 ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL AND o.o_custkey IS NOT NULL) AS BIGINT),
           CAST((SELECT count(*) FROM orders) AS BIGINT),
           (SELECT count(*) FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
            ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL AND o.o_custkey IS NOT NULL) = 0
    UNION ALL
    SELECT 'lineitem.orderkey_in_orders',
           CAST((SELECT count(*) FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
                 ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL AND l.l_orderkey IS NOT NULL) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           (SELECT count(*) FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
            ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL AND l.l_orderkey IS NOT NULL) = 0
    """,
)
def dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style ingest gate over three tables: completeness, range,
    accepted values, regex shape, key uniqueness, and two referential
    checks — all row-level checks on a table share ONE aggregate pass,
    referential checks broadcast the deduped parent key set so the child
    is never shuffled (operators/quality.py)."""
    cust = load_table(spark, sf_dir, "customer")
    docs = load_table(spark, sf_dir, "documents")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return Q.audit_suite([
        Q.table_audit(
            cust, "customer",
            checks=[
                Q.not_null("c_name"),
                Q.in_range("c_acctbal", 0, 10000),
                Q.accepted_values("c_mktsegment", [
                    "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY",
                ]),
            ],
            unique=["c_custkey"],
        ),
        Q.table_audit(docs, "documents", checks=[
            Q.not_null("text"), Q.matches("lang", "^[a-z]{2}$"),
        ]),
        Q.referential_audit(orders, "o_custkey", cust.select(F.col("c_custkey").alias("o_custkey")), "o_custkey",
                            "orders.custkey_in_customer"),
        Q.referential_audit(lineitem, "l_orderkey", orders.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey",
                            "lineitem.orderkey_in_orders"),
    ])


@query(
    "revenue_trend_by_nation",
    oracle="""
    WITH daily AS (
        SELECT n.n_name,
               date_diff('day', DATE '1970-01-01', o.o_orderdate::DATE) AS day_idx,
               round(sum(o.o_totalprice), 2) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2
    )
    SELECT n_name,
           round(regr_slope(revenue, day_idx), 6) AS slope,
           round(regr_intercept(revenue, day_idx), 2) AS intercept,
           round(regr_r2(revenue, day_idx), 6) AS r2,
           CAST(regr_count(revenue, day_idx) AS BIGINT) AS n
    FROM daily GROUP BY n_name
    """,
)
def revenue_trend_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is each nation's daily order revenue trending up or down? Daily
    pre-aggregation (rounded to pin sum order), then the closed-form
    regr_* moments per nation — tiny-model-per-key without MLlib
    (operators/temporal.py per_group_trend). Both joins broadcast the
    dims; the only wide shuffle is the (nation, day) aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    daily = (
        orders.join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
                    orders["o_custkey"] == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == nation["n_nationkey"])
        .groupBy(
            "n_name",
            F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).alias("day_idx"),
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    # round each stat ONCE, exactly like the oracle: double-rounding
    # (round6 then round2) can land on the other side of a half-cent
    # boundary than the oracle's single round2
    trend = per_group_trend(daily, ["n_name"], "day_idx", "revenue", round_to=None)
    return trend.select(
        "n_name",
        F.round("slope", 6).alias("slope"),
        F.round("intercept", 2).alias("intercept"),
        F.round("r2", 6).alias("r2"),
        "n",
    )


@query(
    "robust_scaled_acctbal",
    oracle="""
    WITH s AS (
        SELECT quantile_cont(c_acctbal, 0.25) AS q1,
               quantile_cont(c_acctbal, 0.5) AS med,
               quantile_cont(c_acctbal, 0.75) AS q3
        FROM customer
    )
    SELECT c.c_custkey,
           round(c.c_acctbal, 2) AS c_acctbal,
           CASE WHEN s.q3 - s.q1 > 0
                THEN round((c.c_acctbal - s.med) / (s.q3 - s.q1), 6)
           END AS c_acctbal_scaled
    FROM customer c CROSS JOIN s
    """,
)
def robust_scaled_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/IQR robust scaling of account balances with EXACT
    linear-interpolation percentiles — the engine-portable twin of
    MLlib's sketch-based RobustScaler (operators/cleaning.robust_scale).
    One aggregate pass for the three quantiles, broadcast back. The oracle
    mirrors the operator's IQR==0 → null guard (ADVICE r5), so the twin
    contract holds even on a degenerate constant column."""
    cust = load_table(spark, sf_dir, "customer")
    scaled = robust_scale(cust.select("c_custkey", "c_acctbal"), ["c_acctbal"], round_to=6)
    return scaled.select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_acctbal_scaled",
    )


@query(
    "heavy_hitter_events",
    oracle="""
    WITH t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events)
    SELECT e.event_type, CAST(count(*) AS BIGINT) AS cnt,
           round(count(*)::DOUBLE / t.n, 6) AS share
    FROM events e CROSS JOIN t
    GROUP BY e.event_type, t.n
    HAVING count(*) * 5 > t.n
    """,
)
def heavy_hitter_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact φ=1/5 heavy hitters over the event stream: event types with
    strictly more than 20% share (operators/relational.heavy_hitters).
    groupBy carries one row per distinct type; the total is a broadcast
    scalar. ≤4 output rows by construction at any scale."""
    events = load_table(spark, sf_dir, "events")
    return heavy_hitters(events, "event_type", k=5)


@query(
    "jsonl_roundtrip_docs",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(length(text)) AS BIGINT) AS total_len,
           CAST(max(doc_id) AS BIGINT) AS max_doc_id
    FROM documents GROUP BY lang
    """,
)
def jsonl_roundtrip_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JSONL source/sink path (io.read_json) exercised end-to-end:
    documents go out as line-delimited JSON and come back through an
    explicit-schema scan (inference is a full extra read at 100 TB),
    then a per-language aggregate runs on the JSON-read frame. The
    oracle aggregates the original parquet, so a hash match proves the
    round-trip preserves every string byte (JSON escaping included) and
    every integer exactly."""
    from pyspark.sql import types as T

    from . import io as IO

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long"), "text", "lang", F.col("n_chars").cast("long")
    )
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scratch = os.path.join(
        repo_root, "spark-warehouse",
        f"jsonl_compat_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    docs.write.mode("overwrite").json(scratch)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ])
    back = IO.read_json(spark, scratch, schema=schema)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(F.length("text")).cast("long").alias("total_len"),
        F.max("doc_id").cast("long").alias("max_doc_id"),
    )


@query(
    "semantic_dedup",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.45
    """,
)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs, EXACT by construction:
    KMeans cells over unit vectors + a triangle-inequality bound prunes
    cell-pair blocks that provably cannot hold a qualifying pair; the
    exact cosine check runs only inside surviving blocks. Output equals
    all-pairs brute force (hence the exact SQL oracle — no
    tuning-to-recall), while the pair join never goes all-pairs
    (operators/similarity.semantic_dedup_pairs)."""
    emb = load_table(spark, sf_dir, "embeddings")
    # n_cells=32 (was 8): at threshold 0.45 the triangle bound prunes few
    # cell-pair blocks, so 36 fat tasks were straggler-bound on 32 cores
    # (sf1 stability study, SCALING.md round 8); ~528 small tasks average
    # placement noise out and cap per-task memory. The pair set is exact
    # by construction for ANY cell count — the oracle hash is unchanged.
    return S.semantic_dedup_pairs(emb, "vec_id", "embedding",
                                  threshold=0.45, n_cells=32, seed=1)


@query(
    "part_triangles",
    oracle="""
    WITH pairs AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, a.l_orderkey
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    e AS (
        SELECT pa, pb FROM pairs GROUP BY pa, pb
        HAVING count(DISTINCT l_orderkey) >= 2
    ),
    deg AS (
        SELECT n, count(*) AS d FROM (
            SELECT pa AS n FROM e UNION ALL SELECT pb FROM e
        ) GROUP BY n
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
           (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) FROM deg) AS n_wedges,
           (SELECT CAST(count(*) AS BIGINT)
            FROM e e1 JOIN e e2 ON e1.pb = e2.pa
                      JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb) AS n_triangles,
           round(3.0 * (SELECT count(*)
                        FROM e e1 JOIN e e2 ON e1.pb = e2.pa
                                  JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb)
                 / greatest((SELECT sum(d * (d - 1) / 2) FROM deg), 1), 6) AS clustering_coeff
    """,
)
def part_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-purchase graph (parts bought
    together in ≥2 orders): how clique-y are baskets? Spark side runs the
    degree-ordered node-iterator (per-node oriented out-degree bounded by
    O(√m) — no last-reducer hub blowup; operators/graph.triangle_stats);
    the oracle counts the same set with plain id-ordered 3-way joins."""
    # single-split fixture scan: without the spread the broadcast self-join's
    # stream side (fact rows -> pair rows) runs as ONE task (round 13);
    # no-op at deployment scale where the scan has >= core-count splits
    li = spread_small_input(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"),
        "l_orderkey",
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count_distinct("l_orderkey").alias("_s"))
        .filter(F.col("_s") >= 2)
        .select("pa", "pb")
        # triangle_stats consumes its edge list ~6x (degrees, orientation,
        # wedge join, closure join); this derivation is a fact self-join +
        # distinct-count — exactly the expensive lineage graph.triangle_stats'
        # caller-owned materialization policy says to persist once.
        .localCheckpoint(eager=False)
    )
    from .operators.graph import triangle_stats

    return triangle_stats(edges, "pa", "pb")



# Shared by cdc_current_state (batch) and stream_cdc_upsert (streaming):
# ONE derivation + ONE oracle so the twins cannot silently diverge.
_CDC_ORACLE = """
    WITH cdc AS (
        SELECT o_orderkey, 1 AS seq, 'I' AS op, round(o_totalprice, 2) AS totalprice,
               o_orderpriority FROM orders
        UNION ALL
        SELECT o_orderkey, 2, 'U',
               CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(3,1)), 2) AS DOUBLE),
               o_orderpriority
        FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT o_orderkey, 3, 'D', NULL, NULL FROM orders WHERE o_orderstatus = 'P'
    ),
    latest AS (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
        FROM cdc
    )
    SELECT o_orderkey, CAST(seq AS INTEGER) AS seq, op, totalprice, o_orderpriority
    FROM latest WHERE rn = 1 AND op <> 'D'
"""


def _derive_cdc_changelog(o: DataFrame) -> DataFrame:
    """Deterministic I/U/D changelog from orders: every order inserted,
    'F' orders later updated (+10%, decimal-exact — double*1.1 manufactures
    half-cent ties engines round differently), 'P' orders deleted."""
    ins = o.select(
        "o_orderkey", F.lit(1).alias("seq"), F.lit("I").alias("op"),
        F.round("o_totalprice", 2).alias("totalprice"), "o_orderpriority",
    )
    upd = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", F.lit(2).alias("seq"), F.lit("U").alias("op"),
        F.round(
            F.col("o_totalprice").cast("decimal(18,2)") * F.lit(1.1).cast("decimal(3,1)"), 2
        ).cast("double").alias("totalprice"),
        "o_orderpriority",
    )
    dele = o.filter(F.col("o_orderstatus") == "P").select(
        "o_orderkey", F.lit(3).alias("seq"), F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("totalprice"),
        F.lit(None).cast("string").alias("o_orderpriority"),
    )
    return ins.unionByName(upd).unionByName(dele)


@query("cdc_current_state", oracle=_CDC_ORACLE)
def cdc_current_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog materialization (latest-wins per key, deletes drop
    the key): a deterministic I/U/D changelog is derived from orders
    (every order inserted, 'F' orders later updated, 'P' orders deleted),
    then `temporal.cdc_apply` reduces it to current state in ONE
    key-shuffle — the window rides the same exchange, and the changelog
    is never joined against a base snapshot."""
    from .operators.temporal import cdc_apply

    cdc = _derive_cdc_changelog(load_table(spark, sf_dir, "orders"))
    return cdc_apply(cdc, ["o_orderkey"], ["seq"], op_col="op", delete_op="D")


@query(
    "last_touch_attribution",
    oracle="""
    WITH w AS (
        SELECT event_id, user_id, ts, event_type,
               last_value(CASE WHEN event_type IN ('click', 'view') THEN event_id END
                          IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_id,
               last_value(CASE WHEN event_type IN ('click', 'view') THEN event_type END
                          IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_type
        FROM events
    )
    SELECT event_id AS conversion_id, user_id, ts, touch_id, touch_type
    FROM w WHERE event_type = 'purchase'
    """,
)
def last_touch_attribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credited to the user's most
    recent strictly-preceding click/view (null = organic). One window
    over a single user-keyed shuffle — no self-join
    (operators/temporal.last_touch_attribution); (ts, event_id) compound
    ordering pins same-timestamp determinism on any engine."""
    from .operators.temporal import last_touch_attribution

    ev = load_table(spark, sf_dir, "events")
    return last_touch_attribution(
        ev, "user_id", "ts", "event_id", "event_type",
        conversion_type="purchase", touch_types=("click", "view"),
    )


@query(
    "bm25_search",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks
        WHERE term IN ('join', 'hash', 'filter') GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    stats AS (
        SELECT count(*)::DOUBLE AS n_docs,
               avg(len(string_split_regex(trim(lower(text)), '\\s+'))) AS avgdl
        FROM documents
    ),
    dl AS (
        SELECT doc_id, len(string_split_regex(trim(lower(text)), '\\s+'))::DOUBLE AS dl
        FROM documents
    ),
    scored AS (
        SELECT tf.doc_id,
               round(sum(
                   ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                   * (tf.tf * 2.2)
                   / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
               ), 6) AS score
        FROM tf JOIN dfreq d USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
        GROUP BY tf.doc_id
    )
    SELECT doc_id, score FROM scored
    ORDER BY score DESC, doc_id ASC LIMIT 20
    """,
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for the query {join, hash, filter} (k1=1.2, b=0.75,
    Lucene idf). Postings are filtered to the query terms BEFORE the
    (doc, term) aggregate's shuffle; df and corpus stats broadcast back;
    per-doc lengths join as a doc-keyed equi-join; top-k is TakeOrdered
    (operators/text.bm25_rank)."""
    docs = load_table(spark, sf_dir, "documents")
    return X.bm25_rank(docs, ["join", "hash", "filter"], "text", "doc_id", k=20)


@query(
    "crossdoc_ngram_overlap",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               md5(array_to_string(t[i:i+7], ' ')) AS gram
        FROM toks, unnest(range(1, greatest(len(t) - 7, 0) + 1)) AS r(i)
    ),
    gd AS (SELECT gram, count(DISTINCT doc_id) AS nd FROM grams GROUP BY gram),
    per_doc AS (
        SELECT g.doc_id,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(count(*) FILTER (gd.nd > 1) AS BIGINT) AS dup_grams
        FROM grams g JOIN gd USING (gram) GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.n_grams, 0) AS n_grams,
           COALESCE(p.dup_grams, 0) AS dup_grams,
           round(COALESCE(p.dup_grams / greatest(p.n_grams, 1), 0.0), 6) AS dup_ratio
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
)
def crossdoc_ngram_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-8-gram audit (distributed approximation of
    exact-substring dedup, Lee et al. 2022): which fraction of each doc's
    positional 8-grams also appears in ANOTHER document. Positional grams
    are md5-hashed so the gram aggregate and join-back shuffle 16-byte
    keys, never text (operators/text.crossdoc_ngram_overlap)."""
    docs = load_table(spark, sf_dir, "documents")
    return X.crossdoc_ngram_overlap(docs, n=8, text_col="text", id_col="doc_id")


@query(
    "bucketed_join_sales",
    oracle="""
    SELECT o.o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS net_revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def bucketed_join_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The write-side physical-layout lever exercised end-to-end: orders
    and lineitem are written as bucketed tables on the join key (same
    bucket count), then joined WITHOUT a join-side exchange — the
    co-location strategy for repeatedly-joined 100 TB facts
    (`io.write_bucketed`; the no-shuffle property is machine-asserted in
    `test_io.py::test_bucketed_join_no_shuffle`). The oracle aggregates
    the original parquet, so a hash match proves the bucketed round-trip
    is lossless AND the bucketed plan computes the same join."""
    import os

    from . import io as IO

    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = os.path.join(repo_root, "spark-warehouse", f"bucketed_{sf_tag}")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice", "l_discount"
    )
    IO.write_bucketed(orders, f"bq_orders_{sf_tag}", "o_orderkey", 8,
                      path=os.path.join(base, "orders"))
    IO.write_bucketed(li, f"bq_lineitem_{sf_tag}", "o_orderkey", 8,
                      path=os.path.join(base, "lineitem"))
    a = spark.table(f"bq_orders_{sf_tag}")
    b = spark.table(f"bq_lineitem_{sf_tag}")
    return (
        a.join(b, "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("net_revenue"),
        )
    )


@query(
    "sketch_accuracy",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           round(quantile_cont(value, 0.5), 6) AS exact_p50,
           true AS hll_within_3rsd,
           true AS quantile_within_eps
    FROM events GROUP BY event_type
    """,
)
def sketch_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-sketch accuracy CONTRACT, oracle-enforced: per event
    type, the exact distinct-user count and exact median, plus booleans
    asserting that Spark's HLL++ estimate (rsd=0.05) lands within 3·rsd
    of exact and approx_percentile (accuracy 10000) within eps of the
    exact interpolated median. The oracle emits literal `true` for the
    bound columns — if either sketch ever drifts out of its contract
    (testdata regeneration, Spark upgrade), the hash check turns red.
    The exact columns double as the ground truth the sketches replace at
    100 TB (one pass, mergeable, no expand)."""
    ev = load_table(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("exact_users"),
        F.percentile(F.col("value").cast("double"), F.lit(0.5)).alias("_p50"),
    )
    approx = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.05).alias("_hll"),
        F.percentile_approx(F.col("value").cast("double"), F.lit(0.5), F.lit(10000)).alias("_ap50"),
    )
    return (
        exact.join(approx, "event_type")
        .select(
            "event_type",
            "exact_users",
            F.round("_p50", 6).alias("exact_p50"),
            (
                F.abs(F.col("_hll") - F.col("exact_users"))
                <= 3 * 0.05 * F.col("exact_users")
            ).alias("hll_within_3rsd"),
            # percentile_approx returns an exact data value; the exact
            # interpolated median sits between two data values, so the
            # tolerance is a small relative eps, not equality
            (
                F.abs(F.col("_ap50") - F.col("_p50"))
                <= 0.01 * F.greatest(F.abs(F.col("_p50")), F.lit(1e-9))
            ).alias("quantile_within_eps"),
        )
    )


@query(
    "user_survival_curve",
    oracle="""
    WITH bounds AS (SELECT max(ts)::DATE AS max_d FROM events),
    cohort AS (
        SELECT e.user_id,
               min(e.ts)::DATE AS first_d,
               max(e.ts)::DATE AS last_d
        FROM events e GROUP BY e.user_id
    ),
    durations AS (
        SELECT CASE WHEN date_diff('day', c.last_d, b.max_d) > 7
                    THEN date_diff('day', c.first_d, c.last_d)
                    ELSE date_diff('day', c.first_d, b.max_d) END AS t,
               CASE WHEN date_diff('day', c.last_d, b.max_d) > 7 THEN 1 ELSE 0 END AS ev
        FROM cohort c CROSS JOIN bounds b
    ),
    per_t AS (
        SELECT t,
               CAST(sum(ev) AS BIGINT) AS deaths,
               CAST(count(*) AS BIGINT) AS n_t
        FROM durations GROUP BY t
    ),
    risk AS (
        SELECT t, deaths,
               sum(n_t) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_at_risk
        FROM per_t
    )
    SELECT t AS duration,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           deaths,
           -- DECIMAL(38,28) mirror of the engine's associative-exact
           -- two-stage log-term sum (operators/temporal.km_survival)
           round(exp(CAST(sum(CAST(CASE WHEN deaths > 0
                              THEN ln(greatest(1 - deaths / n_at_risk, 1e-300))
                              ELSE 0.0 END AS DECIMAL(38,28)))
                     OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)), 6) AS survival
    FROM risk
    """,
)
def user_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier user-lifetime curve: a user whose last activity is >7
    days before the corpus end has churned (event observed, lifetime =
    first→last activity); everyone else is right-censored at corpus end.
    The estimator itself (operators/temporal.km_survival) aggregates to
    one row per distinct lifetime BEFORE any window, so the ordered
    cumulative product runs over a tiny frame — the raw events table sees
    one groupBy, nothing else."""
    from .operators.temporal import km_survival

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.max(F.to_date("ts")).alias("_max_d"))
    cohort = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("_first_d"),
        F.max(F.to_date("ts")).alias("_last_d"),
    )
    durations = cohort.crossJoin(F.broadcast(bounds)).select(
        F.when(
            F.datediff("_max_d", "_last_d") > 7,
            F.datediff("_last_d", "_first_d"),
        ).otherwise(F.datediff("_max_d", "_first_d")).alias("duration"),
        F.when(F.datediff("_max_d", "_last_d") > 7, F.lit(1)).otherwise(F.lit(0)).alias("event"),
    )
    return km_survival(durations, "duration", "event")


@query(
    "part_association_rules",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
    ),
    nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n FROM items),
    ic AS (SELECT i, CAST(count(*) AS BIGINT) AS c FROM items GROUP BY i),
    pairs AS (
        SELECT a.i AS antecedent, c.i AS consequent, CAST(count(*) AS BIGINT) AS pair_baskets
        FROM items a JOIN items c ON a.b = c.b AND a.i <> c.i
        GROUP BY a.i, c.i HAVING count(*) >= 3
    )
    SELECT p.antecedent, p.consequent, p.pair_baskets,
           round(p.pair_baskets / nb.n, 6) AS support,
           round(p.pair_baskets / ia.c, 6) AS confidence,
           round((p.pair_baskets / ia.c) / (ic2.c / nb.n), 6) AS lift
    FROM pairs p
    JOIN ic ia ON ia.i = p.antecedent
    JOIN ic ic2 ON ic2.i = p.consequent
    CROSS JOIN nb
    """,
)
def part_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket rules over order baskets: antecedent→consequent with
    support/confidence/lift, both directions, pairs in ≥3 baskets. Pair
    generation is the bounded per-basket self-join; item/basket totals
    are broadcast one-row/one-per-item aggregates
    (operators/relational.association_rules)."""
    from .operators.relational import association_rules

    li = load_table(spark, sf_dir, "lineitem")
    return association_rules(li, "l_orderkey", "l_partkey", min_pair_baskets=3)


@query(
    "part_components",
    oracle="""
    WITH RECURSIVE pairs AS MATERIALIZED (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, a.l_orderkey
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    e AS MATERIALIZED (
        SELECT pa, pb FROM pairs GROUP BY pa, pb
        HAVING count(DISTINCT l_orderkey) >= 2
    ),
    edges AS MATERIALIZED (
        SELECT pa AS a, pb AS b FROM e UNION SELECT pb, pa FROM e
    ),
    reach AS (
        SELECT a AS node, a AS label FROM edges
        UNION
        SELECT e2.b, r.label FROM reach r JOIN edges e2 ON r.node = e2.a
    )
    SELECT CAST(node AS BIGINT) AS part, CAST(min(label) AS BIGINT) AS component
    FROM reach GROUP BY node
    """,
)
def part_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the co-purchase graph via alternating
    large-star / small-star contraction (Kiveris et al.) — the O(log n)-
    round algorithm that stays correct on adversarial high-diameter
    graphs where one-hop min-label propagation would need diameter
    rounds (operators/graph.connected_components_logstar; the min-label
    operator now RAISES instead of silently returning partial labels).
    The oracle walks the same edge set with a recursive reachability CTE."""
    from .operators.graph import connected_components_logstar

    # single-split fixture scan: without the spread the broadcast self-join's
    # stream side (fact rows -> pair rows) runs as ONE task (round 13);
    # no-op at deployment scale where the scan has >= core-count splits
    li = spread_small_input(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"),
        "l_orderkey",
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count_distinct("l_orderkey").alias("_s"))
        .filter(F.col("_s") >= 2)
        .select("pa", "pb")
    )
    comp = connected_components_logstar(edges, "pa", "pb")
    return comp.select(
        F.col("node").cast("long").alias("part"),
        F.col("component").cast("long").alias("component"),
    )


@query(
    "orc_roundtrip_parts",
    oracle="""
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(sum(p_retailprice), 2) AS total_price
    FROM part GROUP BY p_brand
    """,
)
def orc_roundtrip_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink compat (completing the format matrix: parquet,
    CSV, JSONL, ORC — all value-lossless round-trips proven against the
    parquet-side oracle). ORC brings the same columnar pushdown/pruning
    contract as parquet from a second ecosystem (Hive)."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scratch = os.path.join(
        repo_root, "spark-warehouse",
        f"orc_compat_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    part = load_table(spark, sf_dir, "part")
    part.write.mode("overwrite").orc(scratch)
    back = spark.read.orc(scratch)
    return back.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.round(F.sum("p_retailprice"), 2).alias("total_price"),
    )


@query(
    "partition_pruned_orders",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def partition_pruned_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout exercised end-to-end: orders written
    PARTITIONED BY (o_orderstatus), then a status filter resolves to
    PartitionFilters — the 'F' query never opens the 'O'/'P' directories
    (the physical-layout analogue of predicate pushdown; same mechanism
    `write_ivf_index`/`ivf_probe` use for ANN). The oracle filters the
    original parquet, so the hash also proves the partitioned round-trip
    is lossless."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scratch = os.path.join(
        repo_root, "spark-warehouse",
        f"part_orders_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    orders = load_table(spark, sf_dir, "orders")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(scratch)
    back = spark.read.parquet(scratch).filter(F.col("o_orderstatus") == "F")
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@query("stream_cdc_upsert", oracle=_CDC_ORACLE)
def stream_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING CDC upsert — the Delta-style continuous-merge pattern:
    the changelog arrives as a multi-file stream (maxFilesPerTrigger=1 →
    several micro-batches), and each foreachBatch merges the batch into
    the persistent state table by per-key max-seq latest-wins, KEEPING
    delete tombstones in state. Because max-seq latest-wins is
    associative and commutative, the final state is identical however
    the changelog rows are split across batches — no reliance on file
    arrival order — and equals the batch `cdc_current_state` (same SQL
    oracle). State versions are written per epoch (the idempotent-replay
    shape: an epoch that never committed is simply rewritten)."""
    import shutil

    from pyspark.sql import Window

    from .streaming.windows import write_foreach_batch

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    base = os.path.join(repo_root, "spark-warehouse", f"stream_cdc_{sf_tag}")
    shutil.rmtree(base, ignore_errors=True)
    changelog_dir = os.path.join(base, "changelog")
    ckpt = os.path.join(base, "ckpt")
    state_base = os.path.join(base, "state")

    _derive_cdc_changelog(load_table(spark, sf_dir, "orders")) \
        .repartition(3).write.mode("overwrite").parquet(changelog_dir)

    schema = spark.read.parquet(changelog_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(changelog_dir)
    )
    state_paths: list[str] = []

    def merge(batch_df, epoch_id):
        prev = (
            batch_df.sparkSession.read.parquet(state_paths[-1])
            if state_paths else None
        )
        allr = batch_df if prev is None else prev.unionByName(batch_df)
        w = Window.partitionBy("o_orderkey").orderBy(F.col("seq").desc())
        merged = (
            allr.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        out = os.path.join(state_base, f"e{epoch_id}")
        merged.write.mode("overwrite").parquet(out)
        state_paths.append(out)

    q = write_foreach_batch(stream, merge, ckpt, output_mode="append")
    q.awaitTermination()
    final = spark.read.parquet(state_paths[-1])
    return final.filter(F.col("op") != "D").select(
        "o_orderkey", "seq", "op", "totalprice", "o_orderpriority"
    )


@query(
    "part_kcore",
    oracle="""
    WITH RECURSIVE pairs AS MATERIALIZED (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, a.l_orderkey
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    e AS MATERIALIZED (
        SELECT pa, pb FROM pairs GROUP BY pa, pb
        HAVING count(DISTINCT l_orderkey) >= 2
    ),
    sym AS MATERIALIZED (
        SELECT pa AS a, pb AS b FROM e UNION SELECT pb, pa FROM e
    ),
    peel AS (
        SELECT 0 AS r, a, b FROM sym
        UNION ALL
        SELECT p.r + 1, p.a, p.b
        FROM peel p
        WHERE p.a IN (SELECT a FROM peel q WHERE q.r = p.r GROUP BY a HAVING count(*) >= 3)
          AND p.b IN (SELECT a FROM peel q WHERE q.r = p.r GROUP BY a HAVING count(*) >= 3)
          AND EXISTS (SELECT 1 FROM peel q WHERE q.r = p.r GROUP BY q.a HAVING count(*) < 3)
          AND p.r < 100
    ),
    last AS (SELECT max(r) AS mr FROM peel),
    last_round AS (SELECT p.a FROM peel p, last WHERE p.r = last.mr)
    -- the recursion emits a round only while a weak node remains, so when
    -- the whole graph peels away the LAST EMITTED round still contains
    -- weak nodes and is NOT the fixpoint: the true k-core is empty then
    SELECT CAST(a AS BIGINT) AS node, CAST(count(*) AS BIGINT) AS core_degree
    FROM last_round
    WHERE NOT EXISTS (SELECT 1 FROM last_round GROUP BY a HAVING count(*) < 3)
    GROUP BY a
    """,
)
def part_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the co-purchase graph: the sub-network where every part
    keeps ≥3 surviving co-purchase partners after all weakly-connected
    parts are peeled away — the dense 'frequently bought together'
    backbone (operators/graph.k_core: parallel peeling, one degree
    aggregate + two anti-joins per round, scalar-only driver traffic).
    The oracle peels the same edge set with a recursive CTE that emits a
    round only while a weak node remains."""
    from .operators.graph import k_core

    # single-split fixture scan: without the spread the broadcast self-join's
    # stream side (fact rows -> pair rows) runs as ONE task (round 13);
    # no-op at deployment scale where the scan has >= core-count splits
    li = spread_small_input(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"),
        "l_orderkey",
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count_distinct("l_orderkey").alias("_s"))
        .filter(F.col("_s") >= 2)
        .select("pa", "pb")
    )
    return k_core(edges, k=3, src="pa", dst="pb")


@query(
    "ab_test_report",
    oracle="""
    WITH assigned AS (
        SELECT event_type, value,
               CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant
        FROM events
    ),
    stats AS (
        SELECT event_type,
               CAST(count(*) FILTER (variant = 'A') AS BIGINT) AS n_a,
               CAST(count(*) FILTER (variant = 'B') AS BIGINT) AS n_b,
               avg(value) FILTER (variant = 'A') AS mean_a,
               avg(value) FILTER (variant = 'B') AS mean_b,
               var_samp(value) FILTER (variant = 'A') AS var_a,
               var_samp(value) FILTER (variant = 'B') AS var_b
        FROM assigned GROUP BY event_type
    )
    SELECT event_type, n_a, n_b,
           round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
           round((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b), 4) AS welch_t,
           round(pow(var_a / n_a + var_b / n_b, 2)
                 / (pow(var_a / n_a, 2) / (n_a - 1) + pow(var_b / n_b, 2) / (n_b - 1)), 2) AS welch_df
    FROM stats
    """,
)
def ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout per event type: deterministic variant
    assignment (user_id parity — in production, the hash-bucket split
    `sampling.stable_split` provides), Welch's unequal-variance t
    statistic and Welch–Satterthwaite degrees of freedom from one
    conditional-aggregate pass. ONE shuffle carrying per-(type) moment
    tuples; no per-variant scans."""
    ev = load_table(spark, sf_dir, "events")
    a_ = F.col("user_id") % 2 == 0
    agg = ev.groupBy("event_type").agg(
        F.sum(F.when(a_, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(~a_, 1).otherwise(0)).cast("long").alias("n_b"),
        F.avg(F.when(a_, F.col("value"))).alias("_ma"),
        F.avg(F.when(~a_, F.col("value"))).alias("_mb"),
        F.var_samp(F.when(a_, F.col("value"))).alias("_va"),
        F.var_samp(F.when(~a_, F.col("value"))).alias("_vb"),
    )
    se2 = F.col("_va") / F.col("n_a") + F.col("_vb") / F.col("n_b")
    df_w = F.pow(se2, 2) / (
        F.pow(F.col("_va") / F.col("n_a"), 2) / (F.col("n_a") - 1)
        + F.pow(F.col("_vb") / F.col("n_b"), 2) / (F.col("n_b") - 1)
    )
    return agg.select(
        "event_type", "n_a", "n_b",
        F.round("_ma", 6).alias("mean_a"),
        F.round("_mb", 6).alias("mean_b"),
        F.round((F.col("_ma") - F.col("_mb")) / F.sqrt(se2), 4).alias("welch_t"),
        F.round(df_w, 2).alias("welch_df"),
    )


@query(
    "seasonal_naive_mae",
    oracle="""
    WITH weekly AS (
        SELECT event_type, date_trunc('week', ts) AS wk,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    lagged AS (
        SELECT event_type, wk, c,
               lag(c) OVER (PARTITION BY event_type ORDER BY wk) AS prev
        FROM weekly
    )
    SELECT event_type,
           CAST(count(prev) AS BIGINT) AS n_forecasts,
           round(avg(abs(c - prev)), 4) AS mae,
           round(avg(abs(c - prev) / greatest(c, 1)), 6) AS mape
    FROM lagged GROUP BY event_type
    """,
)
def seasonal_naive_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline evaluation: the seasonal-naive predictor (next
    week = this week) scored per event type with MAE and MAPE over the
    weekly series — the sanity bar every real forecasting model must
    beat. Weekly pre-aggregation first, so the lag window runs over the
    tiny (type, week) frame, never raw events."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    weekly = ev.groupBy(
        "event_type", F.date_trunc("week", F.col("ts")).alias("wk")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = Window.partitionBy("event_type").orderBy("wk")
    lagged = weekly.withColumn("prev", F.lag("c").over(w))
    return lagged.groupBy("event_type").agg(
        F.count("prev").cast("long").alias("n_forecasts"),
        F.round(F.avg(F.abs(F.col("c") - F.col("prev"))), 4).alias("mae"),
        F.round(
            F.avg(F.abs(F.col("c") - F.col("prev")) / F.greatest(F.col("c"), F.lit(1))), 6
        ).alias("mape"),
    )


@query(
    "langid_confusion",
    oracle="""
    WITH s AS (
        SELECT lang,
               len(regexp_extract_all(lower(text), '\\b(spark|query|shuffle|partition|window)\\b')) AS s1,
               len(regexp_extract_all(lower(text), '\\b(table|row|column|scan|join)\\b'))           AS s2,
               len(regexp_extract_all(lower(text), '\\b(the|a|value|data|fast)\\b'))                AS s3
        FROM documents
    )
    SELECT lang,
           CASE WHEN s1 >= s2 AND s1 >= s3 THEN 'sparkish'
                WHEN s2 >= s3 THEN 'dbish'
                ELSE 'plain' END AS lang_pred,
           CAST(count(*) AS BIGINT) AS n
    FROM s GROUP BY 1, 2
    """,
)
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-evaluation shape: the language-ID heuristic's confusion
    matrix against the labeled lang column — (label, prediction, count).
    One projection + one tiny groupBy; the eval pattern any in-pipeline
    classifier (quality gates, language routers) is monitored with."""
    docs = load_table(spark, sf_dir, "documents")
    from .queries_text import _LANG_PROFILES

    pred = X.add_language_id(docs, "text", profiles=_LANG_PROFILES)
    return pred.groupBy("lang", "lang_pred").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


@query(
    "column_entropy",
    oracle="""
    WITH cols AS (
        SELECT 'o_orderstatus' AS column_name, o_orderstatus AS v FROM orders
        UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders
        UNION ALL SELECT 'c_mktsegment', c_mktsegment FROM customer
        UNION ALL SELECT 'lang', lang FROM documents
    ),
    freq AS (
        SELECT column_name, v, count(*)::DOUBLE AS c FROM cols GROUP BY 1, 2
    ),
    tot AS (SELECT column_name, sum(c) AS n FROM freq GROUP BY 1)
    SELECT f.column_name,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(-sum((f.c / t.n) * log2(f.c / t.n)), 6) AS entropy_bits,
           round(-sum((f.c / t.n) * log2(f.c / t.n)) / log2(greatest(count(*), 2)), 6) AS normalized
    FROM freq f JOIN tot t USING (column_name)
    GROUP BY f.column_name
    """,
)
def column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profiling: Shannon entropy (and entropy normalized by log2 of the
    distinct count) for categorical columns across tables — the
    feature-informativeness / drift-sensitivity signal. Each column costs
    one partial-aggregating groupBy over (column, value); the entropy
    fold runs on the tiny frequency frame."""
    def col_freq(df: DataFrame, table_col: str, name: str) -> DataFrame:
        return df.select(F.lit(name).alias("column_name"), F.col(table_col).alias("v"))

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    docs = load_table(spark, sf_dir, "documents")
    cols = (
        col_freq(orders, "o_orderstatus", "o_orderstatus")
        .unionByName(col_freq(orders, "o_orderpriority", "o_orderpriority"))
        .unionByName(col_freq(cust, "c_mktsegment", "c_mktsegment"))
        .unionByName(col_freq(docs, "lang", "lang"))
    )
    freq = cols.groupBy("column_name", "v").agg(F.count(F.lit(1)).cast("double").alias("c"))
    tot = freq.groupBy("column_name").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    ent = -F.sum(p * F.log2(p))
    return (
        freq.join(F.broadcast(tot), "column_name")
        .groupBy("column_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.round(ent, 6).alias("entropy_bits"),
            F.round(
                ent / F.log2(F.greatest(F.count(F.lit(1)), F.lit(2))), 6
            ).alias("normalized"),
        )
    )


@query(
    "peak_open_orders",
    oracle="""
    WITH spans AS (
        SELECT o.o_orderkey, o.o_orderdate AS opened,
               max(l.l_shipdate) AS closed
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderkey, o.o_orderdate
        HAVING max(l.l_shipdate) > o.o_orderdate
    ),
    deltas AS (
        SELECT opened AS ts, 1 AS d FROM spans
        UNION ALL
        SELECT closed, -1 FROM spans
    ),
    agg AS (SELECT ts, CAST(sum(d) AS BIGINT) AS d FROM deltas GROUP BY ts),
    run AS (
        SELECT ts, sum(d) OVER (ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open
        FROM agg
    )
    SELECT date_trunc('month', ts) AS month,
           CAST(max(open) AS BIGINT) AS peak_open,
           CAST(count(*) AS BIGINT) AS n_events
    FROM run GROUP BY 1
    """,
)
def peak_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency by interval sweep — the 'max simultaneous open
    orders/sessions/connections' shape: each order is open from its order
    date to its last line-item ship date; +1/−1 deltas at the endpoints,
    PRE-AGGREGATED per distinct timestamp (the running sum then scans
    the tiny distinct-timestamp frame, not raw endpoints), cumulative sum
    for the live count, max per month. Same-timestamp opens and closes
    net out in the per-ts aggregate, so the sweep is order-independent
    and engine-portable.

    The cumulative sweep is relational.two_stage_cumsum (VERDICT r6 #1) —
    date-range subgroups cumsum in parallel behind broadcast prefix
    offsets, so even second-granularity event streams (distinct-ts frames
    of ~1e8 rows at 100 TB) never funnel through a single-partition
    window. Deltas are integers, so the two-stage sum is exact regardless
    of addition order."""
    from .operators.relational import two_stage_cumsum

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spans = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("closed"))
        .filter(F.col("closed") > F.col("o_orderdate"))
    )
    deltas = spans.select(F.col("o_orderdate").alias("ts"), F.lit(1).alias("d")).unionByName(
        spans.select(F.col("closed").alias("ts"), F.lit(-1).alias("d"))
    )
    agg = (
        deltas.groupBy("ts").agg(F.sum("d").cast("long").alias("d"))
        # micros-since-epoch twin: two_stage_cumsum range-groups on a
        # numeric key; injective per distinct ts down to microsecond
        # granularity (and exact in the sketch's double cast until ~2250)
        .withColumn("_tsn", F.unix_micros(F.col("ts")))
        .localCheckpoint(eager=True)  # cut-point sketch + cumsum read it twice
    )
    run = two_stage_cumsum(agg, "_tsn", ["d"]).withColumnRenamed("cum_d", "open")
    return run.groupBy(F.date_trunc("month", F.col("ts")).alias("month")).agg(
        F.max("open").cast("long").alias("peak_open"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


@query(
    "revenue_gini",
    oracle="""
    WITH cust_rev AS (
        SELECT c.c_nationkey, o.o_custkey, round(sum(o.o_totalprice), 2) AS rev
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey, o.o_custkey
    ),
    ranked AS (
        SELECT c_nationkey, rev,
               row_number() OVER (PARTITION BY c_nationkey ORDER BY rev, o_custkey) AS i,
               count(*) OVER (PARTITION BY c_nationkey) AS n,
               sum(rev) OVER (PARTITION BY c_nationkey) AS tot
        FROM cust_rev
    )
    SELECT CAST(c_nationkey AS INTEGER) AS c_nationkey,
           CAST(max(n) AS BIGINT) AS n_customers,
           round(max(tot), 2) AS total_revenue,
           round(2.0 * sum(i * rev) / (max(n) * max(tot)) - (max(n) + 1.0) / max(n), 6) AS gini
    FROM ranked GROUP BY c_nationkey
    """,
)
def revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration per nation as the Gini coefficient, closed
    form over rank-weighted sums: G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n with a
    (rev, custkey) total order pinning ties. One aggregate to per-customer
    revenue, one window pass over it — the inequality/concentration
    diagnostic (whale-customer risk, data-source dominance) with no
    quantile sketching. The per-nation rank comes from
    relational.two_stage_rank (global revenue-range subgroups + offset
    join), so parallelism is nations × range-groups, not the 25-nation
    ceiling of a plain PARTITION BY nation window."""
    from .operators.relational import two_stage_rank

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cust_rev = (
        orders.join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
                    orders["o_custkey"] == F.col("c_custkey"))
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
        .localCheckpoint(eager=False)  # sketch + counts + rank read it 3x
    )
    ranked = two_stage_rank(cust_rev, "rev", partition_by=("c_nationkey",),
                            tiebreak=("o_custkey",), out_col="i")
    return ranked.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.round(F.sum("rev"), 2).alias("total_revenue"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("rev")) / (F.count(F.lit(1)) * F.sum("rev"))
            - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    ).withColumn("c_nationkey", F.col("c_nationkey").cast("int"))


@query(
    "acctbal_percent_rank",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           round(c_acctbal, 2) AS c_acctbal,
           round(percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal), 6) AS pct_rank,
           round(cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal), 6) AS cume_dist
    FROM customer
    """,
)
def acctbal_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-position analytics: percent_rank and cume_dist per
    market segment. Ties share a rank in both functions, so no tiebreak
    column is needed for determinism — one window over one segment-keyed
    shuffle. (Deriving an at-or-below COUNT as cume_dist·n truncates
    differently across engines in the last ulp; report the ratio.)"""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    return cust.select(
        "c_mktsegment", "c_custkey",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume_dist"),
    )


@query(
    "second_largest_order",
    oracle="""
    WITH ranked AS (
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
               nth_value(o_orderkey, 2) OVER (
                   PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS second_key,
               nth_value(round(o_totalprice, 2), 2) OVER (
                   PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS second_price,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    )
    SELECT o_custkey, o_orderkey AS largest_key, price AS largest_price,
           second_key, second_price
    FROM ranked WHERE rn = 1
    """,
)
def second_largest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value with the full-partition frame: each customer's largest
    and second-largest order side by side (null second for single-order
    customers) — the runner-up/backup-choice analytic; (price, key)
    compound ordering pins ties on both engines."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wr = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.select(
            "o_custkey", "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
            F.nth_value(F.round("o_totalprice", 2), 2).over(w).alias("second_price"),
            F.row_number().over(wr).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("largest_key"),
            F.col("price").alias("largest_price"),
            "second_key", "second_price",
        )
    )
