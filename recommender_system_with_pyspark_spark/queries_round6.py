"""Round-6 query registrations: operational diagnostics, source/sink
coverage, and an oracle-checked iterative clustering — each with a DuckDB
oracle (registry.py contract).

- ``key_skew_report_*`` — shuffle-key skew diagnostics (operators/quality).
- ``jsonl_roundtrip_orders`` — JSON-lines sink + source coverage: data must
  survive parquet → JSONL → DataFrame intact.
- ``kmeans_embeddings`` — Lloyd's k-means with deterministic hash-seeded
  init and per-iteration centroid rounding, which is what makes a
  fixed-iteration run of an ITERATIVE algorithm engine-portable enough to
  oracle-check (the centroid quantization kills cross-engine float-sum
  drift before it can flip an assignment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import load_table
from .registry import query

def _kmeans_oracle(k: int = 8, iters: int = 2, seed: int = 1) -> str:
    """Fixed-iteration Lloyd's k-means unrolled in plain SQL (the pagerank
    trick): hash-seeded init, per-(vec, center) squared-L2 with the same
    element order as the Spark fold, DECIMAL(38,28) exact sums + round-to-6
    centroids each iteration so both engines walk identical trajectories.
    Empty clusters keep their previous centroid (COALESCE on a LEFT JOIN),
    mirroring the operator."""
    dist = ("list_sum(list_transform(list_zip(e.v, c.ctr), "
            "p -> (p[1] - p[2]) * (p[1] - p[2])))")
    sql = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c0 AS (
        SELECT rn - 1 AS c, list_transform(v, x -> round(x, 6)) AS ctr
        FROM (
            SELECT vec_id, v,
                   row_number() OVER (
                       ORDER BY md5(concat('{seed}|', vec_id::VARCHAR)), vec_id
                   ) AS rn
            FROM e
        ) WHERE rn <= {k}
    )"""
    for i in range(1, iters + 1):
        sql += f""",
    a{i} AS (
        SELECT vec_id, v, c FROM (
            SELECT e.vec_id, e.v, c.c,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {dist}, c.c) AS rk
            FROM e CROSS JOIN c{i - 1} c
        ) WHERE rk = 1
    ),
    u{i} AS (
        SELECT c, list(m ORDER BY pos) AS ctr FROM (
            SELECT c, pos,
                   round(CAST(sum(CAST(val AS DECIMAL(38, 28))) AS DOUBLE)
                         / count(*), 6) AS m
            FROM (SELECT c, unnest(v) AS val, generate_subscripts(v, 1) AS pos
                  FROM a{i})
            GROUP BY c, pos
        ) GROUP BY c
    ),
    c{i} AS (
        SELECT p.c, coalesce(u.ctr, p.ctr) AS ctr
        FROM c{i - 1} p LEFT JOIN u{i} u USING (c)
    )"""
    sql += f"""
    SELECT vec_id, CAST(c AS INTEGER) AS cluster FROM (
        SELECT e.vec_id, c.c,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dist}, c.c) AS rk
        FROM e CROSS JOIN c{iters} c
    ) WHERE rk = 1"""
    return sql


@query("kmeans_embeddings", oracle=_kmeans_oracle(k=8, iters=2, seed=1))
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (k=8, 2 fixed iterations) over the embeddings table
    — an ITERATIVE algorithm that hash-matches a SQL oracle, because the
    operator (operators/similarity.kmeans_lloyd) is built deterministic:
    hash-seeded init, quantized centroids per round, exact decimal sums,
    lowest-id tie-breaks. MLlib KMeans stays the production fit path; this
    is the engine-portable assignment twin."""
    from .operators.similarity import kmeans_lloyd

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_lloyd(emb, "vec_id", "embedding", k=8, iters=2, seed=1)


_SKEW_ORACLE = """
    WITH counts AS (
        SELECT {key} AS k, count(*) AS n FROM {table} GROUP BY {key}
    ),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(n) AS BIGINT) AS total_rows,
               CAST(max(n) AS BIGINT) AS max_count,
               round(quantile_cont(n::DOUBLE, 0.5), 6) AS p50_count,
               round(quantile_cont(n::DOUBLE, 0.99), 6) AS p99_count
        FROM counts
    ),
    heavy AS (
        SELECT k::VARCHAR AS heaviest_key FROM counts
        ORDER BY n DESC, k ASC LIMIT 1
    )
    SELECT n_keys, total_rows, max_count, p50_count, p99_count,
           round(max_count / (total_rows::DOUBLE / n_keys), 6) AS skew_ratio,
           heaviest_key
    FROM stats CROSS JOIN heavy
"""


@query("key_skew_report_orders",
       oracle=_SKEW_ORACLE.format(key="o_custkey", table="orders"))
def key_skew_report_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fan-out diagnostics for keying work on orders.o_custkey — the
    check-before-you-shuffle report (operators/quality.key_skew_report)."""
    from .operators.quality import key_skew_report

    return key_skew_report(load_table(spark, sf_dir, "orders"), "o_custkey")


@query("key_skew_report_events",
       oracle=_SKEW_ORACLE.format(key="user_id", table="events"))
def key_skew_report_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same report on the behavioral stream's user key, where real skew
    (bot/whale users) actually shows up."""
    from .operators.quality import key_skew_report

    return key_skew_report(load_table(spark, sf_dir, "events"), "user_id")


@query(
    "jsonl_roundtrip_orders",
    oracle="""
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders
    """,
)
def jsonl_roundtrip_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + source coverage: write orders to JSONL, read it
    back, and the oracle checks the roundtrip against the parquet original
    — types, values, row count. Dates travel as ISO strings (JSON has no
    date type; pinning the format makes the roundtrip engine-portable).

    Scale shape: both directions are parallel whole-file-free line IO
    (one output file per task, splittable line reads back); JSONL costs
    ~3-5x parquet in bytes and loses column pruning — the right role at
    100 TB is interchange at the edges, parquet inside, which is exactly
    what this query demonstrates."""
    import tempfile

    from .io import read_jsonl, write_jsonl

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("totalprice"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
    )
    path = tempfile.mkdtemp(prefix="spark-jsonl-roundtrip-")
    write_jsonl(orders, path)
    back = read_jsonl(spark, path)
    return back.select(
        F.col("o_orderkey").cast("long"),
        "o_orderstatus",
        F.col("totalprice").cast("double"),
        "orderdate",
    )


@query(
    "topk_events_per_user_skewsafe",
    oracle="""
    SELECT user_id, event_id, round(value, 2) AS value, CAST(rk AS INTEGER) AS rank
    FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY value DESC, event_id) AS rk
        FROM events
    ) WHERE rk <= 3
    """,
)
def topk_events_per_user_skewsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value per user through relational.two_stage_topk —
    the skew-safe twin of the plain window top-k: stage 1 ranks within
    (user, salt) and keeps ≤ k per slice, stage 2 re-ranks the bounded
    survivors, so a bot user with 10^9 events costs n_salts parallel sorts
    instead of one hot reducer. Top-k commutes over row partitions, so the
    oracle is the plain window form."""
    from .operators.relational import two_stage_topk

    ev = load_table(spark, sf_dir, "events")
    out = two_stage_topk(ev, "user_id", "value", k=3,
                         tie_breaker="event_id", rank_col="rank")
    return out.select(
        "user_id", "event_id",
        F.round("value", 2).alias("value"),
        F.col("rank").cast("int").alias("rank"),
    )


_DIFF_NEW_SQL = """
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 10 = 0
                    THEN round(o_totalprice + 10, 2)
                    ELSE round(o_totalprice, 2) END AS o_totalprice,
               o_orderstatus
        FROM orders WHERE o_orderkey % 97 != 0
        UNION ALL
        SELECT o_orderkey + 10000000000, round(o_totalprice, 2), o_orderstatus
        FROM orders WHERE o_orderkey % 101 = 0
"""


@query(
    "orders_snapshot_diff",
    oracle=f"""
    WITH old AS (
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderstatus
        FROM orders
    ),
    new AS ({_DIFF_NEW_SQL}),
    j AS (
        SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               (o.o_orderkey IS NULL) AS added,
               (n.o_orderkey IS NULL) AS removed,
               (CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 1 ELSE 0 END
                + CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus THEN 1 ELSE 0 END)
                   AS nc
        FROM old o FULL OUTER JOIN new n USING (o_orderkey)
    )
    SELECT o_orderkey,
           CASE WHEN added THEN 'added' WHEN removed THEN 'removed'
                ELSE 'changed' END AS status,
           CAST(CASE WHEN added OR removed THEN 0 ELSE nc END AS INTEGER)
               AS n_cols_changed
    FROM j WHERE added OR removed OR nc > 0
    """,
)
def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed snapshot diff (operators/quality.snapshot_diff) between the
    orders table and a deterministically churned rebuild of it (~10% price
    changes, ~1% removals, ~1% key additions) — emits added/removed/changed
    keys only, the pre-publish gate for periodic dataset rebuilds."""
    from .operators.quality import snapshot_diff

    orders = load_table(spark, sf_dir, "orders")
    old = orders.select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "o_orderstatus"
    )
    new = (
        old.filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 10 == 0,
                   F.round(F.col("o_totalprice") + 10, 2))
            .otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            old.filter(F.col("o_orderkey") % 101 == 0)
            .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(10_000_000_000))
        )
    )
    return snapshot_diff(old, new, ["o_orderkey"],
                         ["o_totalprice", "o_orderstatus"])


@query(
    "ks_drift_events",
    oracle="""
    WITH pts AS (
        SELECT value AS v,
               CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS a,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS b
        FROM events WHERE event_type IN ('view', 'purchase')
          AND value IS NOT NULL  -- twin of the operator's NULL drop
    ),
    g AS (SELECT v, CAST(sum(a) AS BIGINT) AS a, CAST(sum(b) AS BIGINT) AS b
          FROM pts GROUP BY v),
    t AS (SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb
          FROM g),
    c AS (SELECT sum(a) OVER (ORDER BY v) AS ca,
                 sum(b) OVER (ORDER BY v) AS cb
          FROM g)
    SELECT round(max(abs(ca::DOUBLE / na - cb::DOUBLE / nb)), 6) AS ks_stat,
           CAST(max(na) AS BIGINT) AS n_baseline,
           CAST(max(nb) AS BIGINT) AS n_current
    FROM c CROSS JOIN t
    """,
)
def ks_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic between 'view' and
    'purchase' event values (operators/drift.ks_statistic) — the
    binning-free complement to PSI. The distributed ECDF comes from
    relational.two_stage_cumsum (value-range subgroup cumsums + broadcast
    prefix offsets), so unlike the textbook `SUM() OVER (ORDER BY v)`
    there is no single-partition window anywhere in the plan; the oracle
    IS that textbook form, which DuckDB can afford at oracle scale."""
    from .operators.drift import ks_statistic

    ev = load_table(spark, sf_dir, "events")
    return ks_statistic(ev, "value", "event_type", "view", "purchase")


@query(
    "funnel_conversion",
    oracle="""
    WITH s1 AS (
        SELECT user_id, min(ts) AS t FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, min(e.ts) AS t
        FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, min(e.ts) AS t
        FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    n AS (SELECT (SELECT count(*) FROM s1) AS n1,
                 (SELECT count(*) FROM s2) AS n2,
                 (SELECT count(*) FROM s3) AS n3)
    SELECT * FROM (
        SELECT 1 AS step, 'view' AS event_type, CAST(n1 AS BIGINT) AS users,
               1.0 AS conv_from_prev, 1.0 AS conv_from_first FROM n
        UNION ALL
        SELECT 2, 'click', CAST(n2 AS BIGINT),
               round(n2 / n1::DOUBLE, 6), round(n2 / n1::DOUBLE, 6) FROM n
        UNION ALL
        SELECT 3, 'purchase', CAST(n3 AS BIGINT),
               round(n3 / n2::DOUBLE, 6), round(n3 / n1::DOUBLE, 6) FROM n
    ) ORDER BY step
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch ordered funnel view → click → purchase over the event
    stream (operators/temporal.funnel): step i counts users whose earliest
    step-i event falls STRICTLY AFTER their earliest qualifying step-(i−1)
    time. k−1 user-keyed joins over shrinking frames, type filters pushed
    to the scan."""
    from .operators.temporal import funnel

    ev = load_table(spark, sf_dir, "events")
    out = funnel(ev, "user_id", "ts", "event_type",
                 ["view", "click", "purchase"])
    return out.withColumn(
        "conv_from_prev",
        F.when(F.col("step") == 1, F.lit(1.0)).otherwise(F.col("conv_from_prev")),
    ).withColumn(
        "conv_from_first",
        F.when(F.col("step") == 1, F.lit(1.0)).otherwise(F.col("conv_from_first")),
    )


_MIX_SHARES = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
_MIX_BUDGET = 12_000


@query(
    "mixture_sample_documents",
    oracle=f"""
    WITH rates AS (
        SELECT source,
               CAST(floor(least(
                   1.0,
                   CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.3
                               WHEN 'src2' THEN 0.2 ELSE 0.0 END
                   * {_MIX_BUDGET} / sum(n_chars::DOUBLE)
               ) * 4294967296.0) AS BIGINT) AS thr
        FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.source, CAST(d.n_chars AS BIGINT) AS n_chars
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE ('0x' || substr(md5(d.doc_id::VARCHAR || ':7'), 1, 8))::BIGINT < r.thr
    """,
)
def mixture_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mixture sampling (operators/sampling.mixture_sample): pick
    documents so src0/src1/src2 contribute ~50/30/20% of a 12k-char
    budget, all other sources dropped. Selection is a pure function of
    (doc_id, seed, per-source totals) — partitioning-invariant,
    engine-portable (the oracle reproduces the exact md5-threshold choice),
    one scan + one broadcast join at any scale."""
    from .operators.sampling import mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    out = mixture_sample(docs, "source", "n_chars", _MIX_SHARES,
                         _MIX_BUDGET, seed=7, id_col="doc_id")
    return out.select("doc_id", "source", F.col("n_chars").cast("long"))


@query(
    "zorder_box_read",
    oracle="""
    SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS o_custkey,
           round(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE o_custkey BETWEEN 100 AND 400
      AND o_totalprice BETWEEN 50000 AND 120000
    """,
)
def zorder_box_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered write + 2-D box read (operators/layout): orders is
    rewritten clustered on the Morton key of (o_custkey, o_totalprice), so
    each output file covers a small rectangle of that space and a
    conjunctive range predicate on EITHER OR BOTH columns prunes most
    files from their footers alone (measured in tests/test_layout.py:
    the same box touches ~4x fewer files than a one-column sort layout).
    The oracle checks the content contract: clustering must change bytes
    read, never results."""
    import tempfile

    from .operators.layout import zorder_write

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    path = tempfile.mkdtemp(prefix="spark-zorder-orders-")
    zorder_write(orders, ["o_custkey", "o_totalprice"], path, n_files=32)
    back = spark.read.parquet(path)
    return back.filter(
        F.col("o_custkey").between(100, 400)
        & F.col("o_totalprice").between(50000, 120000)
    ).select("o_orderkey", F.col("o_custkey").cast("long"), "o_totalprice")


@query(
    "cross_split_leakage",
    oracle="""
    WITH s AS (
        SELECT doc_id,
               list_distinct(
                 list_transform(
                   range(1, greatest(len(string_split_regex(trim(lower(text)), '\\s+')) - 3, 0) + 2),
                   i -> array_to_string(list_slice(string_split_regex(trim(lower(text)), '\\s+'), i, i + 2), ' ')
                 )
               ) AS sh
        FROM documents
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(len(list_intersect(a.sh, b.sh))::DOUBLE
                     / greatest(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)), 1), 6) AS jaccard
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
              / greatest(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)), 1) >= 0.5
    ),
    sp AS (
        SELECT doc_id,
               CASE WHEN ('0x' || substr(md5(doc_id || ':42'), 1, 8))::BIGINT < 3435973836
                    THEN 'train'
                    WHEN ('0x' || substr(md5(doc_id || ':42'), 1, 8))::BIGINT < 3865470566
                    THEN 'val' ELSE 'test' END AS split
        FROM documents
    )
    SELECT p.id_a, p.id_b, p.jaccard, sa.split AS split_a, sb.split AS split_b
    FROM pairs p
    JOIN sp sa ON p.id_a = sa.doc_id
    JOIN sp sb ON p.id_b = sb.doc_id
    WHERE sa.split != sb.split
    """,
)
def cross_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination audit: near-duplicate pairs (MinHash-LSH,
    same full-recall 32-perm/8-band config as `minhash_near_dup`) that
    STRADDLE the deterministic 80/10/10 split (`stable_split`, seed 42) —
    each row is an eval document whose near-twin sits in another split,
    i.e. a leak that silently inflates held-out metrics.

    Composition of two already-oracle-checked pieces, and the fix for the
    subtle footgun of doc-level random splits: random splitting i.i.d. over
    documents IGNORES the near-duplicate structure, so ~20% of every dup
    cluster's members land outside train. The scale path dedups or
    cluster-assigns BEFORE splitting; this query is the detector that
    proves you needed to. One banded candidate join + two broadcast-ready
    keyed joins against the split map — no all-pairs work at any scale."""
    from .operators import dedup as D
    from .operators import sampling as SA

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_near_dup(docs, "text", "doc_id", threshold=0.5,
                               num_perm=32, bands=8, shingle_n=3)
    split = SA.stable_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed=42
    ).select("doc_id", "split")
    return (
        pairs.join(split.withColumnRenamed("doc_id", "id_a")
                        .withColumnRenamed("split", "split_a"), "id_a")
        .join(split.withColumnRenamed("doc_id", "id_b")
                   .withColumnRenamed("split", "split_b"), "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "jaccard", "split_a", "split_b")
    )
