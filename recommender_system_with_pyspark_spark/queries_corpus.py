"""Round-4 corpus-curation & analytics query surface: keyword extraction,
corpus-LM quality scoring (unigram + bigram), co-occurrence
recommendations, drift monitoring (PSI), deterministic weighted sampling,
token-budget selection, join-key skew auditing, cohort retention, RFM
segmentation, MAD robust outliers, cross-language vocabulary overlap, and
tokenizer-shaped (BPE-ish) token counting. Every query here is
DuckDB-oracle hash-checked.

These extend the reference's recommendation/data-prep domain (SURVEY §2.9
north-star note): the reference recommends games from ratings
(`PySpark Scripts/als.py`); `related_parts` is the same product-association
task done with pure relational co-occurrence, and the corpus ops are what
its data-cleaning stage (`datacleaning.py`) would need at web scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import load_table
from .operators import drift as DR
from .operators import relational as R
from .operators import sampling as SA
from .operators import text as X
from .registry import query

_TOKENS_SQL = "string_split_regex(trim(lower(text)), '\\s+')"


@query(
    "idf_keywords",
    oracle=f"""
    WITH ex AS (
        SELECT doc_id, unnest(list_distinct({_TOKENS_SQL})) AS token
        FROM documents
    ),
    dfreq AS (SELECT token, count(*) AS df FROM ex GROUP BY token),
    ranked AS (
        SELECT e.doc_id, e.token, d.df,
               row_number() OVER (PARTITION BY e.doc_id ORDER BY d.df, e.token) AS rank
        FROM ex e JOIN dfreq d USING (token)
    )
    SELECT doc_id, CAST(rank AS INTEGER) AS rank, token, CAST(df AS BIGINT) AS df
    FROM ranked WHERE rank <= 3
    """,
)
def idf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each document's 3 rarest tokens by corpus document-frequency —
    broadcast vocab join + per-doc top-k window (operators/text.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return X.idf_keywords(docs, "text", "doc_id", k=3)


@query(
    "unigram_logprob",
    oracle=f"""
    WITH ex AS (
        SELECT doc_id, unnest({_TOKENS_SQL}) AS token FROM documents
    ),
    vocab AS (SELECT token, count(*) AS tf FROM ex GROUP BY token),
    tot AS (SELECT sum(tf)::DOUBLE AS n_total FROM vocab),
    per_doc AS (SELECT doc_id, token, count(*) AS c FROM ex GROUP BY doc_id, token)
    SELECT d.doc_id,
           CAST(sum(d.c) AS INTEGER) AS n_tokens,
           round(sum(d.c * ln(v.tf / t.n_total)) / sum(d.c), 6) AS avg_logprob
    FROM per_doc d JOIN vocab v USING (token) CROSS JOIN tot t
    GROUP BY d.doc_id
    """,
)
def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean unigram log-probability per document under the corpus's own
    unigram LM — perplexity-style quality scoring without a model."""
    docs = load_table(spark, sf_dir, "documents")
    return X.unigram_logprob(docs, "text", "doc_id", round_to=6)


@query(
    "related_parts",
    oracle="""
    WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
    pairs AS (
        SELECT a.i AS item, b.i AS other, count(*) AS n_baskets
        FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
        GROUP BY a.i, b.i
    ),
    sym AS (
        SELECT item, other, n_baskets FROM pairs
        UNION ALL
        SELECT other, item, n_baskets FROM pairs
    ),
    ranked AS (
        SELECT item, other, n_baskets,
               row_number() OVER (PARTITION BY item
                                  ORDER BY n_baskets DESC, other) AS rank
        FROM sym
    )
    SELECT CAST(item AS BIGINT) AS item, CAST(other AS BIGINT) AS other,
           CAST(n_baskets AS BIGINT) AS n_baskets, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 3
    """,
)
def related_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Bought-with" co-occurrence top-3 per part from order baskets — the
    relational sibling of the ALS flagship (operators/relational.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    return R.cooccurrence_topk(li, "l_orderkey", "l_partkey", k=3)


@query(
    "psi_value_drift",
    oracle="""
    WITH rng AS (
        SELECT min(value)::DOUBLE AS vmin, max(value)::DOUBLE AS vmax,
               (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid_us
        FROM events
    ),
    bucketed AS (
        SELECT e.event_type,
               CASE WHEN epoch_us(e.ts) >= r.mid_us THEN 'late' ELSE 'early' END AS cohort,
               least(9, greatest(0, floor((e.value - r.vmin)
                     / ((r.vmax - r.vmin) / 10.0))::INT)) AS bucket
        FROM events e CROSS JOIN rng r
    ),
    counts AS (
        SELECT event_type, bucket,
               sum(CASE WHEN cohort = 'early' THEN 1 ELSE 0 END) AS c_p,
               sum(CASE WHEN cohort = 'late' THEN 1 ELSE 0 END) AS c_q
        FROM bucketed GROUP BY event_type, bucket
    ),
    totals AS (
        SELECT event_type, sum(c_p) AS tot_p, sum(c_q) AS tot_q
        FROM counts GROUP BY event_type
    )
    SELECT c.event_type,
           round(sum(((c.c_p + 1) / (t.tot_p + 10.0) - (c.c_q + 1) / (t.tot_q + 10.0))
                 * ln(((c.c_p + 1) / (t.tot_p + 10.0))
                      / ((c.c_q + 1) / (t.tot_q + 10.0)))), 6) AS psi,
           CAST(min(t.tot_p) AS BIGINT) AS n_baseline,
           CAST(min(t.tot_q) AS BIGINT) AS n_current
    FROM counts c JOIN totals t USING (event_type)
    GROUP BY c.event_type
    """,
)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of event values, first half of the time
    range vs second half, per event type (operators/drift.py)."""
    ev = load_table(spark, sf_dir, "events")
    # ONE global aggregate serves both the cohort midpoint and the bucket
    # range (passed through range_df) — three separate scans otherwise.
    rng = ev.agg(
        ((F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts"))) / F.lit(2))
        .cast("long")
        .alias("_mid"),
        F.min("value").cast("double").alias("_vmin"),
        F.max("value").cast("double").alias("_vmax"),
    )
    cohorted = ev.crossJoin(F.broadcast(rng)).withColumn(
        "_cohort",
        F.when(F.unix_micros("ts") >= F.col("_mid"), "late").otherwise("early"),
    )
    return DR.population_stability(
        cohorted, "value", "_cohort", baseline="early", current="late",
        group_col="event_type", n_buckets=10, range_cols_present=True,
    )


@query(
    "weighted_sample",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, n_chars,
               round(-ln((('0x' || substr(md5(doc_id::VARCHAR || ':0'), 1, 8))::BIGINT
                          + 1.0) / 4294967296.0) / n_chars::DOUBLE, 6) AS sample_score
        FROM documents WHERE n_chars::DOUBLE > 0
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, sample_score
    FROM scored ORDER BY sample_score, doc_id LIMIT 20
    """,
)
def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Efraimidis–Spirakis weighted sample (k=20, weight =
    document length): −ln(u)/w with u from the md5 of the id, so the drawn
    set is reproducible across runs, partitionings, and engines."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return SA.weighted_sample_topk(docs, "doc_id", "n_chars", k=20, seed=0)


@query(
    "token_budget_corpus",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang,
               len({_TOKENS_SQL}) AS n_tokens,
               length(text) AS n_chars,
               len(regexp_extract_all(lower(text), '\\b(the|and|of|to|a|in|is)\\b')) AS sw_hits,
               length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS n_punct
        FROM documents
    ),
    scored AS (
        SELECT doc_id, lang, n_tokens,
               round(0.4 * least(n_chars / 500.0, 1.0)
             + 0.3 * greatest(0.0, 1.0 - (n_punct / greatest(n_chars, 1)::DOUBLE) * 5)
             + 0.3 * least((sw_hits / greatest(n_tokens, 1)::DOUBLE) * 4, 1.0), 6) AS q
        FROM t
    ),
    run AS (
        SELECT lang, n_tokens, q,
               sum(n_tokens) OVER (PARTITION BY lang ORDER BY q DESC, doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM scored
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs_kept,
           CAST(sum(n_tokens) AS BIGINT) AS tokens_kept,
           round(min(q), 6) AS min_quality_kept
    FROM run WHERE cum <= 2000
    GROUP BY lang
    """,
)
def token_budget_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy best-first corpus selection under a 2000-token budget per
    language: quality-ranked prefix by running token sum
    (operators/sampling.py token_budget_select)."""
    docs = load_table(spark, sf_dir, "documents")
    scored = X.add_quality_score(docs, "text")
    scored = scored.select(
        "doc_id", "lang", F.size(X.tokens("text")).alias("n_tokens"),
        F.round("quality", 6).alias("q"),
    )
    kept = SA.token_budget_select(
        scored, group_col="lang", order_col="q", id_col="doc_id",
        token_col="n_tokens", budget=2000,
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").cast("long").alias("tokens_kept"),
        F.round(F.min("q"), 6).alias("min_quality_kept"),
    )


@query(
    "join_key_skew",
    oracle="""
    WITH counts AS (
        SELECT o_custkey AS key, count(*) AS n_rows FROM orders GROUP BY o_custkey
    ),
    stats AS (SELECT sum(n_rows)::DOUBLE AS total, avg(n_rows) AS mean FROM counts)
    SELECT CAST(c.key AS BIGINT) AS key, CAST(c.n_rows AS BIGINT) AS n_rows,
           round(c.n_rows / s.total, 6) AS share,
           c.n_rows > 4.0 * s.mean AS skewed
    FROM counts c CROSS JOIN stats s
    ORDER BY c.n_rows DESC, c.key LIMIT 20
    """,
)
def join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join skew audit of orders.o_custkey: top-20 hottest keys with
    table share and a skew flag (> 4× mean) — the diagnostic that decides
    between a plain shuffle join, AQE skew-split, and salted_join."""
    orders = load_table(spark, sf_dir, "orders")
    return R.key_skew_audit(orders, "o_custkey", top=20, skew_factor=4.0)


@query(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               date_trunc('week', e.ts) AS activity_week
        FROM events e JOIN firsts f USING (user_id)
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', cohort_week, activity_week) // 7 AS INTEGER) AS week_index,
           CAST(count(*) AS BIGINT) AS n_active_users
    FROM activity
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users bucketed by first-seen week,
    counted once per (cohort, weeks-since-first) they were active in.

    Scale shape: one groupBy(user) for first-seen (user-cardinality
    output), joined back to events on user_id — at 100 TB the firsts table
    is users-sized; if that outgrows broadcast, the join co-partitions both
    sides on user_id, which the subsequent DISTINCT reuses (same key), so
    the fact table crosses the wire once."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.date_trunc("week", F.col("ts")).alias("activity_week"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        F.floor(
            F.datediff(F.to_date("activity_week"), F.to_date("cohort_week")) / 7
        ).cast("int").alias("week_index"),
    ).agg(F.count(F.lit(1)).alias("n_active_users"))


@query(
    "rfm_segments",
    oracle="""
    WITH anchor AS (SELECT max(o_orderdate) AS maxd FROM orders),
    per_cust AS (
        SELECT o_custkey,
               date_diff('day', max(o_orderdate), any_value(a.maxd)) AS recency_days,
               count(*) AS frequency,
               round(sum(o_totalprice), 2) AS monetary
        FROM orders CROSS JOIN anchor a
        GROUP BY o_custkey
    ),
    scored AS (
        SELECT o_custkey AS custkey, recency_days, frequency, monetary,
               ntile(4) OVER (ORDER BY recency_days, o_custkey) AS r,
               ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f,
               ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m
        FROM per_cust
    )
    SELECT CAST(custkey AS BIGINT) AS custkey,
           CAST(recency_days AS INTEGER) AS recency_days,
           CAST(frequency AS BIGINT) AS frequency, monetary,
           CAST(r AS INTEGER) AS r, CAST(f AS INTEGER) AS f, CAST(m AS INTEGER) AS m,
           CAST(r * 100 + f * 10 + m AS INTEGER) AS segment
    FROM scored
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency / frequency / monetary quartiles
    (ntile(4), key tiebreak so the quartile cut is total-ordered and
    engine-reproducible) composed into the classic 3-digit segment code.

    Scale shape: one map-side-combining groupBy(custkey) collapses orders
    to customer cardinality (localCheckpointed — three binning passes read
    it without re-aggregating orders); each quartile comes from
    cleaning.quantile_bins, the EXACT distributed ntile (sketch cut-point
    groups → per-group row_number → offset arithmetic), so no row flows
    through a single-partition window at any scale."""
    from .operators.cleaning import quantile_bins

    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("_maxd"))
    per_cust = (
        orders.crossJoin(F.broadcast(anchor))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.to_date(F.min("_maxd")), F.to_date(F.max("o_orderdate")))
            .cast("int")
            .alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
    )
    per_cust = per_cust.localCheckpoint(eager=True)
    scored = quantile_bins(per_cust, "recency_days", n_bins=4, out_col="r",
                           tiebreak=("o_custkey",))
    scored = quantile_bins(scored, "frequency", n_bins=4, out_col="f",
                           tiebreak=("o_custkey",), descending=True)
    scored = quantile_bins(scored, "monetary", n_bins=4, out_col="m",
                           tiebreak=("o_custkey",), descending=True)
    return scored.select(
        F.col("o_custkey").alias("custkey"),
        "recency_days", "frequency", "monetary", "r", "f", "m",
        (F.col("r") * 100 + F.col("f") * 10 + F.col("m")).cast("int").alias("segment"),
    )


@query(
    "bigram_logprob",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents),
    pairs AS (
        SELECT doc_id,
               unnest(t[1:len(t) - 1]) AS w1,
               unnest(t[2:len(t)]) AS w2
        FROM toks WHERE len(t) >= 2
    ),
    bigrams AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY w1, w2),
    ctx AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY w1),
    vocab AS (
        SELECT count(DISTINCT tok)::DOUBLE AS v
        FROM (SELECT unnest(t) AS tok FROM toks)
    ),
    per_doc AS (
        SELECT doc_id, w1, w2, count(*) AS c FROM pairs GROUP BY doc_id, w1, w2
    )
    SELECT d.doc_id,
           CAST(sum(d.c) AS INTEGER) AS n_bigrams,
           round(sum(d.c * ln((b.c12 + 0.5) / (x.c1 + 0.5 * vv.v))) / sum(d.c), 6)
               AS avg_bigram_logprob
    FROM per_doc d
    JOIN bigrams b USING (w1, w2)
    JOIN ctx x USING (w1)
    CROSS JOIN vocab vv
    GROUP BY d.doc_id
    """,
)
def bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-k-smoothed bigram-LM mean log-probability per document — the
    word-order-aware quality score (operators/text.py bigram_logprob)."""
    docs = load_table(spark, sf_dir, "documents")
    return X.bigram_logprob(docs, "text", "doc_id", k_smooth=0.5)


@query(
    "inverted_index_top100",
    oracle=f"""
    WITH ex AS (
        SELECT doc_id, unnest(list_distinct({_TOKENS_SQL})) AS token
        FROM documents
    ),
    idx AS (
        SELECT token, CAST(count(*) AS BIGINT) AS df,
               to_json(list_sort(list(doc_id))) AS postings_json
        FROM ex GROUP BY token
    ),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY df DESC, token) AS rk FROM idx
    )
    SELECT token, df, postings_json FROM ranked WHERE rk <= 100
    """,
)
def inverted_index_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting lists for the corpus's 100 most frequent tokens, lists
    JSON-serialized for engine-portable comparison
    (operators/text.py inverted_index)."""
    docs = load_table(spark, sf_dir, "documents")
    idx = X.inverted_index(docs, "text", "doc_id", top_tokens=100)
    return idx.select("token", "df", F.to_json("postings").alias("postings_json"))


_BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+"


@query(
    "bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INTEGER) AS n_ws_tokens,
           CAST(len(regexp_extract_all(lower(text),
                '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s'']+')) AS INTEGER)
               AS n_bpe_tokens,
           round(len(regexp_extract_all(lower(text),
                '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s'']+'))
                 / greatest(len(string_split_regex(trim(lower(text)), '\\s+')), 1)::DOUBLE, 6)
               AS bpe_per_word
    FROM documents
    """,
)
def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-shaped token counting: a GPT-2-style pre-tokenizer regex
    (contraction suffixes | space-prefixed letter runs | digit runs |
    punctuation runs) counted next to the whitespace count — the budget
    estimator for context-window packing when the real tokenizer isn't in
    the engine (the regex piece-count upper-bounds BPE's merge output).
    Pattern is RE2-and-Java-regex portable, so the count is reproducible
    outside Spark. Pure regexp_count projection — no explode, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    lowered = F.lower(F.col("text"))
    n_bpe = F.regexp_count(lowered, F.lit(_BPE_RE)).cast("int")
    n_ws = F.size(X.tokens("text")).cast("int")
    return docs.select(
        "doc_id",
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        F.round(n_bpe / F.greatest(n_ws, F.lit(1)), 6).alias("bpe_per_word"),
    )


@query(
    "mad_outliers",
    oracle="""
    WITH med AS (
        SELECT event_type, median(value) AS med FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.event_id, e.value, m.med,
               abs(e.value - m.med) AS adev
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type)
    SELECT d.event_id, d.event_type,
           round(d.value, 6) AS value,
           round(0.6744897501960817 * (d.value - d.med) / m.mad, 4) AS robust_z
    FROM dev d JOIN mad m USING (event_type)
    WHERE abs(0.6744897501960817 * (d.value - d.med) / m.mad) > 3.5
    """,
)
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-Absolute-Deviation robust outliers (|modified z| > 3.5,
    Iglewicz–Hoaglin 0.6745 consistency constant) — the heavy-tail-safe
    sibling of the IQR band and z-score filters: one exact-median
    aggregate per group, deviations joined back BROADCAST (group-cardinality
    stats), a second tiny median aggregate, then a pure-projection score.
    The fact table is scanned twice but never shuffled. At 100 TB swap the
    exact medians for approx_percentile and keep the same shape."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    z = F.lit(0.6744897501960817) * (F.col("value") - F.col("med")) / F.col("mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .withColumn("robust_z", F.round(z, 4))
        .filter(F.abs(z) > 3.5)
        .select("event_id", "event_type", F.round("value", 6).alias("value"), "robust_z")
    )


@query(
    "lang_vocab_overlap",
    oracle=f"""
    WITH v AS (
        SELECT lang, list_distinct(flatten(list({_TOKENS_SQL}))) AS vocab
        FROM documents GROUP BY lang
    )
    SELECT a.lang AS lang_a, b.lang AS lang_b,
           CAST(len(list_intersect(a.vocab, b.vocab)) AS BIGINT) AS shared,
           round(len(list_intersect(a.vocab, b.vocab))::DOUBLE
                 / greatest(len(a.vocab) + len(b.vocab)
                            - len(list_intersect(a.vocab, b.vocab)), 1), 6) AS jaccard
    FROM v a JOIN v b ON a.lang < b.lang
    """,
)
def lang_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between language partitions of the
    corpus — the contamination/mislabeling diagnostic (two 'languages'
    sharing most of their vocabulary means the lang-ID column lies).
    Vocab sets build as distinct (lang, token) pairs (map-side combine);
    the pair comparison joins vocab-sized rows, never documents."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select("lang", F.explode(F.array_distinct(X.tokens("text"))).alias("token"))
        .distinct()
        .groupBy("lang")
        .agg(F.collect_set("token").alias("vocab"))
    )
    a = vocab.select(F.col("lang").alias("lang_a"), F.col("vocab").alias("va"))
    b = vocab.select(F.col("lang").alias("lang_b"), F.col("vocab").alias("vb"))
    inter = F.size(F.array_intersect("va", "vb"))
    union = F.size("va") + F.size("vb") - inter
    return (
        a.join(b, F.col("lang_a") < F.col("lang_b"))
        .select(
            "lang_a", "lang_b",
            inter.cast("long").alias("shared"),
            F.round(inter / F.greatest(union, F.lit(1)), 6).alias("jaccard"),
        )
    )


@query(
    "csv_roundtrip_acctbal",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(c_acctbal), 2) AS total_acctbal,
           round(avg(c_acctbal), 6) AS avg_acctbal
    FROM customer GROUP BY c_nationkey
    """,
)
def csv_roundtrip_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CSV source/sink compat path (S1/S2/S4) exercised end-to-end:
    customer columns go out through the CSV sink and come back through the
    explicit-schema CSV scan (`io.read_csv` — no inference pass), then a
    grouped aggregate runs on the CSV-read frame. The oracle aggregates
    the original parquet directly, so a hash match proves the round-trip
    is value-lossless (Java's shortest-round-trip double formatting on
    write, exact parse on read).

    The compat pieces, cited: the reference reads its corpus as
    inferSchema CSV (`als.py:21-22`, `datacleaning.py:26`) and writes
    results as coalesce(1) CSV (`datacleaning.py:30,98`). Here the scan
    carries an explicit StructType (an inference pass is a full extra
    read at 100 TB) and the write stays parallel (no coalesce(1): one
    task serializing a distributed write is the documented anti-pattern
    `io.write_csv(single_file=True)` exists to reproduce, not to use)."""
    import os

    from pyspark.sql import types as T

    from . import io as IO

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long"),
        F.col("c_nationkey").cast("long"),
        F.col("c_acctbal").cast("double"),
    )
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scratch = os.path.join(
        repo_root, "spark-warehouse",
        f"csv_compat_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    IO.write_csv(cust, scratch)
    schema = T.StructType([
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_nationkey", T.LongType()),
        T.StructField("c_acctbal", T.DoubleType()),
    ])
    back = IO.read_csv(spark, scratch, schema=schema)
    return back.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        F.round(F.avg("c_acctbal"), 6).alias("avg_acctbal"),
    )
