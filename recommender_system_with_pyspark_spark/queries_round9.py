"""Round-9 query surface (VERDICT r8 items #3/#4/#7/#8).

- ``bpe_train_batched_merges`` — the REAL-VOCAB trainer
  (``text.bpe_train_batched``): up to ``batch_size`` pairwise-disjoint
  merges learned per corpus pass. DuckDB unrolls the SAME two rounds —
  each round's greedy skip-overlap selection is equivalently "iterated
  argmax over pairs disjoint from the accepted set", which unrolls into
  one argmax CTE per batch slot — so the hash pins the per-round counts,
  the disjointness rule, the tie-break, and the batched corpus rewrite.
- ``bpe_encode_large_vocab`` — ``bpe_apply``'s constant-plan-depth
  broadcast-fold path (> ``max_chain`` merges): an 80-entry merge table
  exercises the ``F.aggregate`` fold; DuckDB replays the identical
  replace sequence via ``list_reduce`` over the same table.
- ``training_pipeline_e2e`` — the full LLM-data chain (quality filter →
  exact dedup → decontaminate → stable split → BPE tokenize →
  token accounting) as ONE oracle-checked composite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import load_table
from .registry import query


def _sql_sym(sym: str) -> str:
    """SQL literal for a merge symbol (PUA chars via chr())."""
    parts = [
        f"chr({ord(ch)})" if ord(ch) >= 0xE000 else f"'{ch}'" for ch in sym
    ]
    return " || ".join(parts)


_BB_BATCH = 4  # batch slots per round in the oracle entry (2 rounds x 4)


def _bpe_batched_round_sql(r: int) -> str:
    """CTE block for one batched-BPE round: count pairs of corpus state
    c{r}, then greedy skip-overlap selection unrolled as _BB_BATCH argmax
    CTEs (slot k = argmax over pairs sharing no symbol with slots 0..k-1
    — equivalent to scanning the ranked list and skipping overlaps), then
    the combined rewrite to c{r+1}."""
    base = r * _BB_BATCH
    # MATERIALIZED: each p{r}/s{r}_{k} is referenced by several later CTEs
    # and scalar subqueries; without the hint DuckDB inlines per reference
    # and the round-2 chain re-executes round 1 combinatorially.
    blocks = [
        f"""
    p{r} AS MATERIALIZED (
        SELECT substring(s, CAST(i AS INT), 2) AS pair, count(*) AS c
        FROM c{r}, LATERAL (SELECT unnest(range(1, length(s))) AS i)
        WHERE NOT contains(substring(s, CAST(i AS INT), 2), ' ')
        GROUP BY 1 HAVING count(*) >= 2
    )"""
    ]
    for k in range(_BB_BATCH):
        disjoint = " AND ".join(
            f"""NOT contains(pair, substring((SELECT pair FROM s{r}_{j}), 1, 1))
             AND NOT contains(pair, substring((SELECT pair FROM s{r}_{j}), 2, 1))"""
            for j in range(k)
        )
        where = f"WHERE {disjoint}" if disjoint else ""
        blocks.append(
            f"""
    s{r}_{k} AS MATERIALIZED (
        SELECT pair, c, {base + k} AS step FROM p{r} {where}
        ORDER BY c DESC, pair ASC LIMIT 1
    )"""
        )
    rewrite = "s"
    for k in range(_BB_BATCH):
        rewrite = (
            f"replace({rewrite}, (SELECT pair FROM s{r}_{k}), "
            f"chr({0xE100 + base + k}))"
        )
    blocks.append(f"""
    c{r + 1} AS MATERIALIZED (SELECT {rewrite} AS s FROM c{r})""")
    return ",".join(blocks)


@query(
    "bpe_train_batched_merges",
    oracle=f"""
    WITH c0 AS (SELECT text AS s FROM documents WHERE length(text) > 1),
    {",".join(_bpe_batched_round_sql(r) for r in range(2))}
    SELECT step, pair, CAST(c AS BIGINT) AS pair_count,
           {0xE100} + step AS new_cp
    FROM (
        {" UNION ALL ".join(f"SELECT * FROM s{r}_{k}" for r in range(2) for k in range(_BB_BATCH))}
    ) ORDER BY step
    """,
)
def bpe_train_batched_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-VOCAB BPE training (``text.bpe_train_batched``, 8 merges in 2
    corpus passes, batch_size=4): each round counts pairs ONCE, collects
    only the top candidate rows, and greedily accepts pairwise
    symbol-disjoint pairs — disjointness keeps every accepted count exact
    and lets all four replaces ride one projection, so a 50k vocabulary
    costs ~vocab/batch rounds instead of one round per merge. DuckDB
    unrolls both rounds with the selection expressed as iterated
    disjoint-argmax (provably the same pairs as the skip-scan) and the
    hash pins counts, tie-breaks, disjointness, and the rewritten corpus
    feeding round 2."""
    from .operators.text import bpe_train_batched

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train_batched(docs, n_merges=2 * _BB_BATCH, batch_size=_BB_BATCH)
    return spark.createDataFrame(
        [(s, p, c, ord(o)) for s, p, c, o in merges],
        "step int, pair string, pair_count long, new_cp int",
    )


# 80-entry merge table (> bpe_apply's max_chain=64) — exercises the
# broadcast-fold path. First the 10 realistic DEFAULT merges (chained PUA
# sources included), then 70 generated two-letter pairs with fresh PUA
# outputs; fast-path valid by construction.
def _large_vocab_merges() -> "list[tuple[str, str, str]]":
    from .operators.text import DEFAULT_BPE_MERGES

    merges = list(DEFAULT_BPE_MERGES)
    pairs = [
        (a, b)
        for a in "abcdefghij"
        for b in "lmnopqrs"
    ][:70]
    for i, (a, b) in enumerate(pairs):
        merges.append((a, b, chr(0xE800 + i)))
    return merges


@query(
    "bpe_encode_large_vocab",
    oracle=f"""
    WITH mt AS (
        SELECT [{", ".join(f"{_sql_sym(l + r)} || chr(1) || {_sql_sym(o)}" for l, r, o in _large_vocab_merges())}] AS merges
    )
    SELECT doc_id,
           CAST(length(enc) AS INT) AS bpe_tokens,
           md5(enc) AS bpe_md5
    FROM (
        SELECT doc_id,
               list_reduce(
                   list_prepend(text, merges),
                   (acc, m) -> replace(acc, string_split(m, chr(1))[1], string_split(m, chr(1))[2])
               ) AS enc
        FROM documents, mt WHERE length(text) > 0
    )
    """,
)
def bpe_encode_large_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenization with a LARGE merge table (80 entries — past
    ``max_chain``): ``text.bpe_apply`` switches from the nested codegen
    replace chain to the constant-plan-depth ``F.aggregate`` fold over a
    broadcast (src, out) array — the plan shape that survives 30–50k
    production vocabularies where a nested chain would overflow
    Catalyst's recursive tree transforms. DuckDB replays the identical
    fold with ``list_reduce`` over the same table (built from the same
    Python source of truth), so the hash pins path-equivalence: fold ≡
    rank-ordered sequential replace."""
    from .operators.text import bpe_apply

    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    enc = bpe_apply(docs, _large_vocab_merges())
    return enc.select(
        "doc_id",
        F.col("bpe_tokens").cast("int").alias("bpe_tokens"),
        F.md5(F.col("bpe_text").cast("binary")).alias("bpe_md5"),
    )
