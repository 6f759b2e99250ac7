"""Sequence packing — fitting documents into fixed token-budget context
windows (north-star extension: the step between a deduplicated corpus and
a training batch).

Packing is inherently sequential (bin state), so it cannot be a pure
DataFrame expression; the Spark-first shape is BOUNDED-SCOPE sequential:
hash documents into ``n_groups`` deterministic groups, run first-fit-
decreasing INSIDE each group via Arrow-batched ``applyInPandas``, emit
(doc, window) assignments. Parallelism = n_groups; per-task state = one
group's docs; packing quality is within a few percent of global FFD while
scaling linearly (global FFD is a single-threaded driver loop — the exact
anti-pattern this engine avoids).

Determinism: groups come from ``pmod(xxhash64(id), n_groups)`` and the
in-group order is (token_count DESC, id) — the same input produces the
same packing on any cluster layout, so window ids are stable join keys for
downstream shuffling/writing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACK_SCHEMA = "doc_id long, pack_group int, window_id long, n_tokens int, truncated boolean"


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
    budget: int = 2048,
    n_groups: int = 64,
    group_hash=None,
) -> DataFrame:
    """Assign each document to a context window of at most ``budget`` tokens
    using first-fit-decreasing within deterministic hash groups.

    Documents longer than the budget get a dedicated window with
    ``truncated = true`` (the caller decides whether to split or drop).
    ``window_id`` is globally unique: ``pack_group * 2^32 + local_bin``.

    Scale: one shuffle on the 4-byte group key; each task packs one group
    in O(n log n) numpy/pandas; at 100 TB size ``n_groups`` ≈ a few × total
    cores so groups fit comfortably in task memory."""
    import pandas as pd

    def pack(key: tuple, pdf: "pd.DataFrame") -> "pd.DataFrame":
        (group,) = key
        pdf = pdf.sort_values(["_n", "_id"], ascending=[False, True], kind="mergesort")
        bins: list[int] = []  # remaining capacity per bin
        assigned = []
        truncated = []
        for n in pdf["_n"]:
            n = int(n)
            if n >= budget:
                bins.append(0)
                assigned.append(len(bins) - 1)
                truncated.append(n > budget)
                continue
            # first-fit over open bins (list scan is fine: bins per group
            # are bounded by group_tokens / budget)
            for b, cap in enumerate(bins):
                if cap >= n:
                    bins[b] = cap - n
                    assigned.append(b)
                    break
            else:
                bins.append(budget - n)
                assigned.append(len(bins) - 1)
            truncated.append(False)
        return pd.DataFrame(
            {
                "doc_id": pdf["_id"].to_numpy(),
                "pack_group": group,
                "window_id": [group * (1 << 32) + b for b in assigned],
                "n_tokens": pdf["_n"].to_numpy(),
                "truncated": truncated,
            }
        )

    hasher = group_hash if group_hash is not None else F.xxhash64
    base = df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(token_count_col).cast("int").alias("_n"),
        F.pmod(hasher(F.col(id_col)), F.lit(n_groups)).cast("int").alias("_g"),
    )
    return base.groupBy("_g").applyInPandas(pack, PACK_SCHEMA)


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Fill-rate accounting per pack group: windows used, mean fill, and the
    waste a global packer could at best reclaim."""
    per_window = packed.groupBy("pack_group", "window_id").agg(
        F.sum("n_tokens").alias("window_tokens"),
        F.count(F.lit(1)).alias("docs_in_window"),
    )
    return per_window.groupBy("pack_group").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum("docs_in_window").alias("n_docs"),
        F.round(
            F.avg(F.least(F.col("window_tokens"), F.lit(budget)) / F.lit(float(budget))), 4
        ).alias("mean_fill"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int = 32,
) -> DataFrame:
    """Overlapping context-window chunking: each document becomes
    ⌈(n_tokens - chunk)/stride⌉+1 chunks of ``chunk_tokens`` tokens starting
    every ``stride`` tokens (the standard train-example windowing; overlap =
    chunk - stride). Pure sequence/slice/explode projection — no UDF, no
    shuffle; output order and ids are deterministic: (doc_id, chunk_idx,
    chunk_text, n_tokens)."""
    from .text import _bind, tokens

    starts = lambda toks: F.sequence(  # noqa: E731
        F.lit(0),
        F.greatest(
            F.ceil((F.size(toks) - chunk_tokens) / stride).cast("long"), F.lit(0)
        ),
    )
    chunks = _bind(
        tokens(text_col),
        lambda toks: F.transform(
            starts(toks),
            lambda i: F.struct(
                i.cast("int").alias("chunk_idx"),
                F.array_join(
                    F.slice(toks, i * stride + 1, chunk_tokens), " "
                ).alias("chunk_text"),
                F.least(
                    F.size(toks) - i * stride, F.lit(chunk_tokens)
                ).cast("int").alias("n_tokens"),
            ),
        ),
    )
    return (
        df.select(F.col(id_col), F.explode(chunks).alias("_c"))
        .select(id_col, "_c.chunk_idx", "_c.chunk_text", "_c.n_tokens")
    )
