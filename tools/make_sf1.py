"""Generate an sf1-equivalent dataset (10x sf0.1) for the SCALING study.

The driver's generator only ships sf{0.001,0.01,0.1}; this builds the next
decade as a SELF-SIMILAR REPLICATION of sf0.1 — ten copies with disjoint
key spaces — so per-row distributions, basket sizes, and join fan-outs are
preserved while data volume grows 10x. Two deliberate mutations keep the
workload character honest (a naive copy would make every document/embedding
a 10-way exact duplicate, quadratically inflating the near-dup pair volume
and invalidating the dedup/similarity growth measurements):

- documents: in copies k>0, ~35% of tokens (chosen by xxhash64(token, k))
  get a copy-specific prefix. Cross-copy Jaccard/SimHash similarity drops
  below every near-dup threshold while ~65% of tokens (and thus language /
  quality signals) stay intact; n_chars is recomputed.
- embeddings: copies k>0 are re-normalized after adding a copy-specific
  pseudo-random offset vector (norm ~0.8). Within-copy cosine structure is
  broadly preserved (shared offset); cross-copy similarity is diluted well
  below the 0.95-class thresholds.

Deterministic (hash-driven, no rand()), writes to .scale/sf1/ inside the
repo. Usage: python tools/make_sf1.py [--copies 10] [--out .scale/sf1]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY_STRIDE = 100_000_000  # far above any sf0.1 key; copy k shifts keys by k*stride

FACT_KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1"))
    # For the NEXT decade (e.g. sf100 from sf10) the stride must exceed the
    # SOURCE's max key, which already carries the previous decade's shifts:
    # pass --stride 10x the one the source was built with.
    ap.add_argument("--stride", type=int, default=KEY_STRIDE)
    # Spot-run decades (VERDICT r9 #5) only need the tables their entries
    # read; bounding the tier keeps the disk footprint proportional.
    ap.add_argument("--tables", default="",
                    help="comma list; empty = all tables")
    # Decorrelated embedding tier (VERDICT r10 #5): the offset-and-
    # renormalize mutation dilutes 0.95-class similarity ONE decade up, but
    # compounds across two (copy-offset sums collide, so ~1000-member
    # base-vector families stay mutually similar — the sf100 0.9-census
    # 1100x result inflation). With this flag each copy k>0 instead gets a
    # copy-specific RANDOM ORTHOGONAL ROTATION (seeded numpy QR): rotations
    # preserve every within-copy cosine EXACTLY (each copy is a faithful
    # replica of the base workload's cluster/label structure), while
    # cross-copy similarities of clustered 16-dim data land near the
    # random-cosine background, far below near-dup thresholds — so a
    # second-decade census measures the algorithms, not the generator.
    ap.add_argument("--fresh-embeddings", action="store_true")
    args = ap.parse_args()
    stride = args.stride
    wanted = set(filter(None, args.tables.split(",")))

    def skip(name: str) -> bool:
        return bool(wanted) and name not in wanted

    from pyspark.sql import functions as F

    from recommender_system_with_pyspark_spark.io import load_table
    from recommender_system_with_pyspark_spark.session import get_spark

    spark = get_spark(app_name="make-sf1")
    os.makedirs(args.out, exist_ok=True)

    def write(df, name):
        df.coalesce(8).write.mode("overwrite").parquet(
            os.path.join(args.out, f"{name}.parquet"))
        print("wrote", name, df.count())

    # dims: unchanged
    for t in ("nation", "region"):
        if skip(t):
            continue
        write(load_table(spark, args.src, t), t)

    # fact tables: shifted-key copies
    for t, keys in FACT_KEYS.items():
        if skip(t):
            continue
        base = load_table(spark, args.src, t)
        parts = []
        for k in range(args.copies):
            c = base
            for col in keys:
                c = c.withColumn(col, F.col(col) + F.lit(k * stride))
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        write(out, t)

    # documents: shifted ids + per-copy token mutation (copy 0 untouched)
    docs = load_table(spark, args.src, "documents") if not skip("documents") else None
    parts = []
    for k in range(args.copies if docs is not None else 0):
        c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * stride))
        if k > 0:
            mutated = F.array_join(
                F.transform(
                    F.split(F.col("text"), r"\s+"),
                    lambda t: F.when(
                        F.pmod(F.xxhash64(t, F.lit(k)), F.lit(100)) < 35,
                        F.concat(F.lit(f"q{k}"), t),
                    ).otherwise(t),
                ),
                " ",
            )
            c = c.withColumn("text", mutated).withColumn(
                "n_chars", F.length("text").cast("long"))
        parts.append(c)
    if parts:
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        write(out, "documents")

    # embeddings: shifted ids + per-copy mutation (copy 0 untouched).
    # Two modes: offset-and-renormalize (default, threshold-relative
    # dilution) or --fresh-embeddings (per-copy orthogonal rotation — see
    # the flag help). The rotation path runs as ONE distributed pass:
    # base x copies via crossJoin, a 2 MB broadcast of all rotation
    # matrices, one numpy matmul per Arrow batch.
    emb = load_table(spark, args.src, "embeddings") if not skip("embeddings") else None
    dim = len(emb.select("embedding").first()[0]) if emb is not None else 0
    if emb is not None and args.fresh_embeddings:
        import numpy as np

        rots = {}
        for k in range(1, args.copies):
            rng = np.random.RandomState(7919 * k + 13)
            q, r = np.linalg.qr(rng.standard_normal((dim, dim)))
            rots[k] = (q * np.sign(np.diag(r))).astype("float64")  # det-sign-fixed
        b_rots = spark.sparkContext.broadcast(rots)
        extra = [c for c in emb.columns if c not in ("vec_id", "embedding")]

        def rotate(batches):
            import pandas as pd

            R = b_rots.value
            for pdf in batches:
                mat = np.stack(pdf["embedding"].to_numpy()).astype("float64")
                out = []
                for k, grp in pdf.groupby("_copy"):
                    k = int(k)  # np.int32 * 10^10 stride would overflow
                    sub = mat[pdf.index.get_indexer(grp.index)]
                    rot = sub @ R[k] if k in R else sub
                    g = grp.copy()
                    g["vec_id"] = g["vec_id"] + k * stride
                    g["embedding"] = [row.astype("float32") for row in rot]
                    out.append(g.drop(columns=["_copy"]))
                yield pd.concat(out) if out else pdf.drop(columns=["_copy"]).iloc[:0]

        copies_df = spark.range(args.copies).select(F.col("id").cast("int").alias("_copy"))
        schema = ", ".join(
            ["vec_id long", "embedding array<float>"]
            + [f"{c} {emb.schema[c].dataType.simpleString()}" for c in extra]
        )
        out = (
            emb.crossJoin(copies_df)
            .repartition(max(32, args.copies // 8))
            .mapInPandas(rotate, schema)
        )
        write(out.select(*emb.columns), "embeddings")
        emb = None  # skip the offset path below
    parts = []
    for k in range(args.copies if emb is not None else 0):
        c = emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * stride))
        if k > 0:
            # deterministic unit-ish offset for copy k, scaled to norm 0.8
            raw = [math.sin(0.7 * j + 13.37 * k) for j in range(dim)]
            nrm = math.sqrt(sum(x * x for x in raw))
            off = [0.8 * x / nrm for x in raw]
            off_col = F.array(*[F.lit(float(x)) for x in off])
            shifted = F.zip_with(F.col("embedding"), off_col, lambda a, b: a + b)
            norm = F.sqrt(F.aggregate(shifted, F.lit(0.0), lambda acc, x: acc + x * x))
            c = c.withColumn(
                "embedding",
                F.transform(shifted, lambda x: (x / norm).cast("float")),
            )
        parts.append(c)
    if parts:
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        write(out, "embeddings")
    print("done ->", args.out)


if __name__ == "__main__":
    main()
