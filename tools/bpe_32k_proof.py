"""Round-10 production-vocabulary encoder proof (VERDICT r9 #3): the
word-cached greedy encoder vs the broadcast-fold apply path at a REAL
vocabulary size — 32,768 merges — on the full sf1 corpus (50k docs).

Table construction: the sf1-trained 248-merge prefix (the corpus fixed
point, retrained here deterministically and saved to
``tools/bpe_sf1_table.json`` for reuse) + a synthetic tail of pairs drawn
from the symbol pool (alphanumerics x trained outputs) with fresh
supplementary-PUA outputs — exactly the shape of a production vocabulary
from this corpus's encoder state: a few hundred merges fire densely, the
long tail fires rarely or never, but EVERY entry costs the fold one
corpus-wide replace pass while costing the cached encoder only a dict
lookup per adjacent pair per (distinct) word.

Checks:
1. spot equality fold == cached on >=1k docs (md5 of bpe_text) — the
   80-merge full-corpus equality is already pinned by the shared
   bpe_encode_cached_docs oracle; this extends it to the 32k table;
2. timed fold encode over 50k docs vs timed cached encode over 50k docs
   (noop sink, median-free single pass — the gap is orders of magnitude,
   not jitter-sensitive).

Usage: python tools/bpe_32k_proof.py [sf_dir] [n_merges]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "48g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from recommender_system_with_pyspark_spark.io import load_table
from recommender_system_with_pyspark_spark.operators.text import (
    _fresh_symbol,
    _validate_bpe_fast_path,
    bpe_apply,
    bpe_encode_cached,
    bpe_table,
    bpe_train_batched,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
n_total = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
_base = os.path.basename(os.path.normpath(sf_dir))
table_path = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), f"bpe_{_base}_table.json"
)

docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
n_docs = docs.count()
print(f"docs: {n_docs} rows at {sf_dir}", flush=True)

if os.path.exists(table_path):
    trained = [tuple(t) for t in json.load(open(table_path))]
    print(f"loaded {len(trained)} trained merges from {table_path}", flush=True)
else:
    t0 = time.time()
    raw = bpe_train_batched(docs, n_merges=256, batch_size=32)
    trained = bpe_table(raw)
    json.dump(trained, open(table_path, "w"), ensure_ascii=False)
    print(f"trained {len(trained)} merges in {time.time()-t0:.1f}s -> {table_path}", flush=True)

# Synthetic tail: deterministic pair stream over (alnum + trained outputs),
# fresh supplementary-PUA outputs via the allocator under test.
pool = list("abcdefghijklmnopqrstuvwxyz0123456789") + [out for _, _, out in trained]
seen = {(l, r) for l, r, _ in trained}
big = list(trained)
i = len(big)
for a in pool:
    if i >= n_total:
        break
    for b in pool:
        if i >= n_total:
            break
        if (a, b) in seen:
            continue
        seen.add((a, b))
        big.append((a, b, _fresh_symbol(i, 0xE100)))
        i += 1
assert len(big) == n_total, len(big)
assert _validate_bpe_fast_path(big), "32k table must stay on the fast path"
n_supp = sum(1 for _, _, o in big if ord(o) > 0xFFFF)
print(f"table: {len(big)} merges, {n_supp} supplementary-PUA outputs", flush=True)

# 1. spot equality on >=1k docs
sample = docs.filter(F.col("doc_id") % 50 == 0)  # ~1k docs, deterministic
n_sample = sample.count()
a = bpe_apply(sample, big).select("doc_id", F.md5(F.col("bpe_text").cast("binary")).alias("h"))
b = bpe_encode_cached(sample, big).select("doc_id", F.md5(F.col("bpe_text").cast("binary")).alias("h"))
mism = a.alias("a").join(b.alias("b"), "doc_id").filter(F.col("a.h") != F.col("b.h"))
n_mism = mism.count()
print(f"equality spot-check: {n_sample} docs, {n_mism} mismatches", flush=True)
assert n_mism == 0

# 2. timed fold vs cached over the full corpus
t0 = time.time()
bpe_apply(docs, big).write.mode("overwrite").format("noop").save()
t_fold = time.time() - t0
print(f"fold   encode {n_docs} docs x {len(big)} merges: {t_fold:.1f}s", flush=True)

t0 = time.time()
bpe_encode_cached(docs, big).write.mode("overwrite").format("noop").save()
t_cached = time.time() - t0
print(
    f"cached encode {n_docs} docs x {len(big)} merges: {t_cached:.1f}s "
    f"(fold/cached = {t_fold/t_cached:.1f}x)",
    flush=True,
)
print("ALL OK", flush=True)
