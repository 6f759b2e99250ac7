"""sf10 growth-attribution report (VERDICT r6 #4).

For the queries whose sf0.1→sf1 growth was superlinear-looking, the claim
was "growth is the RESULT (pair count), not the plan" — this tool checks
that claim against its own prediction by recording, at each sf dir, both
the wall-clock AND the result cardinality (pair counts for the near-dup
censuses, edge/triangle counts for the graph ops). If wall-clock grows
like the measured result count (and not like rows²), the plan shuffles
candidates, not the cross product.

Usage: python tools/sf10_report.py [sf_dir ...]   (default sf1 then sf10)
Prints one JSON line per (sf_dir, query): {"sf_dir", "query", "sec",
"rows"}; rows is counted in a SECOND action so the timing matches
bench.py's noop-sink convention.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    # growth-claim queries (pair/edge counts are the prediction).
    # embedding_near_dup is excluded by default at sf10: the exact
    # all-pairs census is O(n²) BLAS by definition (measured: 67 s noop at
    # sf1, >17 min incomplete at sf10 for ~10× the pairs) — its scale path
    # is semantic_dedup / ANN, as its docstring routes; run it explicitly
    # via argv-listed sf dirs if the quadratic baseline is wanted.
    # semantic_dedup likewise: at sf10 the generator's offset dilution
    # (designed against 0.95-class thresholds) does not dilute the
    # 0.4-0.5-class censuses — the qualifying-pair count is ~1.7e9
    # (sample-validated estimate, SCALING.md round 7), so the run is
    # result-materialization-bound by construction.
    "minhash_near_dup",
    "part_triangles",
    "dedup_clusters",
    # headline relational set (the sanity baseline)
    "pricing_summary",
    "prune_sparse",
    "broadcast_join_revenue",
    "right_outer_join",
    "topk_per_group",
]


def main() -> int:
    dirs = sys.argv[1:] or [
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", d)
        for d in ("sf1", "sf10")
    ]
    import __spark_entry__ as e
    from recommender_system_with_pyspark_spark.session import get_spark

    spark = get_spark(app_name="sf10_report", shuffle_partitions=32)
    qs = e.queries()
    out = []
    for sf_dir in dirs:
        for name in QUERIES:
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            sec = round(time.time() - t0, 2)
            rows = df.count()
            rec = {"sf_dir": sf_dir, "query": name, "sec": sec, "rows": rows}
            out.append(rec)
            print(json.dumps(rec), flush=True)
    print(json.dumps({"report": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
