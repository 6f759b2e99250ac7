"""Compare two bench.py JSON outputs query-by-query (VERDICT r6 #8 —
methodology-stability check: consecutive uncontended runs should agree
within the suite's jitter bar).

Usage: python tools/bench_diff.py runA.json runB.json
Prints per-query sec_a, sec_b, ratio, and a summary (max/median |ratio-1|).
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> int:
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb))
    devs = []
    print(f"{'query':32s} {'A':>8s} {'B':>8s} {'B/A':>6s}")
    for q in shared:
        r = qb[q] / qa[q] if qa[q] else float("inf")
        devs.append(abs(r - 1))
        print(f"{q:32s} {qa[q]:8.3f} {qb[q]:8.3f} {r:6.2f}")
    summary = {
        "n": len(shared),
        "total_a": a["value"], "total_b": b["value"],
        "total_ratio": round(b["value"] / a["value"], 4),
        "median_abs_dev": round(statistics.median(devs), 4),
        "max_abs_dev": round(max(devs), 4),
    }
    # Host-drift annotation (VERDICT r9 #6): when both artifacts carry the
    # telemetry header, report the loadavg delta next to the timing delta so
    # "plan regression" and "busier host" are distinguishable at a glance.
    ha = (a.get("host") or {}).get("start") or {}
    hb = (b.get("host") or {}).get("start") or {}
    if ha.get("loadavg") and hb.get("loadavg"):
        summary["loadavg1_a"], summary["loadavg1_b"] = ha["loadavg"][0], hb["loadavg"][0]
        summary["loadavg1_delta"] = round(hb["loadavg"][0] - ha["loadavg"][0], 2)
    if "mem_available_gb" in ha and "mem_available_gb" in hb:
        summary["mem_avail_gb_a"] = ha["mem_available_gb"]
        summary["mem_avail_gb_b"] = hb["mem_available_gb"]
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
