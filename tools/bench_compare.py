#!/usr/bin/env python3
"""Per-query bench regression check.

Usage: python3 tools/bench_compare.py <current.json> [baseline.json]

Compares a graft.Bench JSON line against a baseline (default:
bench_history/r2_local.json), prints per-query ratios, and exits 1 if
any shared query is > 2x its baseline or the total regressed > 25%.
New queries (absent from the baseline) are listed but never fail the
check. Times under 0.3s are ignored for per-query flags (noise floor).
"""
import json
import sys

NOISE_FLOOR = 0.3
QUERY_RATIO = 2.0
TOTAL_RATIO = 1.25


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    cur = load(sys.argv[1])
    base_path = sys.argv[2] if len(sys.argv) > 2 else "bench_history/r2_local.json"
    base = load(base_path)
    cq, bq = cur["queries"], base["queries"]

    failed = list(cur.get("failed", []))
    regressions = []
    for name in sorted(cq):
        if name not in bq:
            print(f"NEW   {name:30s} {cq[name]:6.2f}s")
            continue
        ratio = cq[name] / bq[name] if bq[name] > 0 else float("inf")
        flag = ""
        if cq[name] > NOISE_FLOOR and ratio > QUERY_RATIO:
            regressions.append(name)
            flag = "  <-- REGRESSION"
        if flag or ratio > 1.5 or ratio < 0.5:
            print(f"      {name:30s} {bq[name]:6.2f}s -> {cq[name]:6.2f}s ({ratio:4.2f}x){flag}")

    total_ratio = cur["value"] / base["value"]
    print(f"total {base['value']:.1f}s -> {cur['value']:.1f}s ({total_ratio:.2f}x)")
    ok = not regressions and not failed and total_ratio <= TOTAL_RATIO
    if failed:
        print(f"FAILED queries: {failed}")
    if regressions:
        print(f"regressions (> {QUERY_RATIO}x): {regressions}")
    if total_ratio > TOTAL_RATIO:
        print(f"total regressed > {TOTAL_RATIO}x")
    print("OK" if ok else "CHECK FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
