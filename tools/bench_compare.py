#!/usr/bin/env python3
"""Per-query bench regression check with unchanged-code mover flags.

Usage:
  python3 tools/bench_compare.py <current.json> [baseline.json]
      [--changed q1,q2,...]

Compares a graft.Bench JSON line against a baseline (default:
bench_history/r2_local.json), prints per-query ratios, and exits 1 if
any shared query is > 2x its baseline or the total regressed > 25%.
New queries (absent from the baseline) are listed but never fail the
check. Times under 0.3s are ignored for per-query flags (noise floor).

Mover discipline (VERDICT r11 #1 — the BENCH_SCALE canary-band rule,
applied to the per-query table): any shared query that moved > 1.5x
round-over-round WITHOUT a code change is flagged as an
UNCHANGED-CODE MOVER. `--changed` names the queries whose code the
round actually touched (the round harness derives it from the diff);
everything else moving out of band demands adjudication — re-measure
best-of-N on a quiet machine (canary in-band) and either record the
quiet number or name the cause. When both artifacts carry a canary,
the mover threshold is scaled by the canary ratio so a uniformly slow
machine doesn't flag every query.
"""
import json
import sys

NOISE_FLOOR = 0.3
QUERY_RATIO = 2.0
TOTAL_RATIO = 1.25
MOVER_RATIO = 1.5


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    changed = set()
    for a in sys.argv[1:]:
        if a.startswith("--changed"):
            val = a.split("=", 1)[1] if "=" in a else ""
            changed = {q.strip() for q in val.split(",") if q.strip()}
    cur = load(args[0])
    base_path = args[1] if len(args) > 1 else "bench_history/r2_local.json"
    base = load(base_path)
    cq, bq = cur["queries"], base["queries"]

    # machine-speed control: scale the mover band by the canary ratio so
    # a uniformly contended runner doesn't flag the whole table
    canary_ratio = 1.0
    if cur.get("canary_sec") and base.get("canary_sec"):
        canary_ratio = cur["canary_sec"] / base["canary_sec"]
        print(f"canary {base['canary_sec']:.3f}s -> {cur['canary_sec']:.3f}s "
              f"({canary_ratio:.2f}x)")

    failed = list(cur.get("failed", []))
    regressions = []
    movers = []
    for name in sorted(cq):
        if name not in bq:
            print(f"NEW   {name:30s} {cq[name]:6.2f}s")
            continue
        ratio = cq[name] / bq[name] if bq[name] > 0 else float("inf")
        flag = ""
        if cq[name] > NOISE_FLOOR and ratio > QUERY_RATIO * canary_ratio:
            regressions.append(name)
            flag = "  <-- REGRESSION"
        elif (cq[name] > NOISE_FLOOR and ratio > MOVER_RATIO * canary_ratio
              and name not in changed):
            movers.append(name)
            flag = "  <-- UNCHANGED-CODE MOVER (adjudicate: quiet re-measure or name the cause)"
        if flag or ratio > 1.5 or ratio < 0.5:
            print(f"      {name:30s} {bq[name]:6.2f}s -> {cq[name]:6.2f}s ({ratio:4.2f}x){flag}")

    total_ratio = cur["value"] / base["value"]
    print(f"total {base['value']:.1f}s -> {cur['value']:.1f}s ({total_ratio:.2f}x)")
    ok = not regressions and not failed and total_ratio <= TOTAL_RATIO
    if failed:
        print(f"FAILED queries: {failed}")
    if regressions:
        print(f"regressions (> {QUERY_RATIO}x): {regressions}")
    if movers:
        print(f"unchanged-code movers (> {MOVER_RATIO}x, canary-adjusted): {movers}")
    if total_ratio > TOTAL_RATIO:
        print(f"total regressed > {TOTAL_RATIO}x")
    print("OK" if ok else "CHECK FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
