#!/usr/bin/env python3
"""Plan-regression gate over PLANS.md dumps.

Usage:
  python3 tools/plan_diff.py check [PLANS.md]
      Structural lint of one dump: fail if any query's plan contains a
      CartesianProduct, or a BroadcastNestedLoopJoin outside the
      allow-list below (1-row broadcast scalar attaches / intentionally
      broadcast ANN probe sides).
  python3 tools/plan_diff.py diff OLD.md NEW.md
      Per-query compare of two dumps: fail if a query gained a
      CartesianProduct, a non-allow-listed BroadcastNestedLoopJoin, or
      any new exchanges (shuffle/broadcast) vs the committed dump.

Exit 0 = clean, 1 = regression (messages on stdout). Regenerate a dump
with `tools/run.sh graft.PlanDump /root/testdata/sf0.01`.
"""
import re
import sys

# Queries whose BroadcastNestedLoopJoin rows are audited intentional:
# 1-row scalar attaches (count/total audit columns cross-joined onto a
# bounded top-N) or broadcast ANN probe sides. Verified round 4
# (VERDICT "What's wrong": all BNLJ rows resolve to these shapes).
BNLJ_ALLOWED = {
    "m01_minhash_lsh", "s01_simhash_pairs", "e05_lsh_pairs",
    "e07_knn_quantized", "e08_coarse_rerank",
    "p04_arith_derive", "p09_eq_filter",
    # g11: 1-row broadcast total attach (topNWithTotal); e22/e23:
    # broadcast bounded query/benchmark side into the corpus scan (ANN
    # probe shape) + 1-row audit total
    "g11_link_prediction", "e22_maxsim_late_interaction",
    "e23_semantic_decontamination",
    # g12: 1-row broadcast |embeddings| count attach (feature keying)
    "g12_gnn_mean_agg_round",
}


def parse(path):
    """{query_name: plan_text} from a PLANS.md dump."""
    plans = {}
    name = None
    buf = []
    for line in open(path):
        m = re.match(r"^## (\S+)", line)
        if m:
            if name:
                plans[name] = "".join(buf)
            name = m.group(1)
            buf = []
        elif name:
            buf.append(line)
    if name:
        plans[name] = "".join(buf)
    return plans


def tree_section(plan_text):
    """The operator-tree summary (between '== Physical Plan ==' and the
    first '(1) ' detail block) — node counts are unambiguous there,
    while detail blocks repeat node names in prose."""
    m = re.search(r"== Physical Plan ==\n(.*?)\n\n", plan_text, re.S)
    return m.group(1) if m else plan_text


def count_nodes(plan_text, node):
    return len(re.findall(rf"\b{node} \(\d+\)", tree_section(plan_text)))


def exchanges(plan_text):
    return (count_nodes(plan_text, "Exchange")
            + count_nodes(plan_text, "BroadcastExchange"))


def check(plans):
    bad = []
    for q, text in sorted(plans.items()):
        if count_nodes(text, "CartesianProduct"):
            bad.append(f"{q}: CartesianProduct in plan")
        if count_nodes(text, "BroadcastNestedLoopJoin") and q not in BNLJ_ALLOWED:
            bad.append(f"{q}: BroadcastNestedLoopJoin not in allow-list "
                       "(add only after auditing it is a bounded scalar attach)")
    return bad


def diff(old, new):
    bad = []
    for q in sorted(new):
        if q not in old:
            # new query: structural lint only
            bad += [f"[new] {b}" for b in check({q: new[q]})]
            continue
        o, n = old[q], new[q]
        if (count_nodes(n, "CartesianProduct")
                > count_nodes(o, "CartesianProduct")):
            bad.append(f"{q}: gained a CartesianProduct")
        if (q not in BNLJ_ALLOWED
                and count_nodes(n, "BroadcastNestedLoopJoin")
                > count_nodes(o, "BroadcastNestedLoopJoin")):
            bad.append(f"{q}: gained a BroadcastNestedLoopJoin")
        eo, en = exchanges(o), exchanges(n)
        if en > eo:
            bad.append(f"{q}: exchanges grew {eo} -> {en} "
                       "(new shuffle/broadcast vs committed dump)")
    return bad


def main():
    args = sys.argv[1:]
    if args and args[0] == "check":
        path = args[1] if len(args) > 1 else "PLANS.md"
        bad = check(parse(path))
    elif args and args[0] == "diff" and len(args) == 3:
        bad = diff(parse(args[1]), parse(args[2]))
    else:
        print(__doc__)
        sys.exit(2)
    for b in bad:
        print(f"FAIL {b}")
    print(f"== plan_diff: {'CLEAN' if not bad else str(len(bad)) + ' regressions'} ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
