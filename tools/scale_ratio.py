#!/usr/bin/env python3
"""Per-query scale-ratio table: 10x-bench seconds / sf0.1-bench seconds.

Usage: scale_ratio.py BASE_JSON TENX_JSON [--md]

Both inputs are BENCH_LOCAL.json-shaped ({"queries": {name: sec}}). The
ratio adjudicates the q169 class (VERDICT r16 #1): a query green and
in-gate at sf0.1 whose cost nonetheless SCALES WITH ROWS shows up here as
a ratio far above the scan-bound cohort's, while fixed-overhead queries
sit near 1. Queries capped by construction (vec_id < cap panels) stay
near 1 by design - the table is the evidence either way.
"""
import json
import statistics
import sys


def load(p):
    with open(p) as f:
        d = json.load(f)
    return {k: v for k, v in d["queries"].items() if v >= 0}


def main():
    base, tenx = load(sys.argv[1]), load(sys.argv[2])
    md = "--md" in sys.argv
    rows = []
    for k in sorted(base):
        if k in tenx:
            rows.append((k, base[k], tenx[k], tenx[k] / max(base[k], 1e-9)))
    ratios = [r for _, _, _, r in rows]
    med = statistics.median(ratios)
    rows.sort(key=lambda x: -x[3])
    sep = "|" if md else " "
    if md:
        print("| query | sf0.1 s | 10x s | ratio |")
        print("|---|---|---|---|")
    for k, b, t, r in rows:
        flag = " <== " if r > 2 * med else ""
        line = f"{k:30s}{sep}{b:7.2f}{sep}{t:8.2f}{sep}{r:6.2f}{flag}"
        print(f"| {line} |" if md else line)
    print(f"\nmedian ratio {med:.2f}; n={len(rows)}; "
          f"flagged(>2x median)={sum(1 for r in ratios if r > 2 * med)}")


if __name__ == "__main__":
    main()
