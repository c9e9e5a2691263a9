#!/usr/bin/env python3
"""Format the r18 slope-backfill ledger from two bench JSON headline
lines (sf0.1 and fixture_cache/sf1 runs over the same SPARK_GRAFT_ONLY
set), reading per-query medians from the saved BENCH_DETAIL copies.

Usage: slope_table.py <sf01_detail.json> <sf1_detail.json>
Prints a markdown table sorted by query name.
"""
import json
import sys


def medians(detail_path):
    with open(detail_path) as f:
        d = json.load(f)
    return {k: v for k, v in d["median"].items() if v is not None}


def main():
    a = medians(sys.argv[1])
    b = medians(sys.argv[2])
    print("| query | sf0.1 (s) | sf1 (s) | ratio for 10× rows | vs linear |")
    print("|---|---|---|---|---|")
    for q in sorted(set(a) & set(b)):
        r = b[q] / a[q] if a[q] > 0 else float("nan")
        print(f"| {q.replace('_', ' ', 1)} | {a[q]:.2f} | {b[q]:.2f} "
              f"| {r:.1f}× | {r / 10:.2f}× |")
    only_a = sorted(set(a) - set(b))
    only_b = sorted(set(b) - set(a))
    if only_a or only_b:
        print(f"\nmissing sf1: {only_a}\nmissing sf0.1: {only_b}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
