#!/usr/bin/env python3
"""Per-entry sf1/sf0.1 scaling ratio table (r12, verdict item #4).

Usage: python3 tools/sf1ratio.py <BENCH_FULL at sf0.1> <BENCH_FULL at sf1>

Prints the median ratio, the total-wall ratio, and every entry whose
ratio exceeds the flag threshold (default 5x) sorted descending --
the candidates for the adjudication treatment if their documented
bound is NOT linear in corpus size.
"""
import json
import statistics
import sys

FLAG = 5.0

def main() -> None:
    base = json.load(open(sys.argv[1]))
    sf1 = json.load(open(sys.argv[2]))
    qb, q1 = base["queries"], sf1["queries"]
    shared = sorted(set(qb) & set(q1))
    missing = sorted(set(qb) ^ set(q1))
    ratios = {k: q1[k] / qb[k] for k in shared if qb[k] > 0}
    med = statistics.median(ratios.values())
    print(f"entries: {len(shared)} shared ({len(missing)} unmatched: {missing[:6]}...)" if missing
          else f"entries: {len(shared)} shared")
    print(f"total wall: {base['value']:.1f}s (sf0.1) -> {sf1['value']:.1f}s (sf1) "
          f"= {sf1['value'] / base['value']:.2f}x for 10x data")
    print(f"median per-entry ratio: {med:.2f}x")
    flagged = sorted((r, k) for k, r in ratios.items() if r >= FLAG)
    print(f"entries >= {FLAG}x (expect ONLY documented linear-in-corpus bounds):")
    for r, k in reversed(flagged):
        print(f"  {k:32s} {qb[k]:7.2f}s -> {q1[k]:7.2f}s  {r:5.1f}x")

if __name__ == "__main__":
    main()
