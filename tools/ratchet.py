#!/usr/bin/env python3
"""Per-query bench ratchet: compare a new Bench sweep JSON against a
baseline sweep JSON and flag regressions by the round-4 protocol —
a query is a SUSPECT when it is BOTH >20% slower AND >0.3 s slower
than the baseline. Suspects must then be isolated-rerun (min-of-4,
SPARK_GRAFT_ONLY) before being adjudicated as real.

Usage: python3 tools/ratchet.py BASELINE.json NEW.json
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return {k: v for k, v in d["queries"].items() if v >= 0}


def main():
    base, new = load(sys.argv[1]), load(sys.argv[2])
    common = sorted(set(base) & set(new))
    missing = sorted(set(base) - set(new))
    added = sorted(set(new) - set(base))
    if missing:
        print(f"MISSING in new sweep ({len(missing)}): {missing}")
    if added:
        print(f"ADDED in new sweep ({len(added)}): {added}")

    suspects, improved = [], []
    for q in common:
        b, n = base[q], new[q]
        if n > b * 1.2 and n - b > 0.3:
            suspects.append((q, b, n))
        elif b > n * 1.2 and b - n > 0.3:
            improved.append((q, b, n))

    tb, tn = sum(base[q] for q in common), sum(new[q] for q in common)
    print(f"common queries: {len(common)}  baseline total {tb:.1f}s  "
          f"new total {tn:.1f}s  ratio {tn / tb:.3f}")
    ratios = sorted(new[q] / base[q] for q in common if base[q] > 0)
    print(f"median per-query ratio: {ratios[len(ratios) // 2]:.3f}")

    print(f"\nSUSPECTS (>20% AND >0.3s slower): {len(suspects)}")
    for q, b, n in sorted(suspects, key=lambda x: x[1] - x[2]):
        print(f"  {q:<32} {b:7.2f}s -> {n:7.2f}s  (+{n - b:.2f}s, "
              f"{n / b:.2f}x)")
    print(f"\nimproved (>20% AND >0.3s faster): {len(improved)}")
    for q, b, n in sorted(improved, key=lambda x: x[2] - x[1]):
        print(f"  {q:<32} {b:7.2f}s -> {n:7.2f}s  ({n - b:.2f}s, "
              f"{n / b:.2f}x)")


if __name__ == "__main__":
    main()
