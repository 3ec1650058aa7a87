#!/usr/bin/env python3
"""Per-query bench ratchet: compare a new Bench sweep JSON against a
baseline sweep JSON and flag regressions by the round-4 protocol —
a query is a SUSPECT when it is BOTH >20% slower AND >0.3 s slower
than the baseline.

Round 6 adds the executor-CPU column (Bench's "cpu_queries"): CPU time
is robust to the external host-load spikes this box takes, so when both
sweeps carry it, suspects self-adjudicate — a wall-only regression whose
CPU is flat is host noise; a regression with matching CPU growth is code.
Suspects that can't self-adjudicate (no CPU data) still need the
isolated min-of-4 rerun (SPARK_GRAFT_ONLY) before being called real.

Usage: python3 tools/ratchet.py BASELINE.json NEW.json
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    wall = {k: v for k, v in d["queries"].items() if v >= 0}
    cpu = {k: v for k, v in d.get("cpu_queries", {}).items() if v >= 0}
    return wall, cpu


def main():
    (base, bcpu), (new, ncpu) = load(sys.argv[1]), load(sys.argv[2])
    common = sorted(set(base) & set(new))
    missing = sorted(set(base) - set(new))
    added = sorted(set(new) - set(base))
    if missing:
        print(f"MISSING in new sweep ({len(missing)}): {missing}")
    if added:
        print(f"ADDED in new sweep ({len(added)}): {added}")
    if not common:
        sys.exit("ERROR: no common queries between the two sweeps — "
                 "wrong files, or a sweep that errored out entirely.")

    has_cpu = bool(bcpu) and bool(ncpu)

    def cpu_note(q):
        if not (has_cpu and bcpu.get(q, 0) > 0 and q in ncpu):
            return ""
        r = ncpu[q] / bcpu[q]
        tag = "CODE?" if r > 1.2 else ("noise" if r < 1.1 else "mixed")
        return f"  cpu {bcpu[q]:6.2f}s -> {ncpu[q]:6.2f}s ({r:.2f}x, {tag})"

    suspects, improved = [], []
    for q in common:
        b, n = base[q], new[q]
        if n > b * 1.2 and n - b > 0.3:
            suspects.append((q, b, n))
        elif b > n * 1.2 and b - n > 0.3:
            improved.append((q, b, n))

    tb, tn = sum(base[q] for q in common), sum(new[q] for q in common)
    if tb > 0:
        print(f"common queries: {len(common)}  baseline total {tb:.1f}s  "
              f"new total {tn:.1f}s  ratio {tn / tb:.3f}")
    ratios = sorted(new[q] / base[q] for q in common if base[q] > 0)
    if ratios:
        print(f"median per-query wall ratio: {ratios[len(ratios) // 2]:.3f}")
    if has_cpu:
        cc = [q for q in common if bcpu.get(q, 0) > 0 and q in ncpu]
        if cc:
            cr = sorted(ncpu[q] / bcpu[q] for q in cc)
            print(f"median per-query CPU ratio:  {cr[len(cr) // 2]:.3f}  "
                  f"(cpu totals {sum(bcpu[q] for q in cc):.1f}s -> "
                  f"{sum(ncpu[q] for q in cc):.1f}s)")

    print(f"\nSUSPECTS (>20% AND >0.3s slower): {len(suspects)}")
    for q, b, n in sorted(suspects, key=lambda x: x[1] - x[2]):
        print(f"  {q:<32} {b:7.2f}s -> {n:7.2f}s  (+{n - b:.2f}s, "
              f"{n / b:.2f}x){cpu_note(q)}")
    print(f"\nimproved (>20% AND >0.3s faster): {len(improved)}")
    for q, b, n in sorted(improved, key=lambda x: x[2] - x[1]):
        print(f"  {q:<32} {b:7.2f}s -> {n:7.2f}s  ({n - b:.2f}s, "
              f"{n / b:.2f}x){cpu_note(q)}")


if __name__ == "__main__":
    main()
