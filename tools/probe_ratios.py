#!/usr/bin/env python3
"""Scale-probe ratio table: compare Bench `metric:detail` lines across
scale factors and flag superlinear growth.

Usage: python3 tools/probe_ratios.py <sf0.1.json> <sf1.json> <sf10.json>

Each input is one Bench `{"metric":"detail",...}` JSON line (grep it from
the run log). Prints a markdown table of per-query medians and decade
ratios, sorted by the worst sf1→sf10 ratio, and a SUPERLINEAR list
(>10×/decade — wall growing faster than the data).
"""
import sys, json

def load(p):
    with open(p) as f:
        return json.loads(f.read())

a, b, c = (load(p) for p in sys.argv[1:4])
qa, qb, qc = a["queries"], b["queries"], c["queries"]
names = sorted(set(qa) & set(qb) & set(qc))
rows = []
for n in names:
    r1 = qb[n] / qa[n] if qa[n] > 0 else float("inf")
    r2 = qc[n] / qb[n] if qb[n] > 0 else float("inf")
    rows.append((n, qa[n], qb[n], qc[n], r1, r2))
rows.sort(key=lambda r: -r[5])
print("| query | sf0.1 | sf1 | sf10 | ×(0.1→1) | ×(1→10) |")
print("|---|---|---|---|---|---|")
for n, x, y, z, r1, r2 in rows:
    print(f"| {n} | {x:.2f} | {y:.2f} | {z:.2f} | {r1:.1f} | {r2:.1f} |")
tot = (sum(qa[n] for n in names), sum(qb[n] for n in names),
       sum(qc[n] for n in names))
print(f"\ntotals: sf0.1 {tot[0]:.1f} s, sf1 {tot[1]:.1f} s, sf10 {tot[2]:.1f} s "
      f"({len(names)} queries)")
bad = [r for r in rows if r[5] > 10.0]
errs = {**a.get("errors", {}), **b.get("errors", {}), **c.get("errors", {})}
if bad:
    print("\nSUPERLINEAR (>10x per decade at sf1->sf10):")
    for n, x, y, z, r1, r2 in bad:
        print(f"  {n}: {y:.2f} -> {z:.2f} s ({r2:.1f}x)")
if errs:
    print("\nERRORS:", json.dumps(errs))
