#!/usr/bin/env python3
"""Round-17 sf10 battery post-processor: prints the PERF.md-ready
summary — total / n / errors / restarts, and the steep-row attribution
table (sf0.1 battery vs sf1 battery vs sf10 battery, ratio per decade)
mirroring the r16 sf1 table.

Usage: python3 tools/sf10_report.py <sf10_detail.json> [top_n]
Reference battery records are located by (sf, n_queries>=330) among
target/bench_detail_*.json.
"""
import glob
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    sf10 = load(sys.argv[1])
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    ref01 = ref1 = None
    for p in sorted(glob.glob("target/bench_detail_*.json")):
        d = load(p)
        if len(d.get("queries", {})) < 300:
            continue
        if "sf0.1" in str(d.get("sf")):
            ref01 = d   # latest full sf0.1 battery
        elif "graft-sf1" in str(d.get("sf")) and "sf10" not in str(d.get("sf")):
            ref1 = d
    q10 = sf10["queries"]
    print(f"sf10 battery: total {sf10['value']:.1f} s, "
          f"{len(q10)} gates, {len(sf10.get('errors', {}))} errors, "
          f"restarts {sf10.get('restarts', [])}")
    if sf10.get("errors"):
        for k, v in sf10["errors"].items():
            print(f"  ERROR {k}: {v}")
    if ref1:
        print(f"sf1 ref: total {ref1['value']:.1f} s / {len(ref1['queries'])}")
    if ref01:
        print(f"sf0.1 ref: total {ref01['value']:.1f} s / {len(ref01['queries'])}")
    rows = []
    for q, v10 in q10.items():
        v1 = ref1["queries"].get(q) if ref1 else None
        v01 = ref01["queries"].get(q) if ref01 else None
        if v1 and v1 > 0.05:
            rows.append((v10 / v1, q, v01, v1, v10))
    rows.sort(reverse=True)
    print("\n| gate | sf0.1 battery | sf1 battery | sf10 battery | sf1→sf10 |")
    print("|---|---|---|---|---|")
    for r, q, v01, v1, v10 in rows[:top_n]:
        print(f"| {q} | {v01 if v01 is None else f'{v01:.2f}'} | "
              f"{v1:.2f} | {v10:.2f} | {r:.1f}× |")
    med = sorted(x[0] for x in rows)[len(rows) // 2]
    print(f"\nmedian per-gate sf1→sf10 battery ratio: {med:.2f}× "
          f"over {len(rows)} comparable gates")


if __name__ == "__main__":
    main()
