#!/usr/bin/env python3
"""Cross-round per-query bench ledger.

Collates the per-round driver records (BENCH_r*.json — whose `tail` field
keeps only the truncated end of the detail line) with the full local
forensic records (target/bench_detail_*.json, one per Bench run since
r15) into ONE per-query table, and normalizes for host drift against the
same-code proxy basket PERF.md uses (dd_ppjoin, tx_bpe_train, dq_corr):
a query's NORMALIZED value is its raw median divided by that run's basket
factor (geometric mean of basket medians relative to the reference run),
so a uniform host slowdown cancels and only real per-query movement
remains. This is the table the judge reconstructs by hand each round
(r16 verdict item 7).

Usage:
  python3 tools/bench_history.py                 # markdown, top movers
  python3 tools/bench_history.py --csv out.csv   # full CSV
  python3 tools/bench_history.py --ref r15       # drift reference run
  python3 tools/bench_history.py --all-details   # every local detail run
"""
import argparse
import csv
import glob
import json
import math
import os
import re
import sys

BASKET = ["dd_ppjoin", "tx_bpe_train", "dq_corr"]
PASS_RE = re.compile(r'"([A-Za-z0-9_]+)":\[([0-9.eE+,-]+)\]')


def median_of(passes):
    xs = sorted(passes)
    return xs[len(xs) // 2]


def from_bench_tail(path):
    """Per-query medians recoverable from a BENCH_rN.json tail window.

    The driver keeps only ~2000 chars of stdout, so the head of the
    detail line is cut: only the alphabetically-late queries survive.
    The FIRST regex hit may be a torn array (its head truncated) — drop
    it unless the match starts after a '{' or ',' boundary we can trust.
    """
    with open(path) as f:
        rec = json.load(f)
    tail = rec.get("tail", "")
    out = {}
    for m in PASS_RE.finditer(tail):
        name, arr = m.group(1), m.group(2)
        if m.start() > 0 and tail[m.start() - 1] not in "{,":
            continue  # torn first entry
        try:
            passes = [float(x) for x in arr.split(",") if x]
        except ValueError:
            continue
        if passes and name not in ("n", "rc"):
            out[name] = median_of(passes)
    total = None
    tm = re.search(r'"metric":"total","value":([0-9.eE+-]+)', tail)
    if tm:
        total = float(tm.group(1))
    return out, total, rec.get("sf"), restarts_from_tail(tail)


def restarts_from_tail(tail):
    """Names in the detail line's "restarts" array, when the tail window
    kept it. A restart-tainted gate's timed passes ran against a freshly
    re-warmed (or cold) session, so its median is NOT steady-state
    comparable (r16 advisory) — collation must flag it, not average it.
    """
    m = re.search(r'"restarts":\[([^\]]*)\]', tail)
    if not m:
        return set()
    return {x.strip().strip('"') for x in m.group(1).split(",") if x.strip()}


def from_detail(path):
    with open(path) as f:
        rec = json.load(f)
    qs = {k: float(v) for k, v in rec.get("queries", {}).items()}
    return (qs, float(rec.get("value", 0.0)), rec.get("sf"),
            set(rec.get("restarts", []) or []))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    ap.add_argument("--ref", default=None,
                    help="run label to normalize against (default: earliest "
                         "run carrying the full proxy basket)")
    ap.add_argument("--csv", default=None, help="write full CSV here")
    ap.add_argument("--top", type=int, default=15,
                    help="show N biggest normalized movers (last vs ref)")
    ap.add_argument("--all-details", action="store_true",
                    help="include every target/bench_detail_*.json run "
                         "(default: only the latest, as the current-round "
                         "local record)")
    args = ap.parse_args()

    runs = {}   # label -> {query: median}
    totals = {}
    tainted = {}  # label -> set of restart-tainted gate names
    for p in sorted(glob.glob(os.path.join(args.repo, "BENCH_r*.json"))):
        label = "r" + re.search(r"BENCH_r(\d+)", p).group(1).lstrip("0").zfill(2)
        qs, total, _, rst = from_bench_tail(p)
        if qs:
            runs[label] = qs
            totals[label] = total
            tainted[label] = rst
    details = sorted(glob.glob(os.path.join(args.repo, "target",
                                            "bench_detail_*.json")))
    if not args.all_details:
        details = details[-1:]
    for p in details:
        stamp = re.search(r"bench_detail_(\d+_\d+)", p).group(1)
        label = "d" + stamp
        qs, total, sf, rst = from_detail(p)
        # local records at other SFs are scaling forensics, not round
        # comparables — keep only sf0.1 (the driver's bench scale)
        if sf and "sf0.1" not in str(sf) and "0.1" != str(sf):
            continue
        runs[label] = qs
        totals[label] = total
        tainted[label] = rst

    if not runs:
        print("no bench records found", file=sys.stderr)
        return 2

    labels = sorted(runs)
    # drift factor per run: geomean(basket medians) relative to reference
    def basket_geomean(qs):
        vals = [qs[b] for b in BASKET if b in qs]
        if len(vals) != len(BASKET):
            return None
        return math.exp(sum(math.log(v) for v in vals) / len(vals))

    ref = args.ref
    if ref is None:
        for lb in labels:
            if basket_geomean(runs[lb]) is not None:
                ref = lb
                break
        if ref is None:
            ref = labels[0]

    def drift_factor(lb):
        """Preferred: proxy-basket geomean ratio. BENCH tails lose the
        early-alphabet basket queries to the driver's 2000-char stdout
        window, so fall back to the median of per-query ratios over the
        shared (ref ∩ run) set — self-normalizing and robust to a few
        real movers, which is exactly what a drift factor must be.
        """
        g, rg = basket_geomean(runs[lb]), basket_geomean(runs.get(ref, {}))
        if g and rg:
            return g / rg
        ratios = [runs[lb][q] / runs[ref][q] for q in runs[lb]
                  if q in runs.get(ref, {}) and runs[ref][q] > 0.05]
        if len(ratios) >= 5:
            return sorted(ratios)[len(ratios) // 2]
        return 1.0

    factors = {lb: drift_factor(lb) for lb in labels}

    queries = sorted({q for qs in runs.values() for q in qs})
    if args.csv:
        with open(args.csv, "w", newline="") as f:
            w = csv.writer(f)
            head = ["query"]
            for lb in labels:
                head += [f"{lb}_raw", f"{lb}_norm"]
            w.writerow(head)
            w.writerow(["__basket_factor"] + [x for lb in labels
                       for x in ("", f"{factors[lb]:.4f}")])
            w.writerow(["__total"] + [x for lb in labels for x in
                       (f"{totals.get(lb) or ''}", "")])
            for q in queries:
                row = [q]
                for lb in labels:
                    v = runs[lb].get(q)
                    # "*" marks a restart-tainted median (gate timed after
                    # a session restart: re-warmed, not steady-state)
                    star = "*" if q in tainted.get(lb, ()) else ""
                    row += ["" if v is None else f"{v:.4f}{star}",
                            "" if v is None or math.isnan(factors[lb])
                            else f"{v / factors[lb]:.4f}{star}"]
                w.writerow(row)
        print(f"wrote {args.csv}: {len(queries)} queries × {len(labels)} runs")

    # console: biggest normalized movers, newest full run vs reference
    last = labels[-1]
    print(f"# bench history — drift-normalized vs {ref} "
          f"(basket={','.join(BASKET)})")
    print(f"runs: " + ", ".join(
        f"{lb}[factor {factors[lb]:.2f}, total "
        f"{totals.get(lb) and f'{totals[lb]:.1f}' or '?'} s]"
        for lb in labels))
    movers = []
    skipped_tainted = []
    for q in queries:
        a, b = runs.get(ref, {}).get(q), runs[last].get(q)
        if a and b and a > 0.05:  # sub-50ms rows are pure noise
            # restart-tainted medians (gate timed after a session restart)
            # are incomparable (r16 advisory) — flag, never rank
            if q in tainted.get(ref, ()) or q in tainted.get(last, ()):
                skipped_tainted.append(q)
                continue
            movers.append((b / factors[last] / (a / factors[ref]), q, a, b))
    movers.sort(reverse=True)
    if skipped_tainted:
        print(f"\nrestart-tainted (excluded from movers, '*' in CSV): "
              + ", ".join(sorted(skipped_tainted)))
    print(f"\n| query | {ref} raw | {last} raw | norm ratio |")
    print("|---|---|---|---|")
    for r, q, a, b in movers[:args.top]:
        print(f"| {q} | {a:.3f} | {b:.3f} | {r:.2f}× |")
    if movers:
        med = sorted(m[0] for m in movers)[len(movers) // 2]
        print(f"\nmedian normalized ratio over {len(movers)} comparable "
              f"queries: {med:.3f}× (≈1.0 ⇒ no real movement)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
