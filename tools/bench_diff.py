#!/usr/bin/env python3
"""Canary-aware per-query bench regression report.

Compares the current bench_full.json against the most recent EARLIER
round in BENCH_TREND.jsonl that carries a per-query map, and prints
queries whose min-of-passes moved more than THRESH x (and > FLOOR s) in
either direction. Noise handling per SURVEY §6's interpretation rule:
rows flagged noisy in either run are reported separately (distrust the
number, not the query), and if either run's canary says
window_degraded the report leads with that — totals from a degraded
window are not comparable.

Usage: python3 tools/bench_diff.py [--thresh 1.5] [--floor 0.5]
"""
import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
THRESH, FLOOR = 1.5, 0.5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--thresh", type=float, default=THRESH)
    ap.add_argument("--floor", type=float, default=FLOOR)
    args = ap.parse_args()

    with open(os.path.join(REPO, "bench_full.json")) as f:
        cur = json.load(f)
    prev = None
    with open(os.path.join(REPO, "BENCH_TREND.jsonl")) as f:
        rows = [json.loads(l) for l in f if l.strip()]
    full_rows = [r for r in rows if r.get("queries")]
    # current bench_full may already BE the latest trend row; diff
    # against the latest full row whose map differs from it
    curq = {q: v.get("sec") for q, v in cur["queries"].items()}
    for r in sorted(full_rows, key=lambda r: -r["round"]):
        if r["queries"] != curq:
            prev = r
            break
    if prev is None:
        print("no earlier full per-query row in BENCH_TREND.jsonl")
        return

    for tag, c in (("current", cur.get("canary")),
                   (f"r{prev['round']}", prev.get("canary"))):
        if c and c.get("window_degraded"):
            print(f"WARNING: {tag} run is window_degraded "
                  f"(canary ratios {c.get('ratios')}) — totals not comparable")

    noisy = set(cur.get("noisy") or []) | set(prev.get("noisy") or [])
    prevq = prev["queries"]
    moved, noisy_moved = [], []
    for q, now in sorted(curq.items()):
        then = prevq.get(q)
        if then is None or then <= 0 or now <= 0:
            continue
        ratio = now / then
        if (ratio > args.thresh or ratio < 1 / args.thresh) and \
                max(now, then) > args.floor:
            (noisy_moved if q in noisy else moved).append((q, then, now, ratio))

    new = sorted(set(curq) - set(prevq))
    gone = sorted(set(prevq) - set(curq))
    print(f"current total {cur['total']:.1f}s over {len(curq)} queries; "
          f"r{prev['round']} total {prev['total']:.1f}s over {len(prevq)}")
    if new:
        print(f"new queries (+{sum(curq[q] for q in new):.1f}s): "
              + ", ".join(f"{q} {curq[q]:.2f}s" for q in new))
    if gone:
        print("removed:", ", ".join(gone))
    if moved:
        print(f"moved >{args.thresh}x (above {args.floor}s):")
        for q, then, now, ratio in sorted(moved, key=lambda t: -t[3]):
            print(f"  {q}: {then:.2f} -> {now:.2f}s ({ratio:.2f}x)")
    else:
        print(f"no clean-row movements beyond {args.thresh}x")
    if noisy_moved:
        print("moved but flagged noisy in one run (distrust the number):")
        for q, then, now, ratio in noisy_moved:
            print(f"  {q}: {then:.2f} -> {now:.2f}s ({ratio:.2f}x)")


if __name__ == "__main__":
    main()
