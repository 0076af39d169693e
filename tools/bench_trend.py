#!/usr/bin/env python3
"""Maintain BENCH_TREND.jsonl — one row per round, diffable without git
archaeology (r10 verdict #7).

Each line: {"round": N, "total": sec, "sf": ..., "n": query_count|null,
"noisy": [...]|null, "canary": {...}|null, "canary_mean": x.xx|null,
"attempt": N|null, "queries": {...}|null}.

canary_mean (mean of the canary boundary ratios) and attempt (the
bench hunter's attempt number, stamped into bench_full.json via
SPARK_GRAFT_BENCH_ATTEMPT) are the anchor's provenance: cross-round
window normalization (e.g. r18-vs-r15's 1.23x arithmetic) is computed
from these fields instead of verdict prose (r18 verdict #7).

Sources:
  - BENCH_r{NN}.json (driver artifacts): total only — their stdout tail
    is a 2000-char window, per-query maps are truncated there.
  - bench_full.json (the committed full map written by graft.Bench):
    supplies per-query seconds, the noisy list and (from r11 on) the
    host-window canary for the round given via --round.

Usage:
  python3 tools/bench_trend.py                 # backfill all BENCH_r*.json
  python3 tools/bench_trend.py --round 11      # + attach bench_full.json
                                               #   as round 11's full row
Idempotent: rows are rebuilt from the artifacts each run, so re-running
after a bench refresh updates the current round's row in place.
"""
import argparse
import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def backfill_rows():
    rows = {}
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            art = json.load(f)
        parsed = art.get("parsed") or {}
        rows[rnd] = {
            "round": rnd,
            "total": parsed.get("value"),
            "sf": art.get("sf"),
            "n": None,
            "noisy": None,
            "canary": None,
            "canary_mean": None,
            "attempt": None,
            "queries": None,
        }
    return rows


# Hunter attempt numbers for anchors landed before bench_full.json
# carried an "attempt" field — from the anchor commits' recorded
# history (r18: f70371e "standing anchor is attempt 7"). Rounds whose
# anchor attempt was never recorded stay null.
KNOWN_ATTEMPTS = {18: 7}


def canary_mean(canary):
    ratios = (canary or {}).get("ratios") or []
    if not ratios:
        return None
    return round(sum(ratios) / len(ratios), 4)


def attach_full(rows, rnd):
    path = os.path.join(REPO, "bench_full.json")
    with open(path) as f:
        full = json.load(f)
    rows[rnd] = {
        "round": rnd,
        "total": full.get("total"),
        "sf": full.get("sf"),
        "n": len(full.get("queries") or {}),
        "noisy": full.get("noisy"),
        "canary": full.get("canary"),
        "canary_mean": canary_mean(full.get("canary")),
        "attempt": (full.get("attempt")
                    if full.get("attempt") is not None
                    else KNOWN_ATTEMPTS.get(rnd)),
        "queries": {q: v.get("sec") for q, v in (full.get("queries") or {}).items()},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None,
                    help="attach bench_full.json as this round's full row")
    args = ap.parse_args()

    out = os.path.join(REPO, "BENCH_TREND.jsonl")
    rows = backfill_rows()
    # keep any full rows a previous run attached (they carry per-query
    # maps the BENCH_r artifacts can't reconstruct)
    if os.path.exists(out):
        with open(out) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                row = json.loads(line)
                if row.get("queries") is not None:
                    # backfill provenance on rows written before the
                    # fields existed (r18 verdict #7)
                    if row.get("canary_mean") is None:
                        row["canary_mean"] = canary_mean(row.get("canary"))
                    if row.get("attempt") is None:
                        row["attempt"] = KNOWN_ATTEMPTS.get(row["round"])
                    rows[row["round"]] = row
    if args.round is not None:
        attach_full(rows, args.round)

    with open(out, "w") as f:
        for rnd in sorted(rows):
            f.write(json.dumps(rows[rnd], sort_keys=True) + "\n")
    print(f"wrote {out}: rounds {sorted(rows)}")


if __name__ == "__main__":
    main()
