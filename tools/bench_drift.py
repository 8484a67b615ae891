#!/usr/bin/env python3
"""Mechanical drift-vs-regression adjudication (VERDICT r15 task 2).

Reads tools/bench_history.tsv (appended by graft.Bench on every full
session: session label, query, min-of-reps seconds, the session's
fixed-work calibration anchor, sf dir, cpu count) and compares the two
most recent sessions on ANCHOR-NORMALIZED per-query time:
norm = seconds / anchor. Uniform host drift (CPU contention, thermal)
moves the anchor and the queries together and cancels; a code
regression moves only its query and survives.

Safety rails (review r16):
- sessions that measured different work (different sf dir or cpu
  count) are refused, not compared — an sf0.01 smoke next to the sf0.1
  record would flag everything ~10x;
- every row carries ITS OWN anchor and normalization uses the row's
  anchor, so a reused session label (crash + rerun under the same
  SPARK_GRAFT_ROUND) cannot normalize one run's seconds by another
  run's anchor;
- failed queries never reach the file (Bench excludes them).

A query is flagged when its normalized time moved more than THRESHOLD
(default 1.3x, the r15-verdict bar) in either direction AND the
absolute move is > 0.3 s (sub-second queries bounce multiplicatively on
scheduler noise alone). Exit 1 if any query regressed past the bar —
usable as a gate.

Usage: python3 tools/bench_drift.py [--threshold 1.3] [A B]
  A B: optional session labels to compare (default: last two).
"""
import argparse
import sys
from pathlib import Path

HIST = Path(__file__).resolve().parent / "bench_history.tsv"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=1.3)
    ap.add_argument("sessions", nargs="*")
    args = ap.parse_args()
    if not HIST.exists():
        print(f"no history at {HIST} — run graft.Bench first")
        return 0
    rows = {}   # session -> {query: (seconds, anchor)}
    meta = {}   # session -> (sf, cpus)
    order = []
    for ln in HIST.read_text().splitlines()[1:]:
        parts = ln.split("\t")
        s, q, sec, anc = parts[0], parts[1], float(parts[2]), float(parts[3])
        sf, cpus = (parts[4], parts[5]) if len(parts) >= 6 else ("?", "?")
        if s not in rows:
            rows[s] = {}
            meta[s] = (sf, cpus)
            order.append(s)
        rows[s][q] = (sec, anc)
    if args.sessions:
        a, b = args.sessions
        if a not in rows or b not in rows:
            print(f"unknown session label; have: {', '.join(order)}")
            return 2
    elif len(order) >= 2:
        a, b = order[-2], order[-1]
    else:
        print("only one session in history — nothing to compare yet")
        return 0
    if meta[a] != meta[b]:
        print(f"refusing to compare {a} {meta[a]} with {b} {meta[b]}: "
              "different sf/cpus measure different work")
        return 2
    anc_a = sum(v[1] for v in rows[a].values()) / len(rows[a])
    anc_b = sum(v[1] for v in rows[b].values()) / len(rows[b])
    print(f"comparing {a} (anchor {anc_a:.2f}s) -> {b} (anchor {anc_b:.2f}s) "
          f"at sf={meta[a][0]} cpus={meta[a][1]}; "
          f"raw host drift factor ~{anc_b / anc_a:.2f}x")
    flagged = []
    for q in sorted(set(rows[a]) & set(rows[b])):
        sa, ra = rows[a][q]
        sb, rb = rows[b][q]
        na, nb = sa / ra, sb / rb  # each row's OWN anchor
        ratio = nb / na if na > 0 else float("inf")
        if (ratio > args.threshold or ratio < 1 / args.threshold) \
                and abs(sb - sa) > 0.3:
            flagged.append((q, sa, sb, ratio))
    gained = sorted(set(rows[b]) - set(rows[a]))
    lost = sorted(set(rows[a]) - set(rows[b]))
    if gained:
        print(f"new queries in {b}: {', '.join(gained)}")
    if lost:
        print(f"queries gone in {b} (new, failed, or removed): "
              f"{', '.join(lost)}")
    if not flagged:
        print(f"no query moved >{args.threshold}x anchor-normalized — "
              "any total delta is host drift")
        return 0
    print(f"{'query':40s} {'old(s)':>8s} {'new(s)':>8s} {'norm-ratio':>10s}")
    regressed = False
    for q, sa, sb, r in sorted(flagged, key=lambda x: -x[3]):
        print(f"{q:40s} {sa:8.2f} {sb:8.2f} {r:9.2f}x")
        if r > args.threshold:
            regressed = True
    return 1 if regressed else 0


if __name__ == "__main__":
    sys.exit(main())
