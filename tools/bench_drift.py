#!/usr/bin/env python3
"""Mechanical drift-vs-regression adjudication (VERDICT r15 task 2).

Reads tools/bench_history.tsv (appended by graft.Bench on every full
session: session label, query, min-of-reps seconds, and the session's
fixed-work calibration anchor) and compares the two most recent
sessions on ANCHOR-NORMALIZED per-query time: norm = seconds / anchor.
Uniform host drift (CPU contention, thermal) moves the anchor and the
queries together and cancels; a code regression moves only its query
and survives.

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
    rows = {}
    order = []
    for ln in HIST.read_text().splitlines()[1:]:
        s, q, sec, anc = ln.split("\t")
        if s not in rows:
            rows[s] = {}
            order.append(s)
        rows[s][q] = (float(sec), float(anc))
    if args.sessions:
        a, b = args.sessions
    elif len(order) >= 2:
        a, b = order[-2], order[-1]
    else:
        print("only one session in history — nothing to compare yet")
        return 0
    anc_a = next(iter(rows[a].values()))[1]
    anc_b = next(iter(rows[b].values()))[1]
    print(f"comparing {a} (anchor {anc_a:.2f}s) -> {b} (anchor {anc_b:.2f}s); "
          f"raw host drift factor ~{anc_b / anc_a:.2f}x")
    flagged = []
    for q in sorted(set(rows[a]) & set(rows[b])):
        sa, sb = rows[a][q][0], rows[b][q][0]
        na, nb = sa / anc_a, sb / anc_b
        ratio = nb / na if na > 0 else float("inf")
        if (ratio > args.threshold or ratio < 1 / args.threshold) \
                and abs(sb - sa) > 0.3:
            flagged.append((q, sa, sb, ratio))
    gained = sorted(set(rows[b]) - set(rows[a]))
    lost = sorted(set(rows[a]) - set(rows[b]))
    if gained:
        print(f"new queries in {b}: {', '.join(gained)}")
    if lost:
        print(f"queries gone in {b}: {', '.join(lost)}")
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
