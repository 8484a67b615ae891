#!/usr/bin/env python3
"""Side-by-side single-node throughput: DuckDB executing each oracle SQL
vs the Spark engine's per-query bench times.

The driver's gate compares BENCH_r{N}.json against BASELINE.md's envelope;
this tool adds direct evidence for "matches-or-beats the reference's
single-node throughput": DuckDB is a strong native single-node engine
running the IDENTICAL semantics (the oracle SQL), so spark_time <= ~2x
duck_time at sf0.1 means the Spark plans carry no pathological overhead,
and spark_time << duck_time flags where the distributed formulation wins
outright.

Usage: python3 tools/bench_oracle.py <sfDir> <verifyOut> [benchJson]
  sfDir      e.g. /root/testdata/sf0.1
  verifyOut  a dir produced by graft.Verify (for oracle_sql.json)
  benchJson  optional BENCH-style json with {"queries": {name: sec}}
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sfdir, outdir = Path(sys.argv[1]), Path(sys.argv[2])
    bench = {}
    if len(sys.argv) > 3:
        bench = json.loads(Path(sys.argv[3]).read_text()).get("queries", {})
    con = duckdb.connect()
    for t in TABLES:
        p = sfdir / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((outdir / "oracle_sql.json").read_text())
    rows = []
    for name, sql in sorted(oracle.items()):
        best = None
        try:
            # min of up to 3 reps, but stop repeating once a run exceeds
            # 60 s — a slow cell is already unambiguous, and the heavy
            # graph/similarity oracles would otherwise dominate the
            # harness's wall clock three times over
            for _ in range(3):
                t0 = time.monotonic()
                con.sql(sql).fetchall()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
                if dt > 60:
                    break
        except Exception as e:  # missing table, dialect drift — skip, don't die
            print(f"{name:38} ERROR: {type(e).__name__}: {str(e).splitlines()[0][:80]}")
            continue
        rows.append((name, best, bench.get(name)))
        print(f"# done {name}: {best:.2f}s", flush=True)
    print(f"{'query':38} {'duckdb_s':>9} {'spark_s':>9} {'ratio':>7}")
    for name, d, s in rows:
        r = f"{s / d:7.2f}" if s is not None and d else "      -"
        sv = f"{s:9.2f}" if s is not None else "        -"
        print(f"{name:38} {d:9.2f} {sv} {r}")
    # totals over the MATCHED set only — summing duckdb over all oracled
    # queries against spark over the benched subset would compare
    # different query sets
    matched = [(d, s) for _, d, s in rows if s is not None]
    unmatched = len(rows) - len(matched)
    if matched:
        total_d = sum(d for d, _ in matched)
        total_s = sum(s for _, s in matched)
        note = f" ({unmatched} oracled queries not in bench json)" if unmatched else ""
        print(f"{'TOTAL (matched queries)':38} {total_d:9.2f} {total_s:9.2f}{note}")
    else:
        print("no bench json supplied: duckdb-only timings above")


if __name__ == "__main__":
    main()
