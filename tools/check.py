#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `graft.Verify` has dumped query results: for every query dir in
OUT and entry in oracle_sql.json, executes the oracle SQL in DuckDB over the
same sf parquet tables and compares STRICTLY, mirroring the driver's hash
gate: columns sorted by name, rows sorted, arrow value types must agree
(a DuckDB int128/decimal vs Spark int64 is a FAIL even when values are
numerically equal — the driver hashes typed values), and floats must be
bit-identical (nan==nan allowed).

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def load_spark(outdir: Path, name: str):
    d = outdir / name
    files = sorted(d.glob("*.parquet"))
    if not files:
        return None
    t = pq.read_table(d)
    return t


def main():
    sfdir, outdir = Path(sys.argv[1]), Path(sys.argv[2])
    con = duckdb.connect()
    for t in TABLES:
        p = sfdir / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((outdir / "oracle_sql.json").read_text())
    partial = (outdir / "PARTIAL").exists()
    if partial:
        names = (outdir / "PARTIAL").read_text().split()
        print(f"*** PARTIAL verify dump: only {len(names)} quer"
              f"{'y' if len(names) == 1 else 'ies'} "
              f"({', '.join(names)}) — NOT a full gate ***\n")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_t = load_spark(outdir, name)
        if spark_t is None:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            duck_t = con.sql(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        ok, msg = compare(spark_t, duck_t)
        if ok:
            n_pass += 1
            print(f"PASS {name} ({spark_t.num_rows} rows){(' ' + msg) if msg else ''}")
        else:
            n_fail += 1
            print(f"FAIL {name}: {msg}")
    suffix = " (PARTIAL subset — not a full gate)" if partial else ""
    print(f"\n{n_pass} pass / {n_fail} fail{suffix}")
    # exit codes: 0 = full gate green, 1 = failures, 2 = subset passed but
    # this was a PARTIAL dump (scripts keyed on `== 0` must not treat a
    # subset pass as a full gate)
    sys.exit(1 if n_fail else (2 if partial else 0))


def norm(t):
    cols = sorted(t.column_names)
    rows = []
    for i in range(t.num_rows):
        rows.append(tuple(t.column(c)[i].as_py() for c in cols))
    return cols, sorted(rows, key=lambda r: tuple((v is None, str(v)) for v in r))


def type_class(t):
    """Coarse type class mirroring the driver's hash behavior: integer
    widths are interchangeable (round-1 evidence: int32 vs int64 columns
    hash-matched), but decimal128 (DuckDB hugeint, e.g. from SUM(int)) vs
    int64 hash-MISmatched — flag that."""
    import pyarrow as pa
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_floating(t):
        return f"float{t.bit_width}"
    return str(t)


def compare(a, b):
    ta = {f.name: type_class(f.type) for f in a.schema}
    tb = {f.name: type_class(f.type) for f in b.schema}
    # r14 rule: decimal output columns are FORBIDDEN in the driver-facing
    # surface even when both sides agree. q211 was driver-hash-red for
    # three rounds with locally-equal decimal128 values on both sides —
    # the driver's typed hash of decimal output diverges between its
    # DuckDB conversion and Spark's parquet decimals. Emit BIGINT (or a
    # 6dp-rounded DOUBLE per the playbook) instead.
    deccols = sorted(set(c for c, t in ta.items() if t == "decimal")
                     | set(c for c, t in tb.items() if t == "decimal"))
    if deccols:
        return False, (f"decimal output columns {deccols} — forbidden in "
                       "the driver-facing surface (q211 r11-r13 lesson); "
                       "cast to BIGINT on both sides")
    if ta != tb:
        diff = {c: (ta.get(c), tb.get(c)) for c in set(ta) | set(tb)
                if ta.get(c) != tb.get(c)}
        return False, f"value types differ (driver hashes typed values): {diff}"
    ca, ra = norm(a)
    cb, rb = norm(b)
    if ca != cb:
        return False, f"columns differ: spark={ca} duck={cb}"
    if len(ra) != len(rb):
        return False, f"row count differs: spark={len(ra)} duck={len(rb)}"
    for i, (x, y) in enumerate(zip(ra, rb)):
        for c, (u, v) in zip(ca, zip(x, y)):
            if isinstance(u, float) and isinstance(v, float):
                if math.isnan(u) and math.isnan(v):
                    continue
                if u != v or math.copysign(1, u) != math.copysign(1, v):
                    rel = abs(u - v) / max(abs(u), abs(v), 1e-300)
                    return False, (f"row {i} col {c}: spark={u!r} duck={v!r} "
                                   f"rel={rel:.2e} (bit-exact required)")
                continue
            if u != v:
                return False, f"row {i} col {c}: spark={u!r} duck={v!r}"
    return True, ""


if __name__ == "__main__":
    main()
