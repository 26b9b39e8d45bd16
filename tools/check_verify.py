#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (NOT part of the library).

Runs each oracle SQL in DuckDB against the sf parquet tables and compares
with the Spark results that graft.Verify dumped to OUT_DIR. Emulates the
driver: columns sorted by name, rows sorted, values hashed (here: exact
compare with per-value repr).

Usage: python3 tools/check_verify.py SF_DIR OUT_DIR
"""
import sys, os, json, glob, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver hashes values; we canonicalize floats to 9 sig digits
        return format(v, ".9g")
    if isinstance(v, bool):
        return "true" if v else "false"
    if v is None:
        return "null"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_rowsonly = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        got_rows, got_cols = got.fetchall(), [d[0] for d in got.description]
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(got_rows)} rows")
            n_rowsonly += 1
            continue
        try:
            exp = con.execute(oracles[name])
            exp_rows, exp_cols = exp.fetchall(), [d[0] for d in exp.description]
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        gc, gr = canon(got_rows, got_cols)
        ec, er = canon(exp_rows, exp_cols)
        if gc != ec:
            print(f"✗ {name}: SCHEMA mismatch spark={gc} duck={ec}")
            n_fail += 1
        elif len(gr) != len(er):
            print(f"✗ {name}: ROWCOUNT spark={len(gr)} duck={len(er)}")
            n_fail += 1
        elif gr != er:
            bad = [(a, b) for a, b in zip(gr, er) if a != b][:3]
            print(f"✗ {name}: VALUE mismatch, first diffs: {bad}")
            n_fail += 1
        else:
            print(f"✓ {name}: {len(gr)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
