#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/<name>/ parquet (written by graft.Verify) and
<verifyOutDir>/oracle_sql.json, runs each oracle against DuckDB views over
<sfDir>/*.parquet, and compares: column names (sorted), row count, and
values (rows sorted, exact compare; floats compared by repr bit-equality).

Dev tool only — never shipped in the library; mirrors what the driver does
so mismatches surface before the round gate runs.
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # queries that THREW inside graft.Verify: explicit ERR rows so the
    # report is self-contained (an erroring query must not read as merely
    # absent — the round-7 under-count failure mode)
    errors = {}
    err_path = f"{out_dir}/errors.json"
    if os.path.exists(err_path):
        errors = json.load(open(err_path))
    n_pass = n_fail = n_skip = 0
    for name in sorted(errors):
        if only and name not in only:
            continue
        print(f"ERR  {name}: {errors[name].splitlines()[0][:160]}")
        n_fail += 1
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        if only and name not in only:
            continue
        if name in errors:   # already reported as ERR; a leftover output
            continue         # dir from an earlier run must not double-count
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        got = con.execute(f"SELECT * FROM read_parquet({files!r})")
        gcols = [d[0] for d in got.description]
        grows = got.fetchall()
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows-only: {len(grows)} rows)")
            n_skip += 1
            continue
        try:
            exp = con.execute(oracle[name])
            ecols = [d[0] for d in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_fail += 1
        elif len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} != {len(er)}")
            n_fail += 1
        elif gr != er:
            bad = next(i for i, (a, b) in enumerate(zip(gr, er)) if a != b)
            print(f"FAIL {name}: value mismatch at sorted row {bad}:")
            print(f"  spark : {gr[bad]}")
            print(f"  duckdb: {er[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only"
          + (f" ({len(errors)} errored in Verify)" if errors else ""))
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
