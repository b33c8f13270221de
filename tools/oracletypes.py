#!/usr/bin/env python3
"""DESCRIBE every oracle SQL in DuckDB and emit {name: [[col, type], ...]}.

Used by OracleTypeSpec to pin the oracle-side type contract: DuckDB's
SUM(...) over integers returns HUGEINT, and any oracle that exposes an
un-cast SUM-derived integer column hash-diverges from the Spark twin even
when every value is identical (the round-8 m7_shard_manifest failure).
DESCRIBE plans without executing, so this is fast at any SF.

Dev/test tool only — never shipped in the library.
"""
import json, sys, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))
    out = {}
    for name, sql in sorted(oracle.items()):
        try:
            rows = con.execute("DESCRIBE " + sql).fetchall()
            out[name] = [[r[0], r[1]] for r in rows]
        except Exception as e:
            # strip chars the Scala-side minimal JSON walk can't handle
            msg = str(e).splitlines()[0][:300]
            msg = "".join(c if c not in '"\\[]' else ' ' for c in msg)
            out[name] = [["__error__", msg]]
    print(json.dumps(out))

if __name__ == "__main__":
    main()
