#!/usr/bin/env python3
"""DESCRIBE every oracle SQL in DuckDB; emit one line per column:

    GRAFT\t<oracle-name>\t<column>\t<TYPE>

(a GRAFT-tagged tab-separated record per column; errors emit a
__error__ column). Line-oriented on purpose: the Scala spec has no JSON
library, and a bracket-matching regex walk cannot represent list types
like BIGINT[] — tab records can carry ANY type name, and stray
stderr/warning lines (the spec reads a combined stream to avoid pipe
deadlock) are simply skipped.

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
    def record(name, col, tpe):
        # tabs/newlines cannot appear inside a record field
        clean = lambda s: " ".join(str(s).split())
        print("GRAFT\t%s\t%s\t%s" % (clean(name), clean(col), clean(tpe)))
    for name, sql in sorted(oracle.items()):
        try:
            rows = con.execute("DESCRIBE " + sql).fetchall()
            for r in rows:
                record(name, r[0], r[1])
        except Exception as e:
            record(name, "__error__", str(e).splitlines()[0][:300])

if __name__ == "__main__":
    main()
