#!/usr/bin/env python3
"""Time the DuckDB oracle queries at a given SF for bench comparison."""
import json, sys, time, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
oracle = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"))
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
out = {}
for name, sql in sorted(oracle.items()):
    # warmup
    try:
        con.execute(sql).fetchall()
        t0 = time.time()
        con.execute(sql).fetchall()
        out[name] = round(time.time() - t0, 4)
    except Exception as e:
        out[name] = None
print(json.dumps({"sf": sf_dir, "queries": out, "total": round(sum(v for v in out.values() if v), 2)}))
