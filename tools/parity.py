#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and compare with the Verify parquet
dumps (sorted rows, sorted columns, exact values).  Dev tool only — the
shipped engine is Scala."""
import json, sys, glob, math
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"MISSING  {name}: no spark output")
        fails += 1
        continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {e}")
        fails += 1
        continue
    got = duckdb.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
    ec, gc = sorted(exp.columns), sorted(got.columns)
    if ec != gc:
        print(f"SCHEMA   {name}: oracle={ec} spark={gc}")
        fails += 1
        continue
    exp = exp[ec].sort_values(ec).reset_index(drop=True)
    got = got[ec].sort_values(ec).reset_index(drop=True)
    if len(exp) != len(got):
        print(f"ROWS     {name}: oracle={len(exp)} spark={len(got)}")
        fails += 1
        continue
    bad = None
    for c in ec:
        ev, gv = exp[c].tolist(), got[c].tolist()
        for i, (a, b) in enumerate(zip(ev, gv)):
            same = (a == b) or (isinstance(a, float) and isinstance(b, float)
                                and (a == b or (math.isnan(a) and math.isnan(b))))
            if not same:
                bad = (c, i, a, b)
                break
        if bad:
            break
    if bad:
        print(f"VALUE    {name}: col={bad[0]} row={bad[1]} oracle={bad[2]!r} spark={bad[3]!r}")
        fails += 1
    else:
        print(f"OK       {name}: {len(exp)} rows")
print("FAILS:", fails)
sys.exit(1 if fails else 0)
