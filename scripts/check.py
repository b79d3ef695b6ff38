#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs each oracle SQL in DuckDB over the sf tables, loads the engine's
parquet output, and compares: schema (column names), row count, and a
hash of all values with rows sorted and columns ordered by name.
"""
import sys, json, glob, math
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for table in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{sf_dir}/{table}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(x) for x in df.itertuples(index=False, name=None)]
    def norm(v):
        if isinstance(v, float):
            if math.isnan(v): return "nan"
            return repr(v)
        return repr(v)
    rows = sorted(tuple(norm(v) for v in r) for r in rows)
    return cols, rows

n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no engine output"); n_fail += 1; continue
    try:
        eng = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        ora = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {str(e)[:200]}"); n_fail += 1; continue
    ec, er = canon(eng); oc, orr = canon(ora)
    if ec != oc:
        print(f"FAIL {name}: columns engine={ec} oracle={oc}"); n_fail += 1; continue
    if len(er) != len(orr):
        print(f"FAIL {name}: rows engine={len(er)} oracle={len(orr)}"); n_fail += 1; continue
    if er != orr:
        bad = next(i for i,(a,b) in enumerate(zip(er,orr)) if a != b)
        print(f"FAIL {name}: value mismatch at sorted-row {bad}:\n  eng={er[bad]}\n  ora={orr[bad]}")
        n_fail += 1; continue
    print(f"PASS {name} ({len(er)} rows)"); n_pass += 1

print(f"\n{n_pass} passed, {n_fail} failed")
sys.exit(1 if n_fail else 0)
