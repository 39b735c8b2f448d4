#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query result
parquet under OUTDIR, run the paired oracle SQL in DuckDB over the sf
tables, sort columns by name + rows by value, and compare hashes.

Usage: check_oracle.py <sfDir> <outDir> [query ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    # normalize dtypes: ints -> int64, floats -> rounded repr, ts -> str
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.round(9)
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype(str)
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        else:
            out[c] = s.astype(str)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)

fails = 0
names = sorted(os.path.basename(d) for d in glob.glob(f"{out_dir}/q*"))
for name in names:
    if only and name not in only:
        continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet") or glob.glob(f"{out_dir}/{name}/part-*")
    if not files:
        print(f"{name}: NO RESULT FILES")
        fails += 1
        continue
    mine = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    if name not in oracle:
        print(f"{name}: rows={len(mine)} (no oracle — rows-only check: "
              f"{'OK' if len(mine) > 0 else 'EMPTY!'})")
        continue
    try:
        ref = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    a, b = canon(mine), canon(ref)
    if list(a.columns) != list(b.columns):
        print(f"{name}: COLUMN MISMATCH mine={list(a.columns)} oracle={list(b.columns)}")
        fails += 1
        continue
    if len(a) != len(b):
        print(f"{name}: ROWCOUNT MISMATCH mine={len(a)} oracle={len(b)}")
        fails += 1
        continue
    if not a.equals(b):
        neq = (a != b).any(axis=1)
        print(f"{name}: VALUE MISMATCH on {neq.sum()}/{len(a)} rows")
        i = neq.idxmax()
        print("  mine:  ", a.loc[i].to_dict())
        print("  oracle:", b.loc[i].to_dict())
        fails += 1
        continue
    print(f"{name}: OK ({len(a)} rows)")
print(f"\n{'FAIL' if fails else 'PASS'}: {fails} mismatches")
sys.exit(1 if fails else 0)
