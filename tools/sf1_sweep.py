#!/usr/bin/env python3
"""Full-inventory sf1 oracle sweep with per-query wall caps (r12 verdict
item 3). Same compare as check_oracle.py (column sort, dtype canon, row
sort, exact equality), but each oracle runs in its OWN killable process
under a timeout, so the handful of quadratic-oracle gates classify
themselves as TIMEOUT (the exclusion list is then a measured artifact,
not a hand-maintained one) instead of stalling the sweep.

Usage: sf1_sweep.py <sfDir> <outDir> [timeout_sec=600] [query ...]
Prints one line per gate + a summary JSON {green, timeout, mismatch,
error, no_oracle} with the gate lists.
"""
import sys, json, glob, os, queue as queue_mod, multiprocessing as mp

sf_dir, out_dir = sys.argv[1], sys.argv[2]
timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 600
only = set(sys.argv[4:])


def canon(df):
    import pandas as pd
    df = df[sorted(df.columns)]
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


def check_one(name, sql, q):
    """Child process: run the oracle, compare, put a verdict string."""
    try:
        import duckdb, pandas as pd
        con = duckdb.connect()
        for t in ["region", "nation", "customer", "supplier", "part", "orders",
                  "lineitem", "events", "documents", "embeddings"]:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        files = (glob.glob(f"{out_dir}/{name}/*.parquet")
                 or glob.glob(f"{out_dir}/{name}/part-*"))
        if not files:
            q.put(("error", "no result files")); return
        mine = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        ref = con.execute(sql).df()
        a, b = canon(mine), canon(ref)
        if list(a.columns) != list(b.columns):
            q.put(("mismatch", f"columns mine={list(a.columns)} oracle={list(b.columns)}"))
        elif len(a) != len(b):
            q.put(("mismatch", f"rows mine={len(a)} oracle={len(b)}"))
        elif not a.equals(b):
            q.put(("mismatch", f"values differ on {(a != b).any(axis=1).sum()}/{len(a)} rows"))
        else:
            q.put(("green", f"{len(a)} rows"))
    except Exception as e:
        q.put(("error", f"{type(e).__name__}: {e}"))


def main():
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(os.path.basename(d) for d in glob.glob(f"{out_dir}/q*"))
    buckets = {"green": [], "timeout": [], "mismatch": [], "error": [],
               "no_oracle": []}
    for name in names:
        if only and name not in only:
            continue
        if name not in oracle:
            files = (glob.glob(f"{out_dir}/{name}/*.parquet")
                     or glob.glob(f"{out_dir}/{name}/part-*"))
            import pandas as pd
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"{name}: no_oracle rows={n} ({'OK' if n > 0 else 'EMPTY!'})",
                  flush=True)
            buckets["no_oracle"].append(name)
            continue
        q = mp.Queue()
        p = mp.Process(target=check_one, args=(name, oracle[name], q))
        p.start()
        p.join(timeout)
        if p.is_alive():
            p.terminate(); p.join(10)
            if p.is_alive():
                p.kill(); p.join()
            print(f"{name}: TIMEOUT >{timeout}s (quadratic-oracle class)", flush=True)
            buckets["timeout"].append(name)
            continue
        # q.get with a timeout, not an empty() pre-check: the child's
        # feeder thread can still be flushing the verdict when join()
        # returns, so empty() here would misclassify a real verdict as
        # "died silently" (ADVICE r13).
        try:
            verdict, detail = q.get(timeout=10)
        except queue_mod.Empty:
            verdict, detail = "error", "child died silently"
        print(f"{name}: {verdict.upper()} ({detail})", flush=True)
        buckets[verdict].append(name)
    summary = {k: {"n": len(v), "gates": v} for k, v in buckets.items()}
    print(json.dumps(summary), flush=True)
    sys.exit(1 if buckets["mismatch"] or buckets["error"] else 0)


if __name__ == "__main__":
    main()
