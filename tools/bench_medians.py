#!/usr/bin/env python3
"""Combine N graft.Bench JSON lines into per-gate medians.

Usage: bench_medians.py out.json run1.json [run2.json ...]
Each input is the bench's one-line JSON (optionally prefixed by sbt's
"[info] "). Writes {"medians": {gate: sec}, "total": sum-of-medians,
"n": N} — the machine-readable closing record BASELINE.md cites.
"""
import json, statistics, sys

out, ins = sys.argv[1], sys.argv[2:]
runs = []
for p in ins:
    line = [l for l in open(p) if '"metric"' in l][0]
    runs.append(json.loads(line.split('] ', 1)[-1].replace('[info] ', '')))
gates = sorted(set().union(*[r["queries"].keys() for r in runs]))
med = {g: statistics.median([r["queries"][g] for r in runs if g in r["queries"]])
       for g in gates}
json.dump({"medians": med, "total": sum(med.values()), "n": len(runs)},
          open(out, "w"), indent=1)
print(f"{out}: {len(gates)} gates, total {sum(med.values()):.1f} s, n={len(runs)}")
