#!/usr/bin/env python3
"""Combine N graft.Bench JSON lines into per-gate medians.

Usage: bench_medians.py out.json run1.json [run2.json ...]
Each input is the bench's one-line JSON (optionally prefixed by sbt's
"[info] "). Writes {"medians": {gate: sec}, "total": sum-of-medians,
"n": N} — the machine-readable closing record BASELINE.md cites.

Anchor v2 (r14, VERDICT r13 item 5): each run carries a fixed-work
anchor median (anchor_median, n=5 samples). With >= 2 runs this also
emits ANCHOR-NORMALIZED per-gate medians: every run's gate walls are
scaled by (anchor_ref / anchor_run) — anchor_ref being the FASTEST
run's anchor, i.e. the best observed box state — before taking the
median, so a run that landed on a slow box contributes host-corrected
numbers instead of polluting the median. Raw medians stay primary;
the normalized series is the cross-round comparison channel.
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
rec = {"medians": med, "total": sum(med.values()), "n": len(runs)}

anchors = [r.get("anchor_median") for r in runs]
if all(a is not None and a > 0 for a in anchors):
    ref = min(anchors)
    scale = [ref / a for a in anchors]
    med_norm = {g: statistics.median(
        [r["queries"][g] * s for r, s in zip(runs, scale) if g in r["queries"]])
        for g in gates}
    rec.update({"anchors": anchors, "anchor_ref": ref,
                "anchor_scales": [round(s, 4) for s in scale],
                "medians_norm": med_norm,
                "total_norm": sum(med_norm.values())})
json.dump(rec, open(out, "w"), indent=1)
msg = f"{out}: {len(gates)} gates, total {sum(med.values()):.1f} s, n={len(runs)}"
if "total_norm" in rec:
    msg += (f", anchor-normalized total {rec['total_norm']:.1f} s"
            f" (anchors {['%.3f' % a for a in anchors]})")
print(msg)
