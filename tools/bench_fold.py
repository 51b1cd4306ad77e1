#!/usr/bin/env python3
"""Fold a tools/bench_run.sh output pair (<label>.log + <label>.env)
into BENCH_LOCAL_r17.json as one run record with the contamination
metadata INLINE (r15 verdict item 6: steal%, PSI stall deltas, and
timestamps live in the record itself, so adjudication is one file).

Usage: python3 tools/bench_fold.py <label> [outdir] [jsonpath]
"""
import json, re, sys, os

label = sys.argv[1]
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bench_r17"
path = sys.argv[3] if len(sys.argv) > 3 else \
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "BENCH_LOCAL_r17.json")

bench = None
for line in open(f"{outdir}/{label}.log"):
    if '"metric":"total"' in line and '"queries"' in line:
        bench = json.loads(line[line.index('{'):])
assert bench, f"no bench line in {outdir}/{label}.log"

snaps = {"PRE": {}, "POST": {}}
cur = None
for line in open(f"{outdir}/{label}.env"):
    m = re.match(r"=== (PRE|POST) (\S+)", line)
    if m:
        cur = snaps[m.group(1)]
        cur["ts"] = m.group(2)
    elif line.startswith("cpu "):
        cur["stat"] = [int(x) for x in line.split()[1:]]
    elif line.startswith("PSI "):
        _, res, rest = line.split(None, 2)
        kind = rest.split()[0]
        cur[f"psi_{res}_{kind}"] = int(re.search(r"total=(\d+)", rest).group(1))

pre, post = snaps["PRE"], snaps["POST"]
dstat = [b - a for a, b in zip(pre["stat"], post["stat"])]
steal_pct = round(100.0 * dstat[7] / max(1, sum(dstat)), 4)
psi = {f"{res}_{kind}": round((post[f"psi_{res}_{kind}"] -
                               pre[f"psi_{res}_{kind}"]) / 1000.0, 1)
       for res in ("cpu", "memory", "io") for kind in ("some", "full")
       if f"psi_{res}_{kind}" in pre}

doc = json.load(open(path)) if os.path.exists(path) else {"runs": []}
record = {
    "label": label, "started": pre["ts"], "ended": post["ts"],
    "steal_pct": steal_pct, "psi_stall_ms": psi,
    "total": bench["value"], "queries": bench["queries"]}
# re-folding a label REPLACES its run (an accidental double fold must
# not duplicate a record and skew the cross-run minima count)
doc["runs"] = [r for r in doc["runs"] if r["label"] != label] + [record]
# atomic publish: dump to a sibling temp file and rename over the
# target, so a crash mid-dump can never truncate the accumulated
# multi-run record
tmp = path + ".tmp"
with open(tmp, "w") as f:
    json.dump(doc, f, indent=1)
os.replace(tmp, path)

mins = {}
for r in doc["runs"]:
    for q, v in r["queries"].items():
        t = v[0] if isinstance(v, list) else v
        mins[q] = min(mins.get(q, 1e9), t)
print(f"folded {label}: total={bench['value']:.1f}s steal={steal_pct}% "
      f"psi_mem_some={psi.get('memory_some', '?')}ms; "
      f"{len(doc['runs'])} runs, cross-run minima sum "
      f"{sum(mins.values()):.1f}s over {len(mins)} queries "
      f"({sum(mins.values())/len(mins):.3f} s/q)")
