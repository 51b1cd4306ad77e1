#!/usr/bin/env python3
"""Fold a tools/bench_run.sh output pair (<label>.log + <label>.env)
into BENCH_LOCAL_r18.json as one run record with the contamination
metadata INLINE (r15 verdict item 6: steal%, PSI stall deltas, and
timestamps live in the record itself, so adjudication is one file).

Usage: python3 tools/bench_fold.py <label> [outdir] [jsonpath]
"""
import json, re, sys, os

label = sys.argv[1]
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bench_r18"
path = sys.argv[3] if len(sys.argv) > 3 else \
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "BENCH_LOCAL_r18.json")

bench = None
windows = None
for line in open(f"{outdir}/{label}.log"):
    if '"metric":"total"' in line and '"queries"' in line:
        bench = json.loads(line[line.index('{'):])
    elif '"metric":"windows"' in line:
        windows = json.loads(line[line.index('{'):])["windows"]
assert bench, f"no bench line in {outdir}/{label}.log"


def sampler_intervals(path):
    """Parse <label>.steal into [(start_ms, end_ms, steal%, rundelay%)]
    — the same deltas sched_report.py computes (interval = the ~10 s
    ending at the sample's ts; rundelay from summed java task
    schedstat, None where the pid set changed)."""
    out, sched_prev = [], None
    if not os.path.exists(path):
        return out
    for line in open(path):
        m = re.match(r"^(\d+) PREV cpu (.+) CUR cpu (.+)$", line)
        if m:
            ts = int(m.group(1))
            prev = [int(x) for x in m.group(2).split()]
            cur = [int(x) for x in m.group(3).split()]
            d = [b - a for a, b in zip(prev, cur)]
            steal = 100.0 * d[7] / max(1, sum(d))
            out.append([(ts - 10) * 1000, ts * 1000, steal, None])
        m = re.match(r"^SCHED cputime_ns=(\d+) rundelay_ns=(\d+)", line)
        if m and out:
            cpu, delay = int(m.group(1)), int(m.group(2))
            if sched_prev is not None:
                dc, dd = cpu - sched_prev[0], delay - sched_prev[1]
                if dc >= 0 and dd >= 0 and dc + dd > 0:
                    out[-1][3] = 100.0 * dd / (dc + dd)
            sched_prev = (cpu, delay)
    return out


def window_contamination(w, intervals):
    """Overlap-weighted mean (steal%, rundelay%) over a [s, e] ms
    attempt window; rundelay None if no overlapping interval carried a
    valid schedstat delta."""
    s, e = w
    tot = st_acc = 0.0
    rd_tot = rd_acc = 0.0
    for i0, i1, steal, rd in intervals:
        ov = min(e, i1) - max(s, i0)
        if ov <= 0:
            continue
        tot += ov
        st_acc += ov * steal
        if rd is not None:
            rd_tot += ov
            rd_acc += ov * rd
    if tot <= 0:
        return None, None
    return (st_acc / tot, (rd_acc / rd_tot) if rd_tot > 0 else None)


# contamination thresholds for flagging an ATTEMPT's window: run-level
# steal above 0.5% or java rundelay share above 2% (the r17 smear data:
# clean runs sit at ~0.2% steal / 0.65-0.90% median rundelay; run10's
# contaminated intervals carried 6.3% / 1.36%+)
STEAL_FLAG, RUNDELAY_FLAG = 0.5, 2.0

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

# per-query-window contamination (r17 verdict 3): join each attempt's
# [start, end] window against the 10 s sampler series; record, per
# query, the contamination OF THE MIN ATTEMPT (the one the cross-run
# fold consumes) — a flagged min means "this run's min for this query
# was measured inside a contaminated interval; prefer another run's".
qcontam = {}
if windows:
    intervals = sampler_intervals(f"{outdir}/{label}.steal")
    if intervals:
        for q, ws in windows.items():
            # windows carry [start_ms, end_ms, dur_sec] since r19: the
            # third element is the NANOTIME duration Bench's min is
            # actually computed from, so the min attempt is keyed off
            # it (wall-clock ms ties used to let the wrong attempt's
            # window be flagged/cleared — r18 ADVICE). Two-element
            # windows (pre-r19 files) fall back to the ms length.
            durs = [((w[2] if len(w) > 2 and w[2] >= 0 else w[1] - w[0]),
                     (w[0], w[1])) for w in ws]
            if not durs:
                continue
            _, wmin = min(durs)
            steal, rd = window_contamination(wmin, intervals)
            if steal is None:
                continue
            flagged = steal > STEAL_FLAG or (rd is not None and rd > RUNDELAY_FLAG)
            if flagged:
                qcontam[q] = {"steal": round(steal, 3),
                              "rundelay": round(rd, 2) if rd is not None else None}

record = {
    "label": label, "started": pre["ts"], "ended": post["ts"],
    "steal_pct": steal_pct, "psi_stall_ms": psi,
    "total": bench["value"], "queries": bench["queries"],
    "contaminated_min_attempts": qcontam}
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

# the FOLDING RULE (r17 verdict 3): a run's per-query min only enters
# the cross-run fold if its measuring window was clean — unless EVERY
# run's window for that query was contaminated, in which case fall back
# to the plain min (never drop a query from the board)
mins, mins_all = {}, {}
flagged_only = set()
for r in doc["runs"]:
    contam = r.get("contaminated_min_attempts", {})
    for q, v in r["queries"].items():
        t = v[0] if isinstance(v, list) else v
        if t < 0:
            continue
        mins_all[q] = min(mins_all.get(q, 1e9), t)
        if q not in contam:
            mins[q] = min(mins.get(q, 1e9), t)
for q, t in mins_all.items():
    if q not in mins:
        mins[q] = t
        flagged_only.add(q)
print(f"folded {label}: total={bench['value']:.1f}s steal={steal_pct}% "
      f"psi_mem_some={psi.get('memory_some', '?')}ms "
      f"contaminated_mins={len(qcontam)}; "
      f"{len(doc['runs'])} runs, contamination-aware minima sum "
      f"{sum(mins.values()):.1f}s over {len(mins)} queries "
      f"({sum(mins.values())/len(mins):.3f} s/q, "
      f"{len(flagged_only)} all-runs-contaminated fallbacks; "
      f"plain minima {sum(mins_all.values()):.1f}s)")
