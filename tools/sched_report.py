#!/usr/bin/env python3
"""Summarize a bench run's sampler file (<label>.steal): per 10 s
interval, hypervisor steal% (from /proc/stat deltas) and the java
processes' RUN-DELAY share (from summed /proc/<pid>/schedstat deltas —
runnable-but-not-running over runnable time), the scheduler-side
contention witness steal and PSI cannot see (r16 verdict item 6).

rundelay_share = d(rundelay) / (d(cputime) + d(rundelay)); intervals
where the java pid set changed (cputime delta < 0) are skipped.

Usage: python3 tools/sched_report.py /tmp/bench_r17/<label>.steal
"""
import re, sys

path = sys.argv[1]
stat_prev = None
sched_prev = None
rows = []
cur_ts = None
for line in open(path):
    m = re.match(r"^(\d+) PREV cpu (.+) CUR cpu (.+)$", line)
    if m:
        cur_ts = int(m.group(1))
        prev = [int(x) for x in m.group(2).split()]
        cur = [int(x) for x in m.group(3).split()]
        d = [b - a for a, b in zip(prev, cur)]
        steal = 100.0 * d[7] / max(1, sum(d))
        rows.append({"ts": cur_ts, "steal": steal})
    m = re.match(r"^SCHED cputime_ns=(\d+) rundelay_ns=(\d+) timeslices=(\d+)", line)
    if m and rows:
        cpu, delay = int(m.group(1)), int(m.group(2))
        if sched_prev is not None:
            dc, dd = cpu - sched_prev[0], delay - sched_prev[1]
            if dc >= 0 and dd >= 0 and dc + dd > 0:
                rows[-1]["rundelay_share"] = 100.0 * dd / (dc + dd)
                rows[-1]["cpu_s"] = dc / 1e9
        sched_prev = (cpu, delay)

with_sched = [r for r in rows if "rundelay_share" in r]
if not with_sched:
    print(f"{path}: {len(rows)} intervals, no schedstat samples")
    sys.exit(0)
shares = sorted(r["rundelay_share"] for r in with_sched)
steals = sorted(r["steal"] for r in rows)
med = shares[len(shares) // 2]
print(f"{path}: {len(rows)} intervals ({len(with_sched)} with schedstat)")
print(f"  steal%        median {steals[len(steals)//2]:.3f}  max {steals[-1]:.3f}")
print(f"  rundelay%     median {med:.2f}  p90 {shares[int(len(shares)*0.9)]:.2f}  max {shares[-1]:.2f}")
hot = [r for r in with_sched if r["rundelay_share"] > 2 * max(med, 1.0)]
try:
    for r in hot[:10]:
        print(f"  hot interval ts={r['ts']} rundelay={r['rundelay_share']:.1f}% "
              f"steal={r['steal']:.3f}% cpu={r.get('cpu_s', 0):.0f}s")
except BrokenPipeError:  # downstream `| head` closed the pipe
    pass
