#!/bin/bash
# Samples /proc/stat every 10 s, printing per-interval CPU-time split
# (user/system/idle/steal in ticks) so a bench run's slow window can be
# correlated with hypervisor steal bursts. Each sample also records the
# PSI (pressure stall) totals for cpu/memory/io: steal sees hypervisor
# CPU theft but is BLIND to co-tenant memory-bandwidth/LLC contention —
# PSI's stall accounting is the witness the r15 smear report lacked for
# its quiet-steal slow runs (tools/BENCH_SMEAR_r15.md). Each sample
# additionally records SCHED: the summed /proc/<pid>/schedstat of every
# java process (cputime_ns rundelay_ns timeslices) — rundelay is time
# RUNNABLE-but-not-running, the scheduler-side witness for CPU
# contention that shows neither as steal nor as PSI (r16 verdict item
# 6: the quiet-steal slow-run class needs a counter that moves).
# Usage:
#   tools/steal_sampler.sh <outfile>   # runs until killed
OUT="${1:?outfile}"
psi() {
  for f in cpu memory io; do
    [ -r "/proc/pressure/$f" ] && \
      awk -v k="$f" '{print "PSI", k, $0}' "/proc/pressure/$f"
  done
}
sched() {
  # per-TASK schedstat, not per-pid: /proc/<pid>/schedstat covers only
  # the main thread, which in a JVM is idle while executor threads do
  # the work — summing tasks captures the whole process tree's
  # cputime/rundelay
  local files=""
  for p in $(pgrep java 2>/dev/null); do
    files="$files /proc/$p/task/*/schedstat"
  done
  # no java → no files: emit zeros instead of letting awk fall back to
  # reading stdin, which blocks the sampler loop forever (r17 advice)
  if [ -z "$files" ]; then
    echo "SCHED cputime_ns=0 rundelay_ns=0 timeslices=0"
    return
  fi
  # shellcheck disable=SC2086
  awk '{c+=$1; d+=$2; s+=$3}
       END {printf "SCHED cputime_ns=%.0f rundelay_ns=%.0f timeslices=%.0f\n",
            c, d, s}' $files 2>/dev/null \
    || echo "SCHED cputime_ns=0 rundelay_ns=0 timeslices=0"
}
prev=$(head -1 /proc/stat)
while true; do
  sleep 10
  cur=$(head -1 /proc/stat)
  {
    echo "$(date +%s) PREV $prev CUR $cur"
    psi
    sched
  } >> "$OUT"
  prev="$cur"
done
