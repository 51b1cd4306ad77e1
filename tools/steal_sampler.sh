#!/bin/bash
# Samples /proc/stat every 10 s, printing per-interval CPU-time split
# (user/system/idle/steal in ticks) so a bench run's slow window can be
# correlated with hypervisor steal bursts. Each sample also records the
# PSI (pressure stall) totals for cpu/memory/io: steal sees hypervisor
# CPU theft but is BLIND to co-tenant memory-bandwidth/LLC contention —
# PSI's stall accounting is the witness the r15 smear report lacked for
# its quiet-steal slow runs (tools/BENCH_SMEAR_r15.md). Usage:
#   tools/steal_sampler.sh <outfile>   # runs until killed
OUT="${1:?outfile}"
psi() {
  for f in cpu memory io; do
    [ -r "/proc/pressure/$f" ] && \
      awk -v k="$f" '{print "PSI", k, $0}' "/proc/pressure/$f"
  done
}
prev=$(head -1 /proc/stat)
while true; do
  sleep 10
  cur=$(head -1 /proc/stat)
  {
    echo "$(date +%s) PREV $prev CUR $cur"
    psi
  } >> "$OUT"
  prev="$cur"
done
