#!/bin/bash
# One full bench run: fresh sbt -batch invocation (fork=true => fresh
# Spark JVM), records OS-side state before/after so session-smear
# experiments can correlate totals with dirty-page backlog, /tmp
# accumulation, hypervisor steal, AND PSI stall time (the
# memory-bandwidth witness steal cannot see — r15 verdict item 8).
# A 10 s steal+PSI sampler runs for the duration of the bench so slow
# windows can be localized in time. Usage:
#   tools/bench_run.sh <label> [outdir] [repodir]
set -u
LABEL="${1:?label}"
OUT="${2:-/tmp/bench_r18}"
REPO="${3:-/root/repo}"
mkdir -p "$OUT"
envsnap() {
  echo "=== $1 $(date -Is)"
  grep -E 'Dirty|Writeback:' /proc/meminfo
  head -1 /proc/stat
  for f in cpu memory io; do
    [ -r "/proc/pressure/$f" ] && \
      awk -v k="$f" '{print "PSI", k, $0}' "/proc/pressure/$f"
  done
  grep -E 'MemFree|Cached' /proc/meminfo | head -2
  echo "tmp_entries=$(ls /tmp | wc -l)"
  echo "tmp_bytes=$(du -s /tmp 2>/dev/null | cut -f1)"
  echo "shm_bytes=$(du -s /dev/shm 2>/dev/null | cut -f1)"
}
envsnap PRE > "$OUT/$LABEL.env"
"$REPO/tools/steal_sampler.sh" "$OUT/$LABEL.steal" &
SAMPLER=$!
cd "$REPO"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > "$OUT/$LABEL.log" 2>&1
kill "$SAMPLER" 2>/dev/null
envsnap POST >> "$OUT/$LABEL.env"
grep '"metric":"total_tail"' "$OUT/$LABEL.log" | tail -1
