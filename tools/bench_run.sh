#!/bin/bash
# One full bench run: fresh sbt -batch invocation (fork=true => fresh
# Spark JVM), records OS-side state before/after so session-smear
# experiments can correlate totals with dirty-page backlog and /tmp
# accumulation. Usage: tools/bench_run.sh <label> [outdir] [repodir]
set -u
LABEL="${1:?label}"
OUT="${2:-/tmp/bench_r15}"
REPO="${3:-/root/repo}"
mkdir -p "$OUT"
{
  echo "=== PRE $(date -Is)"
  grep -E 'Dirty|Writeback:' /proc/meminfo
  head -1 /proc/stat
  grep -E 'MemFree|Cached' /proc/meminfo | head -2
  echo "tmp_entries=$(ls /tmp | wc -l)"
  echo "tmp_bytes=$(du -s /tmp 2>/dev/null | cut -f1)"
} > "$OUT/$LABEL.env"
cd "$REPO"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > "$OUT/$LABEL.log" 2>&1
{
  echo "=== POST $(date -Is)"
  grep -E 'Dirty|Writeback:' /proc/meminfo
  head -1 /proc/stat
  grep -E 'MemFree|Cached' /proc/meminfo | head -2
  echo "tmp_entries=$(ls /tmp | wc -l)"
  echo "tmp_bytes=$(du -s /tmp 2>/dev/null | cut -f1)"
} >> "$OUT/$LABEL.env"
grep '"metric":"total_tail"' "$OUT/$LABEL.log" | tail -1
