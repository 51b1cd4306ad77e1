#!/bin/bash
# Samples /proc/stat every 10 s, printing per-interval CPU-time split
# (user/system/idle/steal in ticks) so a bench run's slow window can be
# correlated with hypervisor steal bursts. Usage:
#   tools/steal_sampler.sh <outfile>   # runs until killed
OUT="${1:?outfile}"
prev=$(head -1 /proc/stat)
while true; do
  sleep 10
  cur=$(head -1 /proc/stat)
  echo "$(date +%s) PREV $prev CUR $cur" >> "$OUT"
  prev="$cur"
done
