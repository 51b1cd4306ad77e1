#!/bin/bash
# Fixed-work CPU probe: 10 s of multi-core sha256 via openssl speed,
# plus the steal-tick delta over the same window. Run repeatedly across
# a session: falling throughput + rising steal at constant work is
# hypervisor throttling/contention, not anything in the repo.
# Appends one line to /tmp/cpu_probe.log.
S0=$(head -1 /proc/stat)
R=$(openssl speed -seconds 2 -multi 32 -evp sha256 2>/dev/null | tail -1)
S1=$(head -1 /proc/stat)
st0=$(echo "$S0" | awk '{print $9}'); st1=$(echo "$S1" | awk '{print $9}')
tot0=$(echo "$S0" | awk '{s=0; for(i=2;i<=9;i++) s+=$i; print s}')
tot1=$(echo "$S1" | awk '{s=0; for(i=2;i<=9;i++) s+=$i; print s}')
echo "$(date -Is) sha256=$R steal_ticks=$((st1-st0)) total_ticks=$((tot1-tot0))" | tee -a /tmp/cpu_probe.log
