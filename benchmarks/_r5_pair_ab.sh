#!/bin/bash
# Round-5 PAIR_STEP on-chip A/B driver: one probe config per process
# (one compile each, persistent compilation cache), log committed after
# every config so a tunnel drop cannot erase measurements.
cd /root/repo || exit 1
LOG=benchmarks/_r5_pair_ab.log

say() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

say "=== r5 PAIR_STEP A/B start ==="
for i in 0 1 2 3 4 5 6; do
    say "--- cfg $i"
    timeout 2700 python benchmarks/probe_pair_r5.py --only "$i" \
        --reps 7 >> "$LOG" 2>&1 || say "cfg $i FAILED/timeout"
    git add "$LOG" >> /dev/null 2>&1
    git commit -q -m "Probe: r5 PAIR_STEP A/B cfg $i" >> /dev/null 2>&1
done
say "=== r5 PAIR_STEP A/B done ==="
git add "$LOG"; git commit -q -m "Probe: r5 PAIR_STEP A/B complete"
