#!/bin/bash
# Round-5 PAIR_STEP A/B, take 2: after rewriting both merged updates as
# single nested-where traversals (the first-cut summed-mask form measured
# dec -13% / enc -10% — the round-3 FUSE_UPDATE materialisation lesson).
cd /root/repo || exit 1
LOG=benchmarks/_r5_pair_ab.log

say() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

say "=== r5 PAIR_STEP A/B take 2 (nested-where merged updates) ==="
for i in 0 1 3 4 6; do
    say "--- cfg $i"
    timeout 2700 python benchmarks/probe_pair_r5.py --only "$i" \
        --reps 7 >> "$LOG" 2>&1 || say "cfg $i FAILED/timeout"
    git add "$LOG" >/dev/null 2>&1
    git commit -q -m "Probe: r5 PAIR_STEP A/B take-2 cfg $i" >/dev/null 2>&1
done
say "=== take 2 done ==="
git add "$LOG"; git commit -q -m "Probe: r5 PAIR_STEP A/B take-2 complete"
