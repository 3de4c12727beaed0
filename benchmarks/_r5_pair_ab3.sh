#!/bin/bash
# Round-5 PAIR_STEP take 3: encode adoption bracket, streams re-sweep
# under pair (VERDICT r4 next #8), and the hull win-mode (proxy) A/B —
# the halved table passes make the pair's shared-scalar savings a larger
# fraction there.
cd /root/repo || exit 1
LOG=benchmarks/_r5_pair_ab.log

say() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }
runp() {
    timeout 2700 python benchmarks/probe_pair_r5.py --reps 7 "$@" \
        >> "$LOG" 2>&1 || say "FAILED/timeout: $*"
    git add "$LOG" >/dev/null 2>&1
    git commit -q -m "Probe: r5 PAIR take-3 $*" >/dev/null 2>&1
}

say "=== r5 PAIR take 3: enc bracket / streams / proxy ==="
for c in 4 5 6 7 8; do
    say "--- random cfg $c"
    runp --only "$c"
done
for c in 0 1; do
    say "--- proxy cfg $c"
    runp --only "$c" --corpus proxy
done
say "=== take 3 done ==="
git add "$LOG"; git commit -q -m "Probe: r5 PAIR take-3 complete"
