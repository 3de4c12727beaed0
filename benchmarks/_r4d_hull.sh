#!/bin/bash
# Text-row anomaly probe: DECODE_HULL on/off on the entropy-sorted
# machine-text corpus, bracketed by the same A/B on random.
LOG=benchmarks/_r4d_hull.log
cd "$(dirname "$0")/.."
{
echo "===== hull A/B @ $(date -u +%FT%TZ) ====="
for c in text random; do
  for i in 0 1; do
    timeout 1800 python benchmarks/probe_decode_r3.py --skip-floor --hull --corpus $c --only $i --reps 5 2>&1 | grep -v "^WARNING"
  done
done
echo "===== done @ $(date -u +%FT%TZ) ====="
} >> "$LOG" 2>&1
