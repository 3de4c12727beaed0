#!/bin/bash
# Adjacent A/B/A: decode base streams=2 tile=1024 vs streams=3 tile=1536,
# bracketing noise with a second baseline run. Appends to its own log.
LOG=benchmarks/_r4b_ab.log
cd "$(dirname "$0")/.."
{
echo "===== decode streams A/B/A @ $(date -u +%FT%TZ) ====="
timeout 1800 python benchmarks/probe_decode_r3.py --skip-floor --stack --only 0 --reps 8 2>&1 | grep -v "^WARNING"
timeout 1800 python benchmarks/probe_decode_r3.py --skip-floor --stack --only 5 --reps 8 2>&1 | grep -v "^WARNING"
timeout 1800 python benchmarks/probe_decode_r3.py --skip-floor --stack --only 0 --reps 8 2>&1 | grep -v "^WARNING"
echo "===== done @ $(date -u +%FT%TZ) ====="
} >> "$LOG" 2>&1
