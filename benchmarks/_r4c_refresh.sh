#!/bin/bash
# Post-adoption refresh: bench first (capture-first), corpus table,
# then the proxy-corpus OFFSET decode A/B with the fixed harness.
LOG=benchmarks/_r4c_refresh.log
cd "$(dirname "$0")/.."
{
echo "===== r4c refresh @ $(date -u +%FT%TZ) ====="
echo "--- bench.py (post-adoption)"
timeout 1800 python bench.py 2>&1 | grep -v "^WARNING" | tee /tmp/bench_r4c.json
echo "--- run.py corpus table (post-adoption)"
timeout 3600 python benchmarks/run.py 2>&1 | grep -v "^WARNING"
echo "--- proxy OFFSET decode A/B (fixed harness)"
timeout 1800 python benchmarks/probe_decode_r3.py --skip-floor --corpus proxy --offset --only 0 --reps 5 2>&1 | grep -v "^WARNING"
timeout 1800 python benchmarks/probe_decode_r3.py --skip-floor --corpus proxy --offset --only 1 --reps 5 2>&1 | grep -v "^WARNING"
echo "===== done @ $(date -u +%FT%TZ) ====="
} >> "$LOG" 2>&1
