#!/bin/bash
# CHUNK_WORDS sweep (hull A/B already finished; runs solo on the TPU).
LOG=benchmarks/_r4e_chunk.log
cd "$(dirname "$0")/.."
{
echo "===== chunk A/B @ $(date -u +%FT%TZ) ====="
for i in 0 1 2 3; do
  timeout 1800 python benchmarks/probe_decode_r3.py --skip-floor --chunk --only $i --reps 5 2>&1 | grep -v "^WARNING"
done
echo "===== done @ $(date -u +%FT%TZ) ====="
} >> "$LOG" 2>&1
