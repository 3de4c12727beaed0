#!/bin/bash
# Detached round-3 probe pipeline: wait for the axon tunnel, then run the
# OFFSET_STATE and STACK_SCALAR sweeps chunked (one config per invocation
# so each compile fits well under any task cap), then a proxy-corpus A/B.
# Logs to benchmarks/_offset_probe.log.  Safe to re-run; each chunk is
# independent.
cd /root/repo || exit 1
LOG=benchmarks/_offset_probe.log
echo "=== pipeline start $(date -u +%H:%M:%S) ===" >> "$LOG"

# 1. Wait for the tunnel: a bounded jax.devices() probe every 4 min.
while true; do
  if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "tunnel UP $(date -u +%H:%M:%S)" >> "$LOG"
    break
  fi
  echo "tunnel down $(date -u +%H:%M:%S)" >> "$LOG"
  sleep 240
done

# 2. OFFSET_STATE sweep: decode configs 0-3, encode A/B 4-5.
for i in 0 1 2 3 4 5; do
  echo "--- offset --only $i $(date -u +%H:%M:%S)" >> "$LOG"
  timeout 2400 python benchmarks/probe_decode_r3.py \
    --offset --only "$i" --skip-floor --reps 5 >> "$LOG" 2>&1
done

# 3. STACK_SCALAR sweep (configs 0-5; 0 is the baseline re-anchor).
for i in 0 1 2 3 4 5; do
  echo "--- stack --only $i $(date -u +%H:%M:%S)" >> "$LOG"
  timeout 2400 python benchmarks/probe_decode_r3.py \
    --stack --only "$i" --skip-floor --reps 5 >> "$LOG" 2>&1
done

# 4. Proxy-corpus A/B of OFFSET_STATE on the speculative hull path.
for i in 0 1; do
  echo "--- proxy offset --only $i $(date -u +%H:%M:%S)" >> "$LOG"
  timeout 2400 python benchmarks/probe_decode_r3.py \
    --offset --only "$i" --skip-floor --corpus proxy --reps 5 >> "$LOG" 2>&1
done

echo "=== pipeline done $(date -u +%H:%M:%S) ===" >> "$LOG"

# 5. Post-sweep refresh: headline bench + corpus table, so fresh on-chip
# numbers exist even if nobody is watching when the tunnel returns.
echo "--- post-sweep bench $(date -u +%H:%M:%S)" >> "$LOG"
timeout 1800 python bench.py >> "$LOG" 2>&1 || echo "bench failed" >> "$LOG"
echo "--- post-sweep run.py $(date -u +%H:%M:%S)" >> "$LOG"
timeout 3600 python benchmarks/run.py --skip-e2e --out results_post_probe.json >> "$LOG" 2>&1 \
  || echo "run.py failed" >> "$LOG"
echo "=== pipeline + refresh done $(date -u +%H:%M:%S) ===" >> "$LOG"
