#!/bin/bash
# Round-4 tunnel-proof capture pipeline (VERDICT r3 "Next" #1/#3).
#
# Round 3 ended with BENCH_r03.json = 0.0 because the device tunnel was down
# at bench time and the recovery pipeline ran its sweeps BEFORE the bench.
# This version inverts the order: on first tunnel-up it captures the headline
# bench + corpus table FIRST and git-commits the artifacts unattended, so a
# single ~30-min tunnel window is enough to land a nonzero round record.
# Only then does it run the queued OFFSET_STATE / STACK_SCALAR sweeps
# (jiahansu/GPUAR src/gpuar_kernel.cu:787-836 renorm-chain attacks).
#
# Detached via setsid+nohup (background task cap is 600 s; this must outlive
# it).  Live log is gitignored (_*.log); every milestone appends to the
# TRACKED log and commits, so measurements survive round close (r3 lesson).
cd /root/repo || exit 1
LOG=benchmarks/_r4_pipeline.log
TRACKED=benchmarks/PIPELINE_r4.log

say() { echo "[$(date -u +%H:%M:%S)] $*" >> "$LOG"; }

commit_files() {  # commit_files <message> <file...>
    local msg="$1"; shift
    for i in 1 2 3 4 5; do
        if git add "$@" >> "$LOG" 2>&1 && \
           git commit -m "$msg" >> "$LOG" 2>&1; then
            say "committed: $msg"
            return 0
        fi
        say "commit retry $i ($msg)"
        sleep 7
    done
    say "COMMIT FAILED: $msg"
    return 1
}

track() {  # append live log tail + marker to the tracked log
    {
        echo "===== $1 @ $(date -u +%Y-%m-%dT%H:%M:%SZ) ====="
        tail -n "${2:-200}" "$LOG"
    } >> "$TRACKED"
}

say "=== r4 pipeline start ==="

# --- 1. Wait for the tunnel: bounded jax.devices() probe every 4 min. ---
while true; do
    if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
        say "tunnel UP"
        break
    fi
    say "tunnel down"
    sleep 240
done

# --- 2. BENCH FIRST.  Capture + commit before anything else can fail. ---
say "--- bench.py (first capture)"
if timeout 2400 python bench.py > benchmarks/bench_snapshot_r4.json \
        2>> "$LOG"; then
    say "bench ok: $(cat benchmarks/bench_snapshot_r4.json)"
    track "bench first capture" 40
    commit_files "Bench: first on-chip capture of round 4" \
        benchmarks/bench_snapshot_r4.json "$TRACKED"
else
    say "bench FAILED (rc=$?)"
fi

# --- 3. Corpus table refresh (pre-sweep defaults), committed. ---
say "--- run.py corpus table (pre-sweep)"
if timeout 3600 python benchmarks/run.py --skip-e2e \
        --out results_r4_presweep.json >> "$LOG" 2>&1; then
    track "corpus table pre-sweep" 60
    commit_files "Bench: round-4 pre-sweep corpus table" \
        benchmarks/results_r4_presweep.json "$TRACKED"
else
    say "run.py FAILED (rc=$?)"
fi

# --- 4. OFFSET_STATE sweep: decode configs 0-3, encode A/B 4-5. ---
for i in 0 1 2 3 4 5; do
    say "--- offset --only $i"
    timeout 2400 python benchmarks/probe_decode_r3.py \
        --offset --only "$i" --skip-floor --reps 5 >> "$LOG" 2>&1
done
track "OFFSET_STATE sweep" 300
commit_files "Probes: OFFSET_STATE on-chip sweep log" "$TRACKED"

# --- 5. STACK_SCALAR sweep (0 = baseline re-anchor). ---
for i in 0 1 2 3 4 5; do
    say "--- stack --only $i"
    timeout 2400 python benchmarks/probe_decode_r3.py \
        --stack --only "$i" --skip-floor --reps 5 >> "$LOG" 2>&1
done
track "STACK_SCALAR sweep" 300
commit_files "Probes: STACK_SCALAR on-chip sweep log" "$TRACKED"

# --- 5b. Round-4 grid: XDIV (cross-stream paired div) x OFFSET_STATE
#         x streams/tile, unroll re-sweep (VERDICT r3 next #2). ---
for i in 0 1 2 3 4 5 6 7; do
    say "--- r4 --only $i"
    timeout 2400 python benchmarks/probe_decode_r3.py \
        --r4 --only "$i" --skip-floor --reps 5 >> "$LOG" 2>&1
done
track "r4 XDIV/OFFSET grid" 400
commit_files "Probes: round-4 XDIV/OFFSET/streams grid sweep log" "$TRACKED"

# --- 5c. Encode residual sweep: dump cadence under PAIRED_DIV,
#         OFFSET_STATE x unroll (VERDICT r3 next #8). ---
for i in 0 1 2 3 4 5 6; do
    say "--- enc-r4 --only $i"
    timeout 2400 python benchmarks/probe_decode_r3.py \
        --enc-r4 --only "$i" --skip-floor --reps 5 >> "$LOG" 2>&1
done
track "enc-r4 dump/offset/unroll sweep" 250
commit_files "Probes: encode residual sweep log" "$TRACKED"

# --- 6. Proxy-corpus A/B of OFFSET_STATE on the speculative hull path. ---
for i in 0 1; do
    say "--- proxy offset --only $i"
    timeout 2400 python benchmarks/probe_decode_r3.py \
        --offset --only "$i" --skip-floor --corpus proxy --reps 5 \
        >> "$LOG" 2>&1
done
track "proxy OFFSET_STATE A/B" 150
commit_files "Probes: proxy-corpus OFFSET_STATE A/B log" "$TRACKED"

say "=== r4 pipeline done ==="
track "pipeline done" 20
commit_files "Probes: round-4 pipeline complete" "$TRACKED"
