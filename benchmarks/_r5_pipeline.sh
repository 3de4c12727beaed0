#!/bin/bash
# Round-5 tunnel-proof capture pipeline — pre-staged at the end of round 4
# so the next round's unattended window is usable from minute one.
#
# Same capture-first discipline as _r4_pipeline.sh (which turned round 3's
# BENCH=0.0 failure mode into round 4's committed 0.5058 snapshot): on
# first tunnel-up, capture + git-commit the headline bench and the corpus
# table BEFORE spending the window on anything else.  If a
# benchmarks/_r5_sweeps.sh exists (authored by the round-5 session), run
# it afterwards; it inherits the tunnel.
#
# Start detached:  setsid nohup bash benchmarks/_r5_pipeline.sh &
cd /root/repo || exit 1
LOG=benchmarks/_r5_pipeline.log
TRACKED=benchmarks/PIPELINE_r5.log

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

track() {
    {
        echo "===== $1 @ $(date -u +%Y-%m-%dT%H:%M:%SZ) ====="
        tail -n "${2:-200}" "$LOG"
    } >> "$TRACKED"
}

say "=== r5 pipeline start ==="

# --- 1. Wait for the tunnel: bounded jax.devices() probe every 4 min. ---
while true; do
    if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
        say "tunnel UP"
        break
    fi
    say "tunnel down"
    sleep 240
done

# --- 2. BENCH FIRST. ---
say "--- bench.py (first capture)"
if timeout 2400 python bench.py > benchmarks/bench_snapshot_r5.json \
        2>> "$LOG"; then
    say "bench ok: $(cat benchmarks/bench_snapshot_r5.json)"
    track "bench first capture" 40
    commit_files "Bench: first on-chip capture of round 5" \
        benchmarks/bench_snapshot_r5.json "$TRACKED"
else
    say "bench FAILED"
    track "bench first capture FAILED" 60
    commit_files "Bench: round-5 first capture failed (see log)" "$TRACKED"
fi

# --- 3. Corpus table. ---
say "--- run.py corpus table"
if timeout 3600 python benchmarks/run.py >> "$LOG" 2>&1; then
    track "corpus table" 60
    commit_files "Bench: round-5 corpus table" \
        benchmarks/results.json "$TRACKED"
else
    say "run.py FAILED"
    track "corpus table FAILED" 60
fi

# --- 4. Round-5 sweeps, if the session has queued any. ---
if [ -x benchmarks/_r5_sweeps.sh ]; then
    say "--- queued sweeps"
    bash benchmarks/_r5_sweeps.sh >> "$LOG" 2>&1
    track "queued sweeps" 400
    commit_files "Probes: round-5 queued sweeps" "$TRACKED"
fi

say "=== r5 pipeline done ==="
track "pipeline done" 20
