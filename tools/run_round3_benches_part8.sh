#!/bin/bash
# Round-3 sweep, part 8: the OFFLINE recipe rehearsal re-run with the
# landed input-pipeline fixes — device_audio_cache (zero steady-state
# waveform H2D after epoch 1) + int16 wire + valid/ckpt epoch intervals
# (each checkpoint save snapshots ~530 MB device->host over the same
# tunnel; per-epoch saves would dominate once steps are compute-bound).
# The part-6 run measured steady 13.9 utts/s (upload-bound) at 600
# optimizer steps, with the LR peak only reached at the very END
# (warm_step 600) -> synthetic WER 97.8%.  This run trains 400 epochs
# (2400 steps, LR peaks 1/4 in) to get BOTH a compute-bound steady
# throughput number and a trained synthetic WER for BASELINE.md.
# STRICTLY sequential - concurrent axon tunnel clients hang/get killed.
#
# Usage: bash tools/run_round3_benches_part8.sh

set -u
cd "$(dirname "$0")/.."
mkdir -p bench_out bench_results_r03

run() {
    local name="$1"; shift
    echo "=== $name: $* (started $(date +%H:%M:%S))" | tee -a bench_results_r03/sweep8.log
    timeout "${STEP_TIMEOUT:-1800}" "$@" > "bench_out/$name.log" 2>&1
    local rc=$?
    echo "=== $name: exit $rc ($(date +%H:%M:%S))" | tee -a bench_results_r03/sweep8.log
    tail -3 "bench_out/$name.log" | tee -a bench_results_r03/sweep8.log
    cp "bench_out/$name.log" "bench_results_r03/$name.log"
}

# fresh exp (the part-6 checkpoints are upload-bound-era; keep the data)
rm -rf bench_out/rehearsal/exp
STEP_TIMEOUT=10800 run rehearsal_pooled python tools/recipe_rehearsal.py \
    --root bench_out/rehearsal --epochs 400 --skip-gen \
    --valid-interval 5 --ckpt-interval 25

echo "sweep8 done $(date +%H:%M:%S)" | tee -a bench_results_r03/sweep8.log
