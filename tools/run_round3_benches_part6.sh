#!/bin/bash
# Round-3 sweep, part 6: the items parts 4/5 never got a chip window for
# (the rot-kernel gate + pallas A/B arms DID run in part 3 — recorded in
# BASELINE.md — so this script carries only the never-run remainder):
#   1. ONLINE recipe rehearsal (chunk-scan remat build) + the
#      trained-model multi-stream serving bench that needs its ckpts.
#   2. full OFFLINE recipe-scale dress rehearsal (VERDICT r2 item 6).
#   3. 30-minute long-form windowed decode.
#   4. final bench.py with the landed defaults.
# STRICTLY sequential — concurrent axon tunnel clients get killed.
#
# Usage: bash tools/run_round3_benches_part6.sh

set -u
cd "$(dirname "$0")/.."
mkdir -p bench_out bench_results_r03

run() {
    local name="$1"; shift
    echo "=== $name: $* (started $(date +%H:%M:%S))" | tee -a bench_results_r03/sweep6.log
    timeout "${STEP_TIMEOUT:-1800}" "$@" > "bench_out/$name.log" 2>&1
    local rc=$?
    echo "=== $name: exit $rc ($(date +%H:%M:%S))" | tee -a bench_results_r03/sweep6.log
    tail -3 "bench_out/$name.log" | tee -a bench_results_r03/sweep6.log
    cp "bench_out/$name.log" "bench_results_r03/$name.log"
}

# stale partial state from the part-2 OOM'd attempt
rm -rf bench_out/rehearsal_online/exp

SKIP_GEN=""
[ -f bench_out/rehearsal_online/data/train/wav.scp ] && SKIP_GEN="--skip-gen"
STEP_TIMEOUT=7200 run rehearsal_online python tools/recipe_rehearsal.py \
    --root bench_out/rehearsal_online --online --epochs 60 --utts 600 \
    $SKIP_GEN

run streaming_trained python tools/bench_streaming.py --streams 4 \
    --train-config bench_out/rehearsal_online/exp/hparams.yaml \
    --model-path bench_out/rehearsal_online/exp/checkpoints

SKIP_GEN=""
[ -f bench_out/rehearsal/data/train/wav.scp ] && SKIP_GEN="--skip-gen"
STEP_TIMEOUT=12600 run rehearsal python tools/recipe_rehearsal.py \
    --root bench_out/rehearsal --epochs 100 $SKIP_GEN

STEP_TIMEOUT=3600 run longform30 python tools/bench_longform.py \
    --durations 1800

run bench_final python bench.py

echo "sweep6 done $(date +%H:%M:%S)" | tee -a bench_results_r03/sweep6.log
