#!/bin/bash
# Round-3 sweep, part 2: the steps that failed or were cut off in the
# first sweep (bench_results_r03/sweep.log), re-run after their fixes:
#   - batch_curve: now OOM-tolerant + remat_attend=1 (B=96 OOM'd before)
#   - rehearsal(+online): subprocess env kept dropping the sitecustomize
#     dir from PYTHONPATH, so the axon plugin never registered — fixed
#   - streaming_trained: depends on rehearsal_online's checkpoints
#   - longform: only the 1800 s point remains (earlier steps measured)
# STRICTLY sequential — concurrent axon tunnel clients get killed.
#
# Usage: bash tools/run_round3_benches_part2.sh

set -u
cd "$(dirname "$0")/.."
mkdir -p bench_out bench_results_r03

run() {
    local name="$1"; shift
    echo "=== $name: $* (started $(date +%H:%M:%S))" | tee -a bench_results_r03/sweep2.log
    timeout "${STEP_TIMEOUT:-1800}" "$@" > "bench_out/$name.log" 2>&1
    local rc=$?
    echo "=== $name: exit $rc ($(date +%H:%M:%S))" | tee -a bench_results_r03/sweep2.log
    tail -3 "bench_out/$name.log" | tee -a bench_results_r03/sweep2.log
    cp "bench_out/$name.log" "bench_results_r03/$name.log"
}

run batch_curve python tools/bench_batch_curve.py --batches 32 48 64 96

STEP_TIMEOUT=7200 run rehearsal python tools/recipe_rehearsal.py \
    --root bench_out/rehearsal

STEP_TIMEOUT=7200 run rehearsal_online python tools/recipe_rehearsal.py \
    --root bench_out/rehearsal_online --online --epochs 60 --utts 600

run streaming_trained python tools/bench_streaming.py --streams 4 \
    --train-config bench_out/rehearsal_online/exp/hparams.yaml \
    --model-path bench_out/rehearsal_online/exp/checkpoints

# >120 s durations auto-select windowed-only inside the tool
STEP_TIMEOUT=3600 run longform_30min python tools/bench_longform.py \
    --durations 1800

echo "sweep2 done $(date +%H:%M:%S)" | tee -a bench_results_r03/sweep2.log
