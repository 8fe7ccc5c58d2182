#!/bin/bash
# Round-3 sweep, part 4: retry the online rehearsal with chunk-scan remat
# (the part-2 attempt OOM'd HBM: the scan saved every per-chunk per-block
# activation; encoder_remat=True recomputes them in bwd), then the
# trained-model streaming serving bench that depends on its checkpoints.
# STRICTLY sequential — concurrent axon tunnel clients get killed.
#
# Usage: bash tools/run_round3_benches_part4.sh

set -u
cd "$(dirname "$0")/.."
mkdir -p bench_out bench_results_r03

run() {
    local name="$1"; shift
    echo "=== $name: $* (started $(date +%H:%M:%S))" | tee -a bench_results_r03/sweep4.log
    timeout "${STEP_TIMEOUT:-1800}" "$@" > "bench_out/$name.log" 2>&1
    local rc=$?
    echo "=== $name: exit $rc ($(date +%H:%M:%S))" | tee -a bench_results_r03/sweep4.log
    tail -3 "bench_out/$name.log" | tee -a bench_results_r03/sweep4.log
    cp "bench_out/$name.log" "bench_results_r03/$name.log"
}

# rerun the Mosaic numerics gate + the pallas A/B arm with the
# input-fusion fix (part 3's gate hit the allocation-remat RET_CHECK)
run rot_kernel_check2 python tools/check_rot_kernel_tpu.py

run pos_dropout_ab_pallas python tools/probe_pos_dropout_mode.py \
    --modes rotated+pallas

# stale partial state from the OOM'd attempt
rm -rf bench_out/rehearsal_online/exp

# no --skip-gen: bench_out/ is ephemeral across sessions, so the corpus
# must be (re)generated unless it already exists from this session
SKIP_GEN=""
[ -f bench_out/rehearsal_online/data/train/wav.scp ] && SKIP_GEN="--skip-gen"
STEP_TIMEOUT=7200 run rehearsal_online python tools/recipe_rehearsal.py \
    --root bench_out/rehearsal_online --online --epochs 60 --utts 600 \
    $SKIP_GEN

run streaming_trained python tools/bench_streaming.py --streams 4 \
    --train-config bench_out/rehearsal_online/exp/hparams.yaml \
    --model-path bench_out/rehearsal_online/exp/checkpoints

echo "sweep4 done $(date +%H:%M:%S)" | tee -a bench_results_r03/sweep4.log
