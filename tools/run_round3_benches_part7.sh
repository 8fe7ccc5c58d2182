#!/bin/bash
# Round-3 sweep, part 7: reruns after the part-6 failures, with fixes:
#   - rehearsal_online OOM'd 16 GB HBM under the layer-major encoder at
#     recipe buckets -> rerun with encoder_layer_major_rows=384 (row-
#     grouped remat'd attention/FF) and the int16 wire format.
#   - streaming_trained depended on its checkpoints -> rerun after.
#   - probe_h2d pins the tunnel H2D bandwidth for the BASELINE framing
#     of the rehearsal's steady throughput (upload-bound, not framework).
#   - offline rehearsal: continue (auto_resume) iff part 6 timed out
#     before the decode stage.
# STRICTLY sequential - concurrent axon tunnel clients hang/get killed.
#
# Usage: bash tools/run_round3_benches_part7.sh

set -u
cd "$(dirname "$0")/.."
mkdir -p bench_out bench_results_r03

run() {
    local name="$1"; shift
    echo "=== $name: $* (started $(date +%H:%M:%S))" | tee -a bench_results_r03/sweep7.log
    timeout "${STEP_TIMEOUT:-1800}" "$@" > "bench_out/$name.log" 2>&1
    local rc=$?
    echo "=== $name: exit $rc ($(date +%H:%M:%S))" | tee -a bench_results_r03/sweep7.log
    tail -3 "bench_out/$name.log" | tee -a bench_results_r03/sweep7.log
    cp "bench_out/$name.log" "bench_results_r03/$name.log"
}

run probe_h2d python tools/probe_h2d.py

if ! grep -q '"stage": "decode"' bench_out/rehearsal.log 2>/dev/null; then
    # part-6 offline rehearsal timed out mid-train or mid-decode:
    # auto_resume continues from the newest checkpoint
    STEP_TIMEOUT=12600 run rehearsal_cont python tools/recipe_rehearsal.py \
        --root bench_out/rehearsal --epochs 100 --skip-gen
fi

# stale partial state from the part-6 OOM'd attempt
rm -rf bench_out/rehearsal_online/exp
SKIP_GEN=""
[ -f bench_out/rehearsal_online/data/train/wav.scp ] && SKIP_GEN="--skip-gen"
STEP_TIMEOUT=10800 run rehearsal_online python tools/recipe_rehearsal.py \
    --root bench_out/rehearsal_online --online --epochs 60 --utts 600 \
    $SKIP_GEN

run streaming_trained python tools/bench_streaming.py --streams 4 \
    --train-config bench_out/rehearsal_online/exp/hparams.yaml \
    --model-path bench_out/rehearsal_online/exp/checkpoints

echo "sweep7 done $(date +%H:%M:%S)" | tee -a bench_results_r03/sweep7.log
