#!/bin/bash
# Round-3 sweep, part 3: the pos_dropout_mode A/B (rotated-space
# positional dropout -> one-matmul rel-pos scoring in training) plus a
# fresh post-remat-landing op profile under both modes.
# STRICTLY sequential — concurrent axon tunnel clients get killed.
#
# Usage: bash tools/run_round3_benches_part3.sh

set -u
cd "$(dirname "$0")/.."
mkdir -p bench_out bench_results_r03

run() {
    local name="$1"; shift
    echo "=== $name: $* (started $(date +%H:%M:%S))" | tee -a bench_results_r03/sweep3.log
    timeout "${STEP_TIMEOUT:-1800}" "$@" > "bench_out/$name.log" 2>&1
    local rc=$?
    echo "=== $name: exit $rc ($(date +%H:%M:%S))" | tee -a bench_results_r03/sweep3.log
    tail -3 "bench_out/$name.log" | tee -a bench_results_r03/sweep3.log
    cp "bench_out/$name.log" "bench_results_r03/$name.log"
}

# Mosaic-lowering numerics gate first: the interpret-mode tests can't
# catch compiled-mode bugs, and the A/B would otherwise time wrong math
run rot_kernel_check python tools/check_rot_kernel_tpu.py

run pos_dropout_ab python tools/probe_pos_dropout_mode.py

run xprof_remat1 python tools/xprof_ops.py --remat-attend 1

run xprof_rotated python tools/xprof_ops.py --remat-attend 1 \
    --pos-dropout-mode rotated

# attribute the loop-fusion / copy time to source ops (optimizer vs
# layers) — decides whether a flat-buffer fused Adam+EMA is worth it
run xprof_detail_loop python tools/xprof_detail.py --cat "loop fusion" --top 40

run xprof_detail_copy python tools/xprof_detail.py --cat "data formatting" --top 40

# the part-2 rehearsal train (~80 s/epoch through the tunnel) outruns its
# 2 h budget around epoch 89/150; finish its average+decode stages on the
# checkpoints the timeout left behind
if [ -d bench_out/rehearsal/exp/checkpoints ] && \
   ! grep -q '"stage": "decode"' bench_out/rehearsal.log 2>/dev/null; then
    STEP_TIMEOUT=3600 run rehearsal_decode python tools/recipe_rehearsal.py \
        --root bench_out/rehearsal --skip-gen --skip-train
fi

echo "sweep3 done $(date +%H:%M:%S)" | tee -a bench_results_r03/sweep3.log
