#!/bin/bash
# Round-3 sweep, part 5: the remaining chip-dependent items —
#   1. full OFFLINE recipe-scale dress rehearsal (gen + train + average +
#      decode through the real CLIs; VERDICT r2 item 6). 100 epochs keeps
#      it inside a chip window (~80 s/epoch through the tunnel; part 2's
#      150-epoch attempt outran its budget at epoch 89) while staying
#      ~1.7k steps >> the 600-step warmup.
#   2. 30-minute long-form windowed decode (part 2 hit the default
#      step timeout at 30 min — needs its own budget).
#   3. final bench.py with whatever defaults the part-3/4 A/Bs landed.
# STRICTLY sequential — concurrent axon tunnel clients get killed.
#
# Usage: bash tools/run_round3_benches_part5.sh

set -u
cd "$(dirname "$0")/.."
mkdir -p bench_out bench_results_r03

run() {
    local name="$1"; shift
    echo "=== $name: $* (started $(date +%H:%M:%S))" | tee -a bench_results_r03/sweep5.log
    timeout "${STEP_TIMEOUT:-1800}" "$@" > "bench_out/$name.log" 2>&1
    local rc=$?
    echo "=== $name: exit $rc ($(date +%H:%M:%S))" | tee -a bench_results_r03/sweep5.log
    tail -3 "bench_out/$name.log" | tee -a bench_results_r03/sweep5.log
    cp "bench_out/$name.log" "bench_results_r03/$name.log"
}

SKIP_GEN=""
[ -f bench_out/rehearsal/data/train/wav.scp ] && SKIP_GEN="--skip-gen"
STEP_TIMEOUT=12600 run rehearsal python tools/recipe_rehearsal.py \
    --root bench_out/rehearsal --epochs 100 $SKIP_GEN

STEP_TIMEOUT=3600 run longform30 python tools/bench_longform.py \
    --durations 1800

run bench_final python bench.py

echo "sweep5 done $(date +%H:%M:%S)" | tee -a bench_results_r03/sweep5.log
