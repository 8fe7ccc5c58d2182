#!/bin/bash
# Round-5 chip sweep. Run ONLY after the convergence drivers have
# released the chip (concurrent axon clients get killed — Makefile note).
#
#   bash tools/run_round5_benches.sh
#
# 1. headline train bench (BENCH row)
# 2. variance-controlled decode RTF (median/IQR over 20 iters)
# 3. trained-model streaming serving: incremental vs from-scratch beam
#    refresh latency (VERDICT r3 item 3's >=300 ms/refresh target needs
#    the TRAINED online model from tools/convergence_run.py --online)
set -u
cd /root/repo
mkdir -p bench_results_r05

python bench.py 2>&1 | tee bench_results_r05/bench_final.log

python bench_decode.py 2>&1 | tee bench_results_r05/decode_rtf.log

# univ dual-view model: the one family without a train-step row
python tools/bench_univ_step.py 2>&1 | tee bench_results_r05/univ_step.log

ONLINE_EXP=/tmp/lasr_converge_online/exp
if [ -f "$ONLINE_EXP/hparams.yaml" ]; then
    python tools/bench_streaming.py --streams 4 \
        --train-config "$ONLINE_EXP/hparams.yaml" \
        --model-path "$ONLINE_EXP/checkpoints" --choose last --avg 5 \
        2>&1 | tee bench_results_r05/streaming_trained.log
else
    echo "online convergence exp not found; skipping trained streaming row"
fi
