#!/usr/bin/env bash
# English recipe: the reference trains this on 6 GPUs with acc_grads=4
# (reference example/asr_en/run.sh); on TPU one chip digests the same 500s
# duration batches, so DP width is a throughput knob, not a requirement.
set -e
PLAT_ROOT=../../
export PYTHONPATH=$PLAT_ROOT:$PYTHONPATH

tag=baseline
mkdir -p exp/train_${tag}
cp conf/config_${tag}.yaml exp/train_${tag}

python $PLAT_ROOT/bin/train.py \
    -config conf/config_${tag}.yaml \
    -exp_dir exp/train_${tag} \
    -num_epochs 100 \
    -num_devices -1 \
    -acc_grads 4 \
    -fp16 16 \
    -ema 1

avg=5
python $PLAT_ROOT/bin/decode.py \
    -train_config exp/train_${tag}/hparams.yaml \
    -decode_config conf/decode.yaml \
    -model_path exp/train_${tag}/checkpoints \
    -avg $avg \
    -choose "last" \
    -output_file exp/train_${tag}/decode_avg${avg}.txt > exp/train_${tag}/decode_avg${avg}.log
