#!/usr/bin/env bash
# Toy end-to-end recipe: synth data → train → average → decode → WER.
set -e
PLAT_ROOT=../../
export PYTHONPATH=$PLAT_ROOT:$PYTHONPATH

tag=toy
python gen_data.py

mkdir -p exp/train_${tag}
cp conf/config.yaml exp/train_${tag}

python $PLAT_ROOT/bin/train.py \
    -config conf/config.yaml \
    -exp_dir exp/train_${tag} \
    -num_epochs 60 \
    -num_devices 1 \
    -ema 1 \
    -log_interval 10

avg=3
python $PLAT_ROOT/bin/decode.py \
    -train_config exp/train_${tag}/hparams.yaml \
    -decode_config conf/decode.yaml \
    -model_path exp/train_${tag}/checkpoints \
    -avg $avg \
    -choose "last" \
    -output_file exp/train_${tag}/decode_avg${avg}.txt | tee exp/train_${tag}/decode_avg${avg}.log
