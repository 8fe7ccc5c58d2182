"""lasr_tpu — a TPU-native end-to-end speech recognition framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
gaochangfeng/lighting-asr (reference: /root/reference): joint CTC/attention
ASR with Transformer / Conformer / streaming encoders, a YAML
``{name, kwargs}`` dynamic-import config system, Kaldi-scp data pipeline with
an on-device fbank/SpecAugment frontend, a jit + sharded data-parallel
trainer, and batched on-device joint CTC/attention beam-search decoding.

Layer map (mirrors reference SURVEY.md §1):
  utils/     config + registry core, masks, text metrics
  ops/       numerical kernels: fbank frontend, SpecAugment, CTC loss,
             CTC prefix scoring (all jittable, TPU-first)
  modules/   Flax NN modules (attention, embeddings, conformer, ...)
  models/    dict-in/dict-out models and losses (Model_Interface contract)
  data/      host-side scp reader, tokenizers, bucketed batching
  train/     optax optimizers/schedules, EMA, jit+mesh trainer, checkpoints
  decode/    greedy CTC and joint CTC/attention beam search
  process/   one-call ASRProcess user API
  parallel/  device mesh + sharding rules
"""

__version__ = "0.1.0"
