"""Decoding CLI — TPU-native replacement for ``bin/decode_lighting.py``.

Same flag surface (decode_lighting.py:16-24): ``-model_path -train_config
-decode_config -output_file -avg -choose``; loads the training
``hparams.yaml``, rebuilds tokenizer/model, averages the last/best K
checkpoints (EMA weights preferred when present, decode_lighting.py:66-78),
then runs ``ctc_att`` (batched beam search), ``ctc_att_online`` or
``ctc_greedy`` over the test set and reports WER with an alignment summary.
"""

import argparse
import logging
import os
import sys

import numpy as np
import yaml


from lasr_tpu.train.trainer import load_averaged_params


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-model_path", required=True,
                        help="checkpoints root (…/checkpoints) or a single "
                             "checkpoint dir")
    parser.add_argument("-train_config", required=True,
                        help="hparams.yaml written by bin/train.py")
    parser.add_argument("-decode_config", required=True)
    parser.add_argument("-output_file", required=True)
    parser.add_argument("-avg", type=int, default=10)
    parser.add_argument("-choose", type=str, default="best")
    parser.add_argument("-batch", type=int, default=8,
                        help="utterances decoded per device batch")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")

    from lasr_tpu.utils.env import respect_jax_platforms_env
    respect_jax_platforms_env()

    import jax.numpy as jnp

    from lasr_tpu.data.frontend import DeviceFrontend
    from lasr_tpu.decode.beam import CTCAttBeamDecoder
    from lasr_tpu.decode.greedy import ctc_greedy_decode
    from lasr_tpu.utils.registry import BaseConfig
    from lasr_tpu.utils.text import ErrorRateAccumulator

    with open(args.train_config) as f:
        train_config = yaml.safe_load(f)
    with open(args.decode_config) as f:
        decode_config = yaml.safe_load(f)

    model_config = train_config["model_config"]
    tokenizer_config = train_config["tokenizer_config"]
    test_data_config = decode_config["test_data_config"]
    asr_decode_config = decode_config["decode_config"]

    tokenizer = BaseConfig(**tokenizer_config).generateExample()
    test_dataset = BaseConfig(**test_data_config).generateExample(
        tokenizer=tokenizer)
    test_dataset.load_check_data()

    model = BaseConfig(**model_config).generateExample()
    params, batch_stats = load_averaged_params(args.model_path, args.choose,
                                               args.avg)
    from lasr_tpu.train.trainer import decode_variables
    variables = decode_variables(params, batch_stats)
    frontend = DeviceFrontend([t for t in test_dataset.audio_trans
                               if t != "specaug"])

    method = asr_decode_config.get("decode_method", "ctc_att")
    if method in ("ctc_att", "ctc_att_online"):
        decoder = CTCAttBeamDecoder(
            model, variables,
            sos=tokenizer.ID_VALUE_SOS, eos=tokenizer.ID_VALUE_EOS,
            beam=asr_decode_config["beam"],
            ctc_beam=asr_decode_config["ctc_beam"],
            ctc_weight=asr_decode_config["ctc_weight"],
            lm_weight=0.0, online=method == "ctc_att_online")
    elif method == "ctc_greedy":
        decoder = None
    else:
        raise ValueError(f"unknown decode_method {method!r}")

    acc = ErrorRateAccumulator()
    out = open(args.output_file, "w", encoding="utf-8")
    # group utterances to keep device batches full
    items = list(test_dataset.train_set)
    for lo in range(0, len(items), args.batch):
        chunk = items[lo: lo + args.batch]
        batch = test_dataset.merge_batch(chunk)
        feats, feat_len = frontend(jnp.asarray(batch["wav_array"]),
                                   jnp.asarray(batch["wav_len"]))
        if decoder is not None:
            hyps = decoder(feats, feat_len)
            hyp_ids = [hyps.best_ids(b) for b in range(len(chunk))]
        else:
            hs, hs_len = model.apply(variables, feats, feat_len,
                                     method=model.encode)
            logits = model.apply(variables, hs, method=model.ctc_logits)
            hyp_ids = ctc_greedy_decode(logits, hs_len)[: len(chunk)]
        for b, item in enumerate(chunk):
            _, ref_id = tokenizer.encode(item["text"])
            _, ref = tokenizer.decode(ref_id, no_special=True)
            _, hyp = tokenizer.decode(hyp_ids[b], no_special=True)
            dist = acc.add(ref, hyp)
            print(f"id {item['id']}\nref: {ref}\nhyp: {hyp}\ndis: {dist}")
            out.write(f"{hyp} ({item['id']})\n")
    out.close()
    print(f"Totol WER is {acc.rate}")
    print(acc.report())
    return 0


if __name__ == "__main__":
    print(" ".join(sys.argv))
    sys.exit(main())
