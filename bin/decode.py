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

    from lasr_tpu.utils.env import (enable_compilation_cache,
                                    respect_jax_platforms_env)
    respect_jax_platforms_env()
    enable_compilation_cache()

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
                               if not t.startswith("specaug")])

    method = asr_decode_config.get("decode_method", "ctc_att")
    nbest = int(asr_decode_config.get("nbest", 1))
    from lasr_tpu.decode.lm import build_lm
    lm, lm_weight = build_lm(asr_decode_config)
    bs_decoder = None
    w2l_decoder = None
    wfst_decoder = None
    longform = None
    if method in ("ctc_att", "ctc_att_online"):
        decoder = CTCAttBeamDecoder(
            model, variables,
            sos=tokenizer.ID_VALUE_SOS, eos=tokenizer.ID_VALUE_EOS,
            beam=asr_decode_config["beam"],
            ctc_beam=asr_decode_config["ctc_beam"],
            ctc_weight=asr_decode_config["ctc_weight"],
            nbest=nbest, lm=lm, lm_weight=lm_weight,
            online=method == "ctc_att_online")
        # beyond-reference: hour-scale audio via blank-aligned segmentation
        # (decode/longform.py); enable with e.g. longform_segment_frames:
        # 768 in decode.yaml — utterances decode one at a time
        seg = int(asr_decode_config.get("longform_segment_frames", 0))
        if seg > 0 and method == "ctc_att":
            from lasr_tpu.decode.longform import LongFormCTCAttDecoder
            longform = LongFormCTCAttDecoder(
                decoder, segment_frames=seg,
                encoder_window_frames=int(asr_decode_config.get(
                    "longform_encoder_window_frames", 0)),
                encoder_halo_frames=int(asr_decode_config.get(
                    "longform_encoder_halo_frames", 128)))
            if nbest > 1:
                logging.warning("longform decoding emits 1-best only; "
                                "ignoring nbest=%d", nbest)
                nbest = 1
    elif method == "ctc_bs":
        # pure-CTC prefix beam search, reference ctc_bs dispatch
        # (decode_lighting.py:136-159); host DP over the on-device posterior
        from lasr_tpu.decode.ctc_bs import CTC_Decoder
        decoder = None
        bs_decoder = CTC_Decoder(
            beam_size=asr_decode_config["beam"],
            ctc_beam=asr_decode_config["ctc_beam"],
            sos=tokenizer.ID_VALUE_SOS, rnn_lm=lm, lm_rate=lm_weight)
    elif method in ("ctc_kenlm", "ctc_kenlm_lexcoin"):
        # lexicon + word-n-gram beam search; same config keys as the
        # reference's (shipped commented-out) dispatch
        # (decode_lighting.py:101-112), kenlm_model taking the ARPA text
        import math as _math
        from lasr_tpu.decode.ctc_w2l import CTC_KenLM_Decoder
        decoder = None
        w2l_decoder = CTC_KenLM_Decoder(
            beam_size=asr_decode_config["beam"],
            beam_threshold=asr_decode_config.get("beam_threshold", 25.0),
            lexicon=asr_decode_config["lexicon"],
            tokens_dict=asr_decode_config["tokens_dict"],
            kenlm_model=asr_decode_config["kenlm_model"],
            sos="<eos>", blk="<blank>", unk="<unk>",
            sil=asr_decode_config.get("sil"),
            lm_weight=asr_decode_config.get("lm_weight", 2.0),
            word_score=asr_decode_config.get("word_score", -1.0),
            unk_score=-_math.inf,
            sil_score=asr_decode_config.get("sil_score", 0.0),
            log_add=bool(asr_decode_config.get("log_add", False)),
            beam_size_token=asr_decode_config.get("beam_size_token"))
    elif method == "wfst":
        # decoding-graph search (reference Kaldi_Decoder surface,
        # kaldi_decoder.py:15-33) over a binary OR text HCLG/TLG
        from lasr_tpu.decode.wfst import Kaldi_Decoder
        decoder = None
        wfst_decoder = Kaldi_Decoder(
            beam=asr_decode_config.get("wfst_beam", 16.0),
            max_active=asr_decode_config.get("max_active", 7000),
            mdl=asr_decode_config.get("mdl"),
            fst=asr_decode_config["fst"],
            word=asr_decode_config["word"],
            acoustic_scale=asr_decode_config.get("acoustic_scale", 0.1))
        if nbest > 1:
            logging.warning("wfst decoding emits 1-best only; "
                            "ignoring nbest=%d", nbest)
            nbest = 1
    elif method == "ctc_greedy":
        decoder = None
    else:
        raise ValueError(f"unknown decode_method {method!r}")

    acc = ErrorRateAccumulator()
    out = open(args.output_file, "w", encoding="utf-8")
    nbest_out = open(args.output_file + ".nbest", "w", encoding="utf-8") \
        if nbest > 1 else None
    # per-batch timing: each padded batch shape compiles once, so the
    # first batch of a shape absorbs compile — the "steady" split
    # excludes those and is the deployment-shaped RTF numerator
    import time as _time
    import json as _json
    shapes_seen = set()
    t_total = t_steady = audio_total = audio_steady = 0.0
    n_batches = 0
    # group utterances to keep device batches full
    items = list(test_dataset.train_set)
    for lo in range(0, len(items), args.batch):
        chunk = items[lo: lo + args.batch]
        batch = test_dataset.merge_batch(chunk)
        t_batch = _time.perf_counter()
        feats, feat_len = frontend(jnp.asarray(batch["wav_array"]),
                                   jnp.asarray(batch["wav_len"]))
        hyps = None
        if longform is not None:
            hyp_ids = [longform(feats[b: b + 1], feat_len[b: b + 1])[0]
                       for b in range(len(chunk))]
        elif decoder is not None:
            hyps = decoder(feats, feat_len)
            hyp_ids = [hyps.best_ids(b) for b in range(len(chunk))]
        else:
            import jax
            hs, hs_len = model.apply(variables, feats, feat_len,
                                     solo_pad=True, method=model.encode)
            logits = model.apply(variables, hs, method=model.ctc_logits)
            host_dp = (bs_decoder is not None or w2l_decoder is not None
                       or wfst_decoder is not None)
            if host_dp:
                lpz = np.asarray(jax.nn.log_softmax(
                    logits.astype(jnp.float32), axis=-1))
                lens = np.asarray(hs_len)
            if bs_decoder is not None:
                hyp_ids, nbest_lists = [], []
                for b in range(len(chunk)):
                    cands = bs_decoder.decode_problike(lpz[b, : int(lens[b])])
                    nb = [(list(pfx[1:]), sc)
                          for pfx, sc in cands[:nbest]]  # strip leading sos
                    hyp_ids.append(nb[0][0] if nb else [])
                    nbest_lists.append(nb)
            elif w2l_decoder is not None:
                hyp_ids, nbest_lists = [], []
                for b in range(len(chunk)):
                    nb = w2l_decoder.decode_problike(
                        lpz[b, : int(lens[b])])[:nbest]
                    hyp_ids.append(nb[0][0] if nb else [])
                    nbest_lists.append(nb)
            elif wfst_decoder is not None:
                hyp_ids, hyp_texts = [], []
                for b in range(len(chunk)):
                    res = wfst_decoder.decode_loglike(
                        lpz[b, : int(lens[b])])
                    hyp_ids.append(None)
                    hyp_texts.append(res["text"])
            else:
                hyp_ids = ctc_greedy_decode(logits, hs_len)[: len(chunk)]
        dt = _time.perf_counter() - t_batch
        secs = float(np.sum(batch["wav_len"])) / 16000.0
        t_total += dt
        audio_total += secs
        n_batches += 1
        key = tuple(batch["wav_array"].shape)
        if key in shapes_seen:
            t_steady += dt
            audio_steady += secs
        else:
            shapes_seen.add(key)
        for b, item in enumerate(chunk):
            _, ref_id = tokenizer.encode(item["text"])
            _, ref = tokenizer.decode(ref_id, no_special=True)
            if wfst_decoder is not None:
                hyp = hyp_texts[b]   # graph emits word strings directly
            else:
                _, hyp = tokenizer.decode(hyp_ids[b], no_special=True)
            dist = acc.add(ref, hyp)
            print(f"id {item['id']}\nref: {ref}\nhyp: {hyp}\ndis: {dist}")
            out.write(f"{hyp} ({item['id']})\n")
            if nbest_out is not None:
                cands = hyps.nbest_ids(b) if hyps is not None \
                    else (nbest_lists[b]
                          if (bs_decoder is not None
                              or w2l_decoder is not None) else [])
                for rank, (ids, sc) in enumerate(cands[:nbest]):
                    _, text = tokenizer.decode(ids, no_special=True)
                    nbest_out.write(
                        f"{item['id']}-{rank + 1} {sc:.4f} {text}\n")
    if nbest_out is not None:
        nbest_out.close()
    out.close()
    print(f"Totol WER is {acc.rate}")
    print(acc.report())
    print(_json.dumps({
        "decode_batches": n_batches,
        "decode_total_s": round(t_total, 2),
        "audio_total_s": round(audio_total, 2),
        "rtf": round(t_total / audio_total, 4) if audio_total else None,
        "decode_steady_s": round(t_steady, 2),
        "audio_steady_s": round(audio_steady, 2),
        "rtf_steady": round(t_steady / audio_steady, 4)
        if audio_steady else None}))
    return 0


if __name__ == "__main__":
    print(" ".join(sys.argv))
    sys.exit(main())
