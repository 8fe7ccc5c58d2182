"""Diagnose the online rehearsal's ctc_cer=1.0: does the trained streaming
model's CTC head genuinely emit all blanks on TRAIN utterances, or is the
in-graph CER miswired for the chunked encoder?

Loads the rehearsal checkpoint, forwards a few training utterances through
the exact train path (deterministic), and prints greedy CTC emissions next
to the labels plus both CER implementations (device + host)."""

import argparse
import sys

import numpy as np
import yaml


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="bench_out/rehearsal_online")
    p.add_argument("--n", type=int, default=4)
    args = p.parse_args()

    from lasr_tpu.utils.env import respect_jax_platforms_env
    respect_jax_platforms_env()
    import jax
    import jax.numpy as jnp

    from lasr_tpu.data.frontend import DeviceFrontend, pack_s2s
    from lasr_tpu.train.trainer import load_averaged_params, decode_variables
    from lasr_tpu.utils.registry import BaseConfig
    from lasr_tpu.models.losses import (ctc_greedy_cer_device,
                                        ctc_greedy_cer_from_pred)

    with open(f"{args.root}/exp/hparams.yaml") as f:
        train_config = yaml.safe_load(f)
    tokenizer = BaseConfig(**train_config["tokenizer_config"]).generateExample()
    model = BaseConfig(**train_config["model_config"]).generateExample()
    params, batch_stats = load_averaged_params(
        f"{args.root}/exp/checkpoints", "last", 1)
    variables = decode_variables(params, batch_stats)

    # read a few TRAIN utterances
    from lasr_tpu.data.reader import read_audio
    utts = []
    with open(f"{args.root}/data/train/text") as f:
        for line in f:
            uid, txt = line.strip().split(" ", 1)
            utts.append((uid, txt))
            if len(utts) >= args.n:
                break
    wavs, lens, labels = [], [], []
    for uid, txt in utts:
        wav, sr = read_audio(f"{args.root}/data/train/{uid}.flac")
        wavs.append(wav)
        lens.append(len(wav))
        labels.append(list(tokenizer.encode(txt, add_sos_eos=False)[1]))
    T = max(lens)
    x = np.zeros((len(wavs), T), np.float32)
    for i, w in enumerate(wavs):
        x[i, : len(w)] = w
    xlen = np.array(lens, np.int32)

    frontend = DeviceFrontend(["norm", "fbank:80"])
    feats, flen = frontend(jnp.asarray(x), jnp.asarray(xlen))
    L = max(len(l) for l in labels)
    ys = np.full((len(labels), L), -1, np.int32)
    for i, l in enumerate(labels):
        ys[i, : len(l)] = l
    sos = tokenizer.ID_VALUE_SOS
    ys_in = np.concatenate(
        [np.full((len(labels), 1), sos, np.int32),
         np.where(ys < 0, 0, ys)], axis=1)[:, :-1]

    out = model.apply(variables, feats, flen, jnp.asarray(ys_in),
                      deterministic=True)
    ctc_out = np.asarray(out["ctc_out"], np.float32)
    hs_len = np.asarray(out["hs_len"])
    print("feat len:", np.asarray(flen), "hs_len:", hs_len,
          "ctc_out shape:", ctc_out.shape)
    pred = ctc_out.argmax(-1)
    for i, (uid, txt) in enumerate(utts):
        p_i = pred[i, : int(hs_len[i])]
        collapsed = [int(k) for j, k in enumerate(p_i)
                     if k != 0 and (j == 0 or p_i[j - 1] != k)]
        print(f"{uid}: ref_ids={labels[i][:12]}…")
        print(f"  greedy raw head={p_i[:30].tolist()}")
        print(f"  collapsed={collapsed[:20]}")
    dev = float(ctc_greedy_cer_device(
        jnp.asarray(ctc_out), jnp.asarray(ys), jnp.asarray(hs_len)))
    host = ctc_greedy_cer_from_pred(pred, ys, hs_len)
    print({"cer_device": dev, "cer_host": host})


if __name__ == "__main__":
    sys.exit(main())
