"""Pipeline-soundness decode of the OFFLINE rehearsal model on a train subset.

The recipe-scale rehearsal corpus (tools/recipe_rehearsal.py) is 1k synthetic
utterances of random word sequences; a 46M-param model memorizes it (train
att_corr ~0.89) but cannot generalize to the held-out dev word sequences
(valid ctc_cer ~0.99) — there is no language structure to learn. Dev WER
therefore measures corpus properties, not pipeline health. This tool decodes
a 48-utt subset of the TRAIN split with the trained checkpoint: a low WER
here proves the full train -> average -> decode -> WER loop is sound at
recipe scale (5k WordPiece vocab, 46M conformer, real CLIs), which is what
VERDICT r2 item 6 asks the rehearsal to establish.

Usage: python tools/rehearsal_train_decode.py [--root /tmp/lasr_rehearsal]
                                              [--utts 48]
"""
import argparse
import json
import os
import subprocess
import sys
import time

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/lasr_rehearsal")
    ap.add_argument("--utts", type=int, default=48)
    args = ap.parse_args()

    root = args.root
    data = os.path.join(root, "data")
    exp = os.path.join(root, "exp")
    sub = os.path.join(data, "train_subset")
    os.makedirs(sub, exist_ok=True)
    for name in ("wav.scp", "text"):
        with open(os.path.join(data, "train", name)) as f:
            lines = f.readlines()[: args.utts]
        with open(os.path.join(sub, name), "w") as f:
            f.writelines(lines)

    decode_cfg = {
        "decode_config": {"beam": 10, "ctc_beam": 15, "ctc_weight": 0.5,
                          "lm_rate": 0.0, "decode_method": "ctc_att",
                          "maxlenratio": 0.0, "minlenratio": 0.0},
        "test_data_config": {
            "name": "lasr_tpu.data.dataset:AudioDataSet",
            "kwargs": {"wav_list": [os.path.join(sub, "wav.scp")],
                       "text_list": [os.path.join(sub, "text")],
                       "audio_trans": ["norm", "fbank:80"]}},
    }
    dec_path = os.path.join(root, "decode_train_subset.yaml")
    with open(dec_path, "w") as f:
        yaml.safe_dump(decode_cfg, f, sort_keys=False)

    env = dict(os.environ, PYTHONPATH=REPO + os.pathsep +
               os.environ.get("PYTHONPATH", ""))
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bin/decode.py"),
         "-train_config", os.path.join(exp, "hparams.yaml"),
         "-decode_config", dec_path,
         "-model_path", os.path.join(exp, "checkpoints"),
         "-avg", "5", "-choose", "last",
         "-output_file", os.path.join(root, "hyp_train_subset.txt")],
        env=env, capture_output=True, text=True)
    decode_s = time.time() - t0
    sys.stderr.write(r.stdout[-800:] + r.stderr[-800:])
    if r.returncode != 0:
        sys.exit(r.returncode)
    wer = None
    for line in r.stdout.splitlines():
        if "Totol WER is" in line:
            wer = float(line.split()[-1])
    print(json.dumps({"stage": "train_subset_decode",
                      "utts": args.utts,
                      "wall_s": round(decode_s, 1),
                      "train_subset_wer": wer}), flush=True)


if __name__ == "__main__":
    main()
